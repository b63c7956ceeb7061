"""Device train-step timing for BASELINE.md (batch 2, 512x512, DC+CE).

Mirrors the round-1 methodology: jit the full train step (augment-free —
augmentation is timed separately as part of the real trainer iteration),
measure steady-state ms/iter via host-readback drain.

Usage: python tools/bench_train_step.py [dinounet_s|dinounet_b] [batch]
Prints one JSON line.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main(model_name="dinounet_s", batch=2, iters=20):
    import jax
    import jax.numpy as jnp
    import optax

    from dinounet_tpu.configuration import enable_persistent_compilation_cache
    from dinounet_tpu.models.dinounet import (
        DINOV3_INTERACTION_INDEXES,
        DINOV3_MODEL_NAMES,
        DinoUNet,
        DinoUNetConfig,
    )
    from dinounet_tpu.models.vit import VIT_CONFIGS
    from dinounet_tpu.training.losses import dc_and_ce_loss

    enable_persistent_compilation_cache()
    cfg = DinoUNetConfig(
        vit=VIT_CONFIGS[DINOV3_MODEL_NAMES[model_name]],
        interaction_indexes=DINOV3_INTERACTION_INDEXES[model_name],
        num_classes=3,
    )
    model = DinoUNet(cfg)
    x = jnp.zeros((batch, 512, 512, 1), jnp.float32)
    seg = jnp.zeros((batch, 512, 512), jnp.int32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), x, train=True)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})

    def trainable(path_params):
        return jax.tree_util.tree_map_with_path(
            lambda p, _: not (len(p) and getattr(p[0], "key", None) == "backbone"),
            path_params, is_leaf=lambda t: False)

    tx = optax.chain(
        optax.clip_by_global_norm(12.0),
        optax.masked(optax.sgd(1e-3, momentum=0.99, nesterov=True), trainable))
    opt_state = jax.jit(tx.init)(params)

    @jax.jit
    def step(params, batch_stats, opt_state, x, seg, rng):
        def loss_of(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": batch_stats}, x, train=True,
                rngs={"dropout": rng}, mutable=["batch_stats"])
            if isinstance(out, (list, tuple)):
                out = out[0]
            return dc_and_ce_loss(out, seg), mut["batch_stats"]

        (loss, bs), grads = jax.value_and_grad(loss_of, has_aux=True)(params)
        updates, opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), bs, opt, loss

    def drain(v):
        return float(jax.numpy.ravel(v)[0])

    rng = jax.random.PRNGKey(0)
    t0 = time.time()
    params, batch_stats, opt_state, loss = step(
        params, batch_stats, opt_state, x, seg, rng)
    drain(loss)
    compile_s = time.time() - t0
    print(f"first step (compile/cache + step): {compile_s:.1f}s",
          file=sys.stderr, flush=True)

    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            params, batch_stats, opt_state, loss = step(
                params, batch_stats, opt_state, x, seg, rng)
        drain(loss)
        dt = (time.perf_counter() - t0) / iters
        best = dt if best is None else min(best, dt)
    print(json.dumps({
        "metric": f"train_step_ms_{model_name}",
        "value": round(best * 1e3, 1), "unit": "ms/iter",
        "batch": batch, "first_step_s": round(compile_s, 1)}))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "dinounet_s",
         int(sys.argv[2]) if len(sys.argv) > 2 else 2)
