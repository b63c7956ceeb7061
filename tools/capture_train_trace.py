"""Capture HLO + xplane trace for the TRAIN step and attribute it.

VERDICT r3 item 3: the round-3 inference A/Bs flipped defaults (dmaj
attention, chunked-GELU fc2, fused MSDA prep) that also execute in the
training graph, but no trace ever attributed the backward. This mirrors
tools/bench_train_step.py's step construction (DC+CE loss, masked-SGD over
the non-frozen tree, mutable batch_stats) and tools/capture_trace.py's
capture/attribution flow.

    python tools/capture_train_trace.py [--model dinounet_s] [--batch 2]
        [--out /tmp/dinounet_train_trace] [--depth 2]

ref hot loop being measured: /root/reference/dinounet/training/nnUNetTrainer/
nnUNetTrainer.py:899-929 (train_step: forward + backward + optimizer).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="dinounet_s")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--out", default="/tmp/dinounet_train_trace")
    ap.add_argument("--depth", type=int, default=2)
    args = ap.parse_args()

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
        vit=VIT_CONFIGS[DINOV3_MODEL_NAMES[args.model]],
        interaction_indexes=DINOV3_INTERACTION_INDEXES[args.model],
        num_classes=3,
    )
    model = DinoUNet(cfg)
    x = jnp.zeros((args.batch, 512, 512, 1), jnp.float32)
    seg = jnp.zeros((args.batch, 512, 512), jnp.int32)
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

    print("lower+compile ...", file=sys.stderr, flush=True)
    rng = jax.random.PRNGKey(0)
    compiled = step.lower(params, batch_stats, opt_state, x, seg, rng).compile()
    os.makedirs(args.out, exist_ok=True)
    hlo_path = os.path.join(args.out, "hlo.txt")
    open(hlo_path, "w").write(compiled.as_text())

    def drain(v):
        return float(jnp.ravel(v)[0])

    params, batch_stats, opt_state, loss = step(
        params, batch_stats, opt_state, x, seg, rng)
    drain(loss)  # warm
    t0 = time.perf_counter()
    jax.profiler.start_trace(args.out)
    for _ in range(args.iters):
        params, batch_stats, opt_state, loss = step(
            params, batch_stats, opt_state, x, seg, rng)
    drain(loss)
    jax.profiler.stop_trace()
    wall = (time.perf_counter() - t0) / args.iters
    print(f"~{wall * 1e3:.1f} ms/iter wall (incl. dispatch)", file=sys.stderr)

    sys.argv = ["trace_attr", hlo_path, args.out,
                "--iters", str(args.iters), "--depth", str(args.depth)]
    from tools import trace_attr

    trace_attr.main()


if __name__ == "__main__":
    main()
