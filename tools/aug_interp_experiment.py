"""Does the augmentation warp's interpolation order change what gets learned?

The on-device augmentation defaults to a bilinear data warp where the
reference's batchgenerators pipeline uses order-3
(augmentation.py's documented deviation). This experiment backs the claim that
the choice is training-neutral: train the same tiny DinoUNet on the same
synthetic intensity-correlated-disk task with data_interp_order=1 vs 3
(identical seeds, identical loader streams — ONLY the warp kernel differs) and
compare foreground pseudo-Dice trajectories over multiple seeds.

Runs on CPU in a few minutes (tiny model, 64x64 patches). Results recorded in
BASELINE.md "Augmentation interpolation experiment".

Usage: python tools/aug_interp_experiment.py [n_seeds] [n_steps]
Prints one JSON line with per-seed final Dice for both orders.
"""

import json
import sys

sys.path.insert(0, "/root/repo")


def pin_cpu():
    """Run on CPU regardless of the registered TPU platform (tiny shapes; and
    the axon tunnel may be unavailable)."""
    import os

    # impl selection keys off the default *backend*, which stays TPU even
    # with a CPU default device — force the portable paths
    os.environ["DINOUNET_TPU_MSDA_IMPL"] = "jax"
    os.environ["DINOUNET_TPU_ATTN_IMPL"] = "jax"
    import jax

    jax.config.update("jax_default_device", jax.devices("cpu")[0])


def make_cases(rng, n_cases=10, size=96):
    """Synthetic disks whose intensity correlates with the label."""
    import numpy as np

    cases = []
    for _ in range(n_cases):
        img = rng.normal(0.0, 0.3, (size, size)).astype(np.float32)
        seg = np.zeros((size, size), np.int32)
        for cls in (1, 2):
            cy, cx = rng.integers(16, size - 16, 2)
            r = rng.integers(6, 14)
            yy, xx = np.ogrid[:size, :size]
            disk = (yy - cy) ** 2 + (xx - cx) ** 2 <= r ** 2
            seg[disk] = cls
            img[disk] += 0.8 * cls
        cases.append((img, seg))
    return cases


def run_one(order: int, seed: int, n_steps: int):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from dinounet_tpu.models.dinounet import DinoUNet, DinoUNetConfig
    from dinounet_tpu.models.vit import ViTConfig
    from dinounet_tpu.training.augmentation import AugmentConfig, augment_batch_2d
    from dinounet_tpu.training.losses import dc_and_ce_loss

    patch = 64
    cfg = DinoUNetConfig(
        vit=ViTConfig(embed_dim=64, depth=4, num_heads=4, ffn_ratio=2.0,
                      ffn_layer="mlp", dtype="float32"),
        interaction_indexes=(0, 1, 2, 3), num_classes=3,
        features_per_stage=(8, 16, 32, 64), fapm_rank=8, conv_inplane=8,
        deform_num_heads=2, drop_path_rate=0.0, dtype="float32")
    model = DinoUNet(cfg)
    aug_cfg = AugmentConfig(patch_size=(patch, patch), data_interp_order=order)

    np_rng = np.random.default_rng(seed)
    cases = make_cases(np_rng)

    x0 = jnp.zeros((2, patch, patch, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(seed), x0, train=True)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    tx = optax.chain(optax.clip_by_global_norm(12.0),
                     optax.sgd(1e-2, momentum=0.99, nesterov=True))
    opt_state = tx.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state, key, data, seg):
        # loader patch (enlarged) -> on-device augmentation -> train step
        xb, sb = augment_batch_2d(key, data, seg, aug_cfg)

        def loss_of(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": batch_stats}, xb, train=True,
                rngs={"dropout": key}, mutable=["batch_stats"])
            if isinstance(out, (list, tuple)):
                out = out[0]
            return dc_and_ce_loss(out, sb), mut["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_of, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bs, new_opt, loss

    @jax.jit
    def val_dice(params, batch_stats, data, seg):
        out = model.apply({"params": params, "batch_stats": batch_stats},
                          data, train=False)
        if isinstance(out, (list, tuple)):
            out = out[0]
        pred = jnp.argmax(out, -1)
        tp = jnp.sum((pred > 0) & (seg > 0))
        fp = jnp.sum((pred > 0) & (seg == 0))
        fn = jnp.sum((pred == 0) & (seg > 0))
        return 2 * tp / jnp.maximum(2 * tp + fp + fn, 1)

    loader_patch = 96  # enlarged patch the loader would deliver
    key = jax.random.PRNGKey(1000 + seed)  # same stream for both orders
    for it in range(n_steps):
        key, k_batch, k_aug = jax.random.split(key, 3)
        idx = np_rng.integers(0, len(cases), 2)
        data = jnp.stack([jnp.asarray(cases[i][0])[..., None] for i in idx])
        seg = jnp.stack([jnp.asarray(cases[i][1]) for i in idx])
        params, batch_stats, opt_state, loss = step(
            params, batch_stats, opt_state, k_aug, data, seg)

    # validation: center crops of all cases, no augmentation
    lo = (96 - patch) // 2
    vd = jnp.stack([jnp.asarray(c[0][lo:lo + patch, lo:lo + patch])[..., None]
                    for c in cases])
    vs = jnp.stack([jnp.asarray(c[1][lo:lo + patch, lo:lo + patch])
                    for c in cases])
    return float(val_dice(params, batch_stats, vd, vs))


def main(n_seeds=3, n_steps=150):
    pin_cpu()
    results = {1: [], 3: []}
    for seed in range(n_seeds):
        for order in (1, 3):
            d = run_one(order, seed, n_steps)
            results[order].append(round(d, 4))
            print(f"seed {seed} order {order}: fg-Dice {d:.4f}",
                  file=sys.stderr, flush=True)
    import numpy as np

    print(json.dumps({
        "metric": "aug_interp_fg_dice",
        "order1": results[1], "order3": results[3],
        "mean1": round(float(np.mean(results[1])), 4),
        "mean3": round(float(np.mean(results[3])), 4),
        "delta": round(float(np.mean(results[3]) - np.mean(results[1])), 4),
        "conditions": f"tiny DinoUNet, 64x64, {n_steps} steps, identical seeds",
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3,
         int(sys.argv[2]) if len(sys.argv) > 2 else 150)
