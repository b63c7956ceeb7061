"""Mesh-sharded sliding-window throughput benchmark.

The multi-chip analogue of bench.py: shards a batch of 512x512 tiles over the
('data', 'model') mesh (the production scale-out path — tiles are
embarrassingly parallel over 'data'; dinounet_7b additionally megatron-shards
the frozen backbone over 'model', parallel/sharding.py) and measures
aggregate + per-chip patches/sec.

On a real TPU slice this reports ICI-scaled throughput; on this dev machine
(one tunneled chip) it degenerates to the single-chip number, and with
--force-cpu-mesh it validates the sharded program end-to-end on 8 virtual CPU
devices (numerical/SPMD correctness, not performance — CPU timings do not
transfer, BASELINE.md).

Usage:
  python tools/bench_multichip.py [--model dinounet_b] [--n-model 1]
      [--per-chip-batch 8] [--iters 8] [--force-cpu-mesh]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="dinounet_b")
    ap.add_argument("--n-model", type=int, default=1,
                    help="mesh size along the 'model' axis (7B: 4 or 8)")
    ap.add_argument("--per-chip-batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--tile", type=int, default=512)
    ap.add_argument("--force-cpu-mesh", action="store_true",
                    help="run on 8 virtual CPU devices (correctness drive)")
    args = ap.parse_args()

    if args.force_cpu_mesh:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8").strip()
        os.environ["DINOUNET_TPU_MSDA_IMPL"] = "jax"

    import jax
    import jax.numpy as jnp

    from dinounet_tpu.models.dinounet import (
        DINOV3_INTERACTION_INDEXES,
        DINOV3_MODEL_NAMES,
        DinoUNet,
        DinoUNetConfig,
    )
    from dinounet_tpu.models.vit import VIT_CONFIGS
    from dinounet_tpu.parallel import batch_sharding, make_mesh, param_shardings

    if args.force_cpu_mesh:
        jax.config.update("jax_platforms", "cpu")
        devices = jax.devices("cpu")[:8]
    else:
        devices = jax.devices()
    n = len(devices)
    if n % args.n_model:
        raise SystemExit(f"{n} devices not divisible by n_model={args.n_model}")
    mesh = make_mesh(n_model=args.n_model, devices=devices)
    n_data = n // args.n_model
    batch = args.per_chip_batch * n_data
    print(f"mesh: {n} devices = data {n_data} x model {args.n_model}; "
          f"global tile batch {batch}", file=sys.stderr)

    cfg = DinoUNetConfig(
        vit=VIT_CONFIGS[DINOV3_MODEL_NAMES[args.model]],
        interaction_indexes=DINOV3_INTERACTION_INDEXES[args.model],
        num_classes=3,
    )
    model = DinoUNet(cfg)
    dtype = jnp.bfloat16 if not args.force_cpu_mesh else jnp.float32
    x = jnp.zeros((batch, args.tile, args.tile, 1), dtype)
    if args.model == "dinounet_7b" and not args.force_cpu_mesh:
        # same fix as bench.py (round 4): model.init makes f32 params
        # (~28 GiB for 7B) — real serving loads the published bf16 weights,
        # so benchmark at that dtype: shapes only, matrix leaves bf16
        shapes = jax.eval_shape(
            lambda k: model.init(k, x, train=False), jax.random.PRNGKey(0))
        variables = jax.tree.map(
            lambda s: jnp.zeros(
                s.shape,
                jnp.bfloat16 if (s.dtype == jnp.float32 and len(s.shape) >= 2)
                else s.dtype),
            shapes)
    else:
        variables = jax.jit(model.init, static_argnames=("train",))(
            jax.random.PRNGKey(0), x, train=False)

    # commit the shardings: megatron specs on backbone weights over 'model'
    # (no-ops at n_model=1), everything else replicated, tiles over 'data'
    from jax.sharding import NamedSharding, PartitionSpec

    params = jax.device_put(variables["params"],
                            param_shardings(mesh, variables["params"]))
    rest = {k: jax.device_put(
                v, jax.tree_util.tree_map(
                    lambda _: NamedSharding(mesh, PartitionSpec()), v))
            for k, v in variables.items() if k != "params"}
    variables = {"params": params, **rest}
    x = jax.device_put(x, batch_sharding(mesh))

    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    with mesh:
        t0 = time.perf_counter()
        out = fwd(variables, x)
        out = out[0] if isinstance(out, (list, tuple)) else out
        float(jnp.ravel(out)[0])  # drain (block_until_ready no-ops on axon)
        print(f"compiled+first step in {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = fwd(variables, x)
                out = out[0] if isinstance(out, (list, tuple)) else out
            float(jnp.ravel(out)[0])
            dt = time.perf_counter() - t0
            best = max(best, batch * args.iters / dt)

    print(json.dumps({
        "metric": f"mesh_sliding_window_patches_per_sec_{args.model}",
        "value": round(best, 2),
        "unit": "patches/sec",
        "devices": n,
        "mesh": {"data": n_data, "model": args.n_model},
        "per_chip": round(best / n, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
