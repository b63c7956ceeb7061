"""Capture HLO + xplane trace for the headline tile forward and attribute it.

One command for the perf loop:
    python tools/capture_trace.py [--model dinounet_b] [--batch 8] [--out /tmp/dinounet_trace]
builds the model exactly like bench.py, compiles the tile forward, captures a
4-step steady-state trace on the attached TPU, writes the HLO text, and prints
the module rollup via tools/trace_attr.py.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="dinounet_b")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--out", default="/tmp/dinounet_trace")
    ap.add_argument("--depth", type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dinounet_tpu.configuration import enable_persistent_compilation_cache
    from dinounet_tpu.models.dinounet import (
        DINOV3_INTERACTION_INDEXES,
        DINOV3_MODEL_NAMES,
        DinoUNet,
        DinoUNetConfig,
    )
    from dinounet_tpu.models.vit import VIT_CONFIGS

    enable_persistent_compilation_cache()
    cfg = DinoUNetConfig(
        vit=VIT_CONFIGS[DINOV3_MODEL_NAMES[args.model]],
        interaction_indexes=DINOV3_INTERACTION_INDEXES[args.model],
        num_classes=3,
    )
    model = DinoUNet(cfg)
    x = jnp.zeros((args.batch, 512, 512, 1), jnp.bfloat16)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), x, train=False)
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))

    print("lower+compile ...", file=sys.stderr, flush=True)
    compiled = fwd.lower(variables, x).compile()
    os.makedirs(args.out, exist_ok=True)
    hlo_path = os.path.join(args.out, "hlo.txt")
    open(hlo_path, "w").write(compiled.as_text())

    def drain(out):
        return float(jnp.ravel(out)[0])

    drain(fwd(variables, x))  # warm
    t0 = time.perf_counter()
    jax.profiler.start_trace(args.out)
    for _ in range(args.iters):
        out = fwd(variables, x)
    drain(out)
    jax.profiler.stop_trace()
    wall = (time.perf_counter() - t0) / args.iters
    print(f"~{wall * 1e3:.1f} ms/iter wall (incl. dispatch)", file=sys.stderr)

    sys.argv = ["trace_attr", hlo_path, args.out,
                "--iters", str(args.iters), "--depth", str(args.depth)]
    from tools import trace_attr

    trace_attr.main()


if __name__ == "__main__":
    main()
