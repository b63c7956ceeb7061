"""Compile-probe the channel-major decoder-tail kernel family on the REAL
TPU toolchain (Mosaic), one kernel at a time, at small-but-representative
shapes. CPU interpret mode validates numerics but not Mosaic's
infer-vector-layout legality (round-2 lesson: a (1, C) -> (C, 1, 1) bias
reshape passed interpret mode and failed on hardware), so this probe is the
fast iteration loop for kernel-layout legality.

Usage: python tools/probe_tail_kernels.py [--full]
  --full also runs the 512^2 shapes of the real decoder (slower compiles).
"""

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dinounet_tpu.ops import decoder_tail_pallas as dt


def _probe(name, fn):
    t0 = time.perf_counter()
    try:
        out = jax.tree.map(lambda x: np.asarray(x), fn())
        dt_s = time.perf_counter() - t0
        leaves = jax.tree.leaves(out)
        ok = all(np.isfinite(np.asarray(x)).all() for x in leaves)
        print(f"{name}: {'OK' if ok else 'NONFINITE'} ({dt_s:.1f}s)",
              flush=True)
        return ok
    except Exception as e:
        print(f"{name}: FAIL ({type(e).__name__}) "
              f"{str(e).splitlines()[0][:160]}", flush=True)
        if "-v" in sys.argv:
            traceback.print_exc()
        return False


def main():
    full = "--full" in sys.argv
    print(f"backend={jax.default_backend()}", flush=True)
    key = jax.random.PRNGKey(0)
    results = []

    def rand(*shape, dtype=jnp.bfloat16):
        nonlocal key
        key, k = jax.random.split(key)
        return jax.random.normal(k, shape, jnp.float32).astype(dtype)

    # shapes: small probe (H=W=128) and, with --full, the real 512^2 stage
    cases = [(2, 64, 32, 128, 128)]
    if full:
        cases.append((8, 64, 32, 512, 512))
    for B, Cin, Cout, H, W in cases:
        tag = f"[{B}x{Cin}->{Cout}@{H}x{W}]"
        x = rand(B, Cin, H, W)
        w0 = rand(3, 3, Cin, Cout, dtype=jnp.float32)
        b0 = rand(Cout, dtype=jnp.float32)
        s = jnp.abs(rand(B, Cin, dtype=jnp.float32)) + 0.5
        t = rand(B, Cin, dtype=jnp.float32)

        results.append(_probe(
            f"conv3x3_cm stats=True {tag}",
            lambda: dt.conv3x3_cm(x, w0, b0)))
        results.append(_probe(
            f"conv3x3_cm stats=False prologue {tag}",
            lambda: dt.conv3x3_cm(x, w0, b0, prologue=(s, t), stats=False)))
        results.append(_probe(
            f"transpconv2x2_cm {tag}",
            lambda: dt.transpconv2x2_cm(
                x, rand(2, 2, Cin, Cout, dtype=jnp.float32), b0,
                prologue=(s, t))))
        results.append(_probe(
            f"seg_head_cm {tag}",
            lambda: dt.seg_head_cm(
                x, rand(Cin, 3, dtype=jnp.float32),
                rand(3, dtype=jnp.float32), prologue=(s, t))))

    ok = all(results)
    print("ALL OK" if ok else "FAILURES PRESENT", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
