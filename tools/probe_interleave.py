"""Micro-probe: which lane/sublane 2x-interleave strategies does Mosaic
lower on real TPU hardware?

The round-2 channel-major transposed-conv kernel failed Mosaic's
infer-vector-layout with `tpu.reshape (32x16x128x2) -> (32x16x1x256)` —
the (..., W, 2) -> (..., 2W) lane-interleave shape cast. This probe compiles
each candidate replacement as a minimal standalone kernel so the fix is
chosen empirically, not by guesswork (round-2 lesson: interpret mode can't
see Mosaic layout legality).

Candidates:
  A  stack(-1)+reshape      — the failing baseline (expected FAIL)
  B  lane-strided store     o_ref[..., 0::2] = a
  C  sublane-strided store  o_ref[..., 0::2, :] = a
  D  bf16-pair bitcast pack — two bf16 lanes packed into one f32 lane,
                              output bit-viewed XLA-side (lane-local ops only)
  E  sublane stack+reshape  (C, R, W)x2 -> (C, 2R, W) row interleave

Usage: python tools/probe_interleave.py
"""

import functools
import sys
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C, R, W = 32, 16, 128


def _run(name, fn, check=None):
    try:
        out = np.asarray(jax.jit(fn)())
        if check is not None:
            ok = check(out)
        else:
            ok = np.isfinite(out).all()
        print(f"{name}: {'OK' if ok else 'WRONG-VALUES'}", flush=True)
        return ok
    except Exception as e:
        print(f"{name}: FAIL ({type(e).__name__}) "
              f"{str(e).splitlines()[0][:140]}", flush=True)
        if "-v" in sys.argv:
            traceback.print_exc()
        return False


def _mk(kernel, out_shape, *args):
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(*args)


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    a = jnp.arange(C * R * W, dtype=jnp.float32).reshape(C, R, W) * 1e-3
    b = -a

    ref_lane = np.stack([np.asarray(a), np.asarray(b)], axis=-1).reshape(
        C, R, 2 * W)
    ref_row = np.stack([np.asarray(a), np.asarray(b)], axis=2).reshape(
        C, 2 * R, W)

    # A: the failing baseline
    def kern_a(a_ref, b_ref, o_ref):
        o_ref[...] = jnp.stack([a_ref[...], b_ref[...]], axis=-1).reshape(
            C, R, 2 * W)

    _run("A stack+reshape lane-interleave (expected FAIL)",
         lambda: _mk(kern_a, jax.ShapeDtypeStruct((C, R, 2 * W),
                                                  jnp.float32), a, b),
         check=lambda o: np.allclose(o, ref_lane))

    # B: lane-strided store
    def kern_b(a_ref, b_ref, o_ref):
        o_ref[:, :, 0::2] = a_ref[...]
        o_ref[:, :, 1::2] = b_ref[...]

    _run("B lane-strided store",
         lambda: _mk(kern_b, jax.ShapeDtypeStruct((C, R, 2 * W),
                                                  jnp.float32), a, b),
         check=lambda o: np.allclose(o, ref_lane))

    # C: sublane-strided store
    def kern_c(a_ref, b_ref, o_ref):
        o_ref[:, 0::2, :] = a_ref[...]
        o_ref[:, 1::2, :] = b_ref[...]

    _run("C sublane-strided store",
         lambda: _mk(kern_c, jax.ShapeDtypeStruct((C, 2 * R, W),
                                                  jnp.float32), a, b),
         check=lambda o: np.allclose(o, ref_row))

    # D: bf16-pair bitcast pack (lane-local). Kernel emits uint32 (C, R, W)
    # where each lane holds bf16(b)<<16 | bf16(a); XLA-side bit-view yields
    # the interleaved bf16 (C, R, 2W).
    def kern_d(a_ref, b_ref, o_ref):
        af = a_ref[...].astype(jnp.bfloat16).astype(jnp.float32)
        bf = b_ref[...].astype(jnp.bfloat16).astype(jnp.float32)
        ua = pltpu.bitcast(af, jnp.uint32) >> 16
        ub = pltpu.bitcast(bf, jnp.uint32) & jnp.uint32(0xFFFF0000)
        o_ref[...] = ub | ua

    def run_d():
        packed = _mk(kern_d,
                     jax.ShapeDtypeStruct((C, R, W), jnp.uint32), a, b)
        pairs = jax.lax.bitcast_convert_type(packed, jnp.bfloat16)
        return pairs.reshape(C, R, 2 * W).astype(jnp.float32)

    ref_lane_bf = np.stack(
        [np.asarray(a.astype(jnp.bfloat16).astype(jnp.float32)),
         np.asarray(b.astype(jnp.bfloat16).astype(jnp.float32))],
        axis=-1).reshape(C, R, 2 * W)
    _run("D bf16 bitcast pack", run_d,
         check=lambda o: np.allclose(o, ref_lane_bf))

    # E: sublane stack+reshape row interleave
    def kern_e(a_ref, b_ref, o_ref):
        o_ref[...] = jnp.stack([a_ref[...], b_ref[...]], axis=2).reshape(
            C, 2 * R, W)

    _run("E sublane stack+reshape row-interleave",
         lambda: _mk(kern_e, jax.ShapeDtypeStruct((C, 2 * R, W),
                                                  jnp.float32), a, b),
         check=lambda o: np.allclose(o, ref_row))


if __name__ == "__main__":
    main()
