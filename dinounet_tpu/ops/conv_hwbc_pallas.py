"""3x3 decoder convolutions in the NATIVE padded NHWC layout ("HWBC").

Round-4 finding (tools/hbm_floors.py + the round-4 trace): XLA runs the
high-resolution sub-128-channel decoder convs through its
"EmitOutputBatchInSublanes" emitter, whose matmul M dimension is the BATCH
(M=8 of 128 MXU rows -> <=12.5% utilization); stage2's convs sit at
3.26/2.04 ms against 1.97/1.31 ms layout-byte floors, and that gap is
MXU-throughput structural to the emitter, not bandwidth.

The round-3 channel-major chain fixed the matmul shapes but paid NHWC<->NCHW
relayouts at every chain boundary and lost end-to-end (BASELINE.md negative
results). These kernels instead keep XLA's OWN physical layout: the decoder
maps are bf16 NHWC with minor-to-major {3,0,2,1} (physical order H, W, B, C;
B in sublanes, C padded to 128 lanes). A logical transpose
``x.transpose(1, 2, 0, 3)`` of such a map is a LAYOUT BITCAST — byte-for-byte
the same buffer as the (H, W, B, C)-shaped default-layout array the kernel
consumes — so the boundary cost that killed the CM chain is zero by
construction (XLA elides transposes whose operand/result physical layouts
match).

Formulation per (row-stripe) program, x: (Rh, W, B, Ci), halos as 1-row
neighbor blocks:

    for dy in 0..2:   # K = Ci, M = Rh*W*B, N = 3*Co (dx-stacked)
        acc += reshape(x_rows[rh+dy], (M, Ci)) @ Wdy  # Wdy: (Ci, 3*Co)
    out[m, co] = accL[m-B, co] + accM[m, co] + accR[m+B, co] + bias
    # the dx combine is a +-B SUBLANE shift: w's stride in M is exactly B,
    # and B=8 equals the f32 sublane tile, so the shifts are tile-aligned
    # row concats, not relayouts; w-edge rows are masked to the conv's
    # zero padding.

M = Rh*W*B (16k+) against XLA's M = 8; K = Ci (<=64 -> 50% MXU), N = 3*Co
(96/128 lanes). The InstanceNorm row stats (sum, sum-of-squares per (b, c))
accumulate per stripe and reduce XLA-side; the previous stage conv's
InstanceNorm-apply + leaky runs as an in-kernel input prologue, so the
stage's full conv0 -> conv1 pair touches HBM exactly at its layout floor.

conv0 takes the transposed-conv output and the skip as TWO operands (the
reference concatenates them, ref dinounet_training.py:601-612): a real
concat would re-materialize the 537 MB map XLA currently reads for free
inside its conv fusion.

Inference-only (training keeps the flax graph); engaged by
``DINOUNET_TPU_DECODER_HWBC`` (see configuration.decoder_hwbc).

ref semantics: dinounet_training.py:517-629 (StackedConvBlocks:
conv+InstanceNorm+leaky); numerics match models/layers.py::ConvNormAct
(bf16 conv, f32 accumulation, f32 stats).
"""

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _stack_weights_dx(w: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, Ci, Co) -> (3, Ci, 3*Co) with lanes ordered [dx, co]."""
    # w[dy, dx, ci, co] -> wk[dy][ci, dx*Co + co]
    return jnp.transpose(w, (0, 2, 1, 3)).reshape(3, w.shape[2],
                                                  3 * w.shape[3])


def _shift_down(a: jnp.ndarray, b: int) -> jnp.ndarray:
    """rows shifted +b (row m reads a[m-b]); zeros in the first b rows."""
    return jnp.concatenate([jnp.zeros_like(a[:b]), a[:-b]], axis=0)


def _shift_up(a: jnp.ndarray, b: int) -> jnp.ndarray:
    """rows shifted -b (row m reads a[m+b]); zeros in the last b rows."""
    return jnp.concatenate([a[b:], jnp.zeros_like(a[:b])], axis=0)


def _conv_kernel(slope, n_stripes, two_inputs, co, x_ref, x2_or_xp_ref, *rest):
    """One row-stripe program.

    Operand order (refs):
      x (Rh, W, B, Ci) current stripe; [x2 (Rh, W, B, Ci2) second input when
      two_inputs]; xp/xn (1, W, B, Ci[+Ci2 stacked? no — same split]) — for
      two inputs the halos also come in pairs; w (3, Ci_total, 3*Co) f32;
      b (1, Co) f32; s/t (B, Ci_total) f32 prologue (InstanceNorm apply:
      x*s + t then leaky) or unused when slope is None;
      outputs: o (Rh, W, B, Co); ssum/ssq (1, B, Co) f32 stripe partials.
    """
    if two_inputs:
        (x2_ref, xp_ref, xp2_ref, xn_ref, xn2_ref, w_ref, b_ref, s_ref,
         t_ref, o_ref, sum_ref, ssq_ref) = (x2_or_xp_ref,) + rest
    else:
        (xp_ref, xn_ref, w_ref, b_ref, s_ref, t_ref, o_ref, sum_ref,
         ssq_ref) = (x2_or_xp_ref,) + rest

    i = pl.program_id(0)
    Rh, W, B, Ci = x_ref.shape
    cdt = o_ref.dtype
    Co = co

    def halo_rows(cur, prev, nxt):
        """(Rh+2, W, B, Ci): neighbor edge rows, zeroed at image edges."""
        top = jnp.where(i == 0, jnp.zeros_like(prev), prev)
        bot = jnp.where(i == n_stripes - 1, jnp.zeros_like(nxt), nxt)
        return jnp.concatenate([top, cur, bot], axis=0)

    def prologue(xr, s, t):
        if slope is None:
            return xr
        xf = xr.astype(jnp.float32) * s[None, None] + t[None, None]
        return jnp.where(xf >= 0, xf, xf * slope).astype(cdt)

    # Load + prologue. The conv's zero padding applies to the activated
    # map, so out-of-image halo rows are zeroed AFTER the prologue
    # (leaky(0*s + t) != 0). halo_rows zeroes the out-of-image rows of the
    # RAW input first and the prologue then maps those zeros through
    # leaky(t) — wrong; so zero the activated rows instead:
    def load(cur_ref, prev_ref, nxt_ref, s, t):
        rows = jnp.concatenate([prev_ref[...], cur_ref[...], nxt_ref[...]],
                               axis=0)
        rows = prologue(rows, s, t)
        z = jnp.zeros_like(rows[:1])
        return jnp.concatenate([
            jnp.where(i == 0, z, rows[:1]),
            rows[1:-1],
            jnp.where(i == n_stripes - 1, z, rows[-1:]),
        ], axis=0)  # (Rh+2, W, B, Ci)

    if two_inputs:
        Ci2 = x2_ref.shape[3]
        s_ = s_ref[...]
        t_ = t_ref[...]
        xa = load(x_ref, xp_ref, xn_ref, s_[:, :Ci], t_[:, :Ci])
        xb = load(x2_ref, xp2_ref, xn2_ref, s_[:, Ci:], t_[:, Ci:])
        parts = ((xa, 0, Ci), (xb, Ci, Ci + Ci2))
    else:
        xa = load(x_ref, xp_ref, xn_ref, s_ref[...], t_ref[...])
        parts = ((xa, 0, Ci),)

    M = Rh * W * B
    w = w_ref[...]
    acc = jnp.zeros((M, 3 * Co), jnp.float32)
    for xr, c0, c1 in parts:
        for dy in range(3):
            lhs = xr[dy:dy + Rh].reshape(M, c1 - c0)
            acc = acc + jax.lax.dot_general(
                lhs, w[dy, c0:c1].astype(cdt),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

    # dx combine: out[m] = accL[m-B] + accM[m] + accR[m+B], with the w-edge
    # rows of the shifted terms zeroed (conv zero padding along W). B == the
    # f32 sublane tile (8), so the shifts are tile-aligned row concats.
    # ORDER MATTERS for Mosaic: shift the FULL (M, 3*Co) accumulator first
    # and lane-slice the shifted copies — sublane shift-concats of a
    # lane-OFFSET slice (acc[:, :Co] etc.) crash the Mosaic compiler
    # (round-4 repro /tmp/hwbc_debug.py: slices_shifts FAILs, slices_only
    # and shifts_only PASS), while slices of freshly materialized concat
    # outputs lower fine.
    # mask rows by w index: m = ((rh*W) + w_pos)*B + b
    wpos = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0) // B % W
    not_first = (wpos != 0).astype(jnp.float32)
    not_last = (wpos != W - 1).astype(jnp.float32)
    accD = _shift_down(acc, B)
    accU = _shift_up(acc, B)
    out = (acc[:, Co:2 * Co]
           + not_first * accD[:, :Co]
           + not_last * accU[:, 2 * Co:3 * Co]
           + b_ref[...].astype(jnp.float32))
    o_ref[...] = out.reshape(Rh, W, B, Co).astype(cdt)

    of = o_ref[...].astype(jnp.float32).reshape(Rh * W, B, Co)
    sum_ref[0] = jnp.sum(of, axis=0)
    ssq_ref[0] = jnp.sum(of * of, axis=0)


# Compile-proven vector budgets, in (Rh*W*B/8) * ceil(3*Co/128) tile-units
# (the accumulator footprint). Round-4 probes against the real Mosaic
# compiler: at W<=384, 1024x1 / 512x2 / 256x3 units pass while the naive
# Rh=8-at-Ci=128 choice (1024x3) crashes; at W=512 the cliff is LOWER —
# 512 units (Rh=1) pass, 1024 units (Rh=2) crash at any channel count.
_VREG_BUDGET = 1024
_VREG_BUDGET_W512 = 512
_W_MAX = 512


def _pick_rh(h: int, w: int = 128, b: int = 8, co: int = 32,
             cap: int = 8) -> Optional[int]:
    """Largest row-stripe dividing h whose (M, 3*Co) accumulator stays
    within the compile-proven vector budget (bigger in-kernel values crash
    the compiler — see _VREG_BUDGET*)."""
    budget = _VREG_BUDGET_W512 if w >= 512 else _VREG_BUDGET
    tiles = (3 * co + 127) // 128
    for r in range(min(cap, h), 0, -1):
        if h % r == 0 and (r * w * b // 8) * tiles <= budget:
            return r
    return None


def hwbc_supported(shape: Tuple[int, ...]) -> bool:
    """(B, H, W, C) eligibility: 2-D maps, W a lane-tile multiple within the
    compile-proven width, a valid row stripe, B a sublane multiple (the dx
    combine shifts rows by B and needs tile-aligned concats)."""
    if len(shape) != 4:
        return False
    B, H, W, C = shape
    return (W % 128 == 0 and W <= _W_MAX and B % 8 == 0 and H >= 2
            and _pick_rh(H, W, B, C) is not None)


def conv3x3_hwbc(x, w, b, x2=None, prologue=None, leaky_slope: float = 0.01,
                 interpret: bool = False):
    """3x3 SAME conv over (H, W, B, Ci) input(s), dx-stacked matmul kernel.

    x (and x2, when the logical input is their channel concat) are
    (H, W, B, Ci) views of NHWC maps (``jnp.transpose(nhwc, (1, 2, 0, 3))``
    — a layout bitcast of the {3,0,2,1} buffers XLA materializes anyway).
    w: (3, 3, Ci_total, Co) f32; b: (Co,) f32.
    prologue: None for a raw conv, or (scale, shift) each (B, Ci_total) f32
    applying the previous InstanceNorm (x*scale + shift then
    leaky(leaky_slope)) before the conv, matching ConvNormAct order.

    Returns (y (H, W, B, Co) in x.dtype, ssum (B, Co) f32, ssq (B, Co) f32)
    where ssum/ssq are sums over H*W of the rounded output (the next
    InstanceNorm's row stats).
    """
    H, W, B, Ci = x.shape
    Ci_total = Ci + (x2.shape[3] if x2 is not None else 0)
    assert w.shape == (3, 3, Ci_total, w.shape[3]), (w.shape, Ci_total)
    Co = w.shape[3]
    Rh = _pick_rh(H, W, B, Co)
    assert Rh is not None and W % 128 == 0 and W <= _W_MAX \
        and B % 8 == 0, (H, W, B)
    n_stripes = H // Rh

    wk = _stack_weights_dx(w)  # (3, Ci_total, 3*Co)
    bk = b.reshape(1, Co).astype(jnp.float32)
    if prologue is None:
        s = jnp.ones((B, Ci_total), jnp.float32)
        t = jnp.zeros((B, Ci_total), jnp.float32)
        slope = None
    else:
        s, t = prologue
        s = s.astype(jnp.float32)
        t = t.astype(jnp.float32)
        slope = leaky_slope

    two = x2 is not None

    def idx_cur(i):
        return (i, 0, 0, 0)

    def idx_prev(i):
        # last row of the previous stripe (clamped at the top edge; the
        # kernel masks it to zero there)
        return (jnp.maximum(i * Rh - 1, 0), 0, 0, 0)

    def idx_next(i):
        return (jnp.minimum((i + 1) * Rh, H - 1), 0, 0, 0)

    cur_spec = pl.BlockSpec((Rh, W, B, Ci), idx_cur)
    row_spec = pl.BlockSpec((1, W, B, Ci), idx_prev)
    rown_spec = pl.BlockSpec((1, W, B, Ci), idx_next)
    operands = [x]
    in_specs = [cur_spec]
    if two:
        Ci2 = x2.shape[3]
        operands += [x2, x, x2, x, x2]
        in_specs += [pl.BlockSpec((Rh, W, B, Ci2), idx_cur),
                     row_spec, pl.BlockSpec((1, W, B, Ci2), idx_prev),
                     rown_spec, pl.BlockSpec((1, W, B, Ci2), idx_next)]
    else:
        operands += [x, x]
        in_specs += [row_spec, rown_spec]
    operands += [wk, bk, s, t]
    in_specs += [pl.BlockSpec(wk.shape, lambda i: (0, 0, 0)),
                 pl.BlockSpec(bk.shape, lambda i: (0, 0)),
                 pl.BlockSpec(s.shape, lambda i: (0, 0)),
                 pl.BlockSpec(t.shape, lambda i: (0, 0))]

    kernel = functools.partial(_conv_kernel, slope, n_stripes, two, Co)
    y, ssum, ssq = pl.pallas_call(
        kernel,
        grid=(n_stripes,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((Rh, W, B, Co), idx_cur),
            pl.BlockSpec((1, B, Co), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, B, Co), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((H, W, B, Co), x.dtype),
            jax.ShapeDtypeStruct((n_stripes, B, Co), jnp.float32),
            jax.ShapeDtypeStruct((n_stripes, B, Co), jnp.float32),
        ],
        interpret=interpret,
    )(*operands)
    return y, jnp.sum(ssum, axis=0), jnp.sum(ssq, axis=0)


def conv3x3_hwbc_reference(x, w, b, x2=None, prologue=None,
                           leaky_slope: float = 0.01):
    """Pure-jnp reference with identical semantics (for parity tests)."""
    xin = x if x2 is None else jnp.concatenate([x, x2], axis=3)
    if prologue is not None:
        s, t = prologue
        xf = xin.astype(jnp.float32) * s[None, None] + t[None, None]
        xin = jnp.where(xf >= 0, xf, xf * leaky_slope).astype(x.dtype)
    nhwc = jnp.transpose(xin, (2, 0, 1, 3))  # (B, H, W, C)
    y = jax.lax.conv_general_dilated(
        nhwc, w.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32) + b
    y = jnp.transpose(y, (1, 2, 0, 3)).astype(x.dtype)  # (H, W, B, Co)
    yf = y.astype(jnp.float32)
    return y, jnp.sum(yf, axis=(0, 1)), jnp.sum(yf * yf, axis=(0, 1))


def instance_norm_prologue_params(ssum, ssq, n, gamma, beta, eps=1e-5):
    """(scale, shift) per (B, C) applying InstanceNorm(gamma, beta) given the
    previous conv's row stats over n = H*W elements (biased variance,
    matching flax InstanceNorm / models/layers.py::InstanceNorm)."""
    mean = ssum / n
    var = jnp.maximum(ssq / n - mean * mean, 0.0)
    inv = gamma[None, :] * jax.lax.rsqrt(var + eps)
    return inv, beta[None, :] - mean * inv
