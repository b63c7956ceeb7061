"""Fused high-resolution decoder tail — channel-major Pallas TPU kernels.

The final U-Net decoder stage runs at full tile resolution with 32-64
channels; XLA's TPU conv emitter handles sub-128 output channels by packing
batch into sublanes ("EmitOutputBatchInSublanes") and runs these convs at
~12% MFU, plus standalone InstanceNorm-apply / leaky_relu passes at 25% lane
utilization (round-2 trace, BASELINE.md: stage2 conv0 3.26 ms + conv1
2.04 ms + leaky select 1.64 ms + seg 0.71 ms at 512^2).

These kernels run the stage in a channel-major (B, C, H, W) layout where the
lane dimension is W (512 -> all 128 lanes live) and the 3x3 convolution is a
dy-summed / dx-stacked matmul:

    acc[(dx, cout), j, x] = sum_{dy, cin} W[dy, dx, cin, cout] * in[cin, j+dy, x]
    out[cout, j, x]       = sum_{dx} acc[(dx, cout), j, x + dx - 1]

i.e. three K=Cin matmuls with M = 3*Cout (75-100% MXU shapes vs 25%) followed
by a cheap lane shift-add. One program = one (batch, row-stripe); halo rows
arrive as two extra 1-row operands whose block index is clamped at the image
boundary and masked to the conv's zero padding in-kernel. InstanceNorm is
global over H*W per (sample, channel), so the chain is three pallas_calls
with per-stripe partial sums reduced between them (XLA-side, tiny):

    A: conv0(concat(up, skip)) + b0           -> y0 + (sum, sumsq)
    B: conv1(leaky(IN0(y0))) + b1             -> y1 + (sum, sumsq)
    C: seg(leaky(IN1(y1)))                    -> fp32 logits

The earlier single-conv Pallas attempt (BASELINE.md negative results) lost to
XLA because NHWC<->channel-major transposes appeared at every stage boundary;
here the whole tail commits to the channel-major layout, so the relayout
happens once on entry (the 64-channel concat input) and once on the fp32
logits.

Inference-only by design: the decoder engages these kernels when train=False
(training keeps the plain flax graph, whose backward XLA already handles
well), so no custom VJP is carried.

ref semantics: dinounet_training.py:517-629 (UNetDecoder: transpconv ->
concat -> StackedConvBlocks(conv+InstanceNorm+leaky_relu) -> 1x1 seg head);
numerics match models/layers.py::ConvNormAct / decoder.py::SegHead (bf16
conv with f32 accumulation, fp32 InstanceNorm, fp32 logits).
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift_add(acc, bias):
    """acc: (3, Cout, R, W) f32 -> (Cout, R, W): out[.., x] =
    acc[0][.., x-1] + acc[1][.., x] + acc[2][.., x+1] + bias, with zero
    columns beyond the W edges (the conv's SAME zero padding)."""
    left = acc[0]
    mid = acc[1]
    right = acc[2]
    z = jnp.zeros_like(left[..., :1])
    out = mid + jnp.concatenate([z, left[..., :-1]], axis=-1)
    out = out + jnp.concatenate([right[..., 1:], z], axis=-1)
    return out + bias


def _conv_kernel(leaky_slope, n_stripes, x_ref, xp_ref, xn_ref, w_ref, b_ref,
                 s_ref, t_ref, o_ref, sum_ref=None, ssq_ref=None):
    """One (batch, stripe) program of conv3x3 (+ optional input prologue).

    x: (1, Cin, R, W) current stripe rows; xp/xn: (1, Cin, 8, W) halo row
    windows — Mosaic needs >=8-row blocks, so the neighbor stripes' edge
    8-row windows arrive (block-index clamped at the image boundary) and the
    single halo row is sliced here; w: (3*Cin, 3*Cout) f32 stacked as
    [(dy, cin), (dx, cout)]; b: (Cout, 1, 1); s/t: (1, Cin, 1, 1)
    per-(sample, channel) input prologue x*s + t followed by leaky_relu (the
    previous InstanceNorm's apply; s=1, t=0, slope=None for the raw first
    conv) — shaped so the kernel broadcasts unit minor dims instead of a
    lane-moving (1, 1, C) -> (C, 1, 1) reshape, which Mosaic's
    infer-vector-layout rejects on hardware;
    o: (1, Cout, R, W); sum/ssq: (1, 1, Cout, 1) stripe partial sums of the
    output (fp32, for the next InstanceNorm) — kept 2-D in-kernel (1-D
    vectors crash Mosaic's layout inference)."""
    i = pl.program_id(1)
    Cin, R, W = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    Cout = o_ref.shape[1]
    cdt = o_ref.dtype

    x = jnp.concatenate(
        [xp_ref[0, :, -1:, :], x_ref[0], xn_ref[0, :, :1, :]], axis=1)
    # (Cin, R+2, W)

    if leaky_slope is not None:
        xf = x.astype(jnp.float32) * s_ref[0] + t_ref[0]
        x = jnp.where(xf >= 0, xf, xf * leaky_slope).astype(cdt)

    # the conv's zero padding applies to the (prologue-activated) feature
    # map, so out-of-image halo rows zero out AFTER the prologue —
    # leaky(0*s + t) is not 0
    zrow = jnp.zeros_like(x[:, :1, :])
    x = jnp.concatenate([
        jnp.where(i == 0, zrow, x[:, :1, :]),
        x[:, 1:-1, :],
        jnp.where(i == n_stripes - 1, zrow, x[:, -1:, :]),
    ], axis=1)

    w = w_ref[...].astype(cdt).reshape(3, Cin, 3 * Cout)
    # bias arrives (Cout, 1, 1) from the host: broadcasting unit minor dims
    # is legal in Mosaic where a (1, Cout) -> (Cout, 1, 1) lane-moving
    # reshape is not
    bias = b_ref[...].astype(jnp.float32)

    # row chunks keep the f32 (3*Cout, CH*W) accumulator small; the three
    # K=Cin matmuls per chunk read dy-shifted views of the halo-extended
    # stripe (no copies)
    ch = min(_CHUNK_ROWS, R)
    want_stats = sum_ref is not None
    psum = jnp.zeros((Cout, 1), jnp.float32)
    pssq = jnp.zeros((Cout, 1), jnp.float32)
    for r0 in range(0, R, ch):
        acc = None
        for dy in range(3):
            rhs = x[:, r0 + dy:r0 + dy + ch, :].reshape(Cin, ch * W)
            part = jax.lax.dot_general(
                w[dy], rhs, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (3*Cout, ch*W)
            acc = part if acc is None else acc + part
        out = _shift_add(acc.reshape(3, Cout, ch, W), bias)
        o_ref[0, :, r0:r0 + ch, :] = out.astype(cdt)
        if want_stats:
            of = o_ref[0, :, r0:r0 + ch, :].astype(jnp.float32)
            # two-stage reduction keeps every vector >= 2-D for Mosaic
            psum = psum + jnp.sum(jnp.sum(of, axis=2), axis=1, keepdims=True)
            pssq = pssq + jnp.sum(jnp.sum(of * of, axis=2), axis=1,
                                  keepdims=True)
    if want_stats:
        sum_ref[0, 0] = psum
        ssq_ref[0, 0] = pssq


def _conv_kernel_merged(leaky_slope, n_stripes, x_ref, xp_ref, xn_ref, w_ref,
                        b_ref, s_ref, t_ref, m_ref, o_ref, sum_ref=None,
                        ssq_ref=None):
    """Lane-merged variant of _conv_kernel (same operands + an edge-mask
    operand m: (2, R*W) f32, row 0 zeroing columns x%W==0, row 1 zeroing
    x%W==W-1).

    The chunked kernel's inner loop reads dy-shifted sublane windows
    (x[:, r0+dy:r0+dy+8, :]) whose row offsets are not tile-aligned, so
    Mosaic relayouts the stripe once per (chunk, dy) — the round-3 trace
    pinned the 512^2 convs at ~7% MFU on exactly that cost (BASELINE.md
    negative result). Here the halo-extended stripe is merged ONCE into the
    lane dimension, (Cin, R+2, W) -> (Cin, (R+2)*W) — legal because
    W % 128 == 0 (tools/probe_interleave.py lane-merge rule) — after which
    the three dy taps are lane slices at offsets dy*W, i.e. whole-lane-tile
    offsets with no relayout. The dx combine moves to the output side as
    1-lane shift-adds masked at the row edges (the merged form wraps row
    y's last column into row y+1's first, so the host passes explicit edge
    masks instead of an in-kernel iota/mod)."""
    i = pl.program_id(1)
    Cin, R, W = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    Cout = o_ref.shape[1]
    cdt = o_ref.dtype

    x = jnp.concatenate(
        [xp_ref[0, :, -1:, :], x_ref[0], xn_ref[0, :, :1, :]], axis=1)
    # (Cin, R+2, W)

    if leaky_slope is not None:
        xf = x.astype(jnp.float32) * s_ref[0] + t_ref[0]
        x = jnp.where(xf >= 0, xf, xf * leaky_slope).astype(cdt)

    # conv zero padding applies to the (prologue-activated) map: mask the
    # out-of-image halo rows AFTER the prologue (leaky(0*s + t) is not 0)
    zrow = jnp.zeros_like(x[:, :1, :])
    x = jnp.concatenate([
        jnp.where(i == 0, zrow, x[:, :1, :]),
        x[:, 1:-1, :],
        jnp.where(i == n_stripes - 1, zrow, x[:, -1:, :]),
    ], axis=1)
    xm = x.reshape(Cin, (R + 2) * W)  # lane merge (W % 128 == 0)

    w = w_ref[...].astype(cdt).reshape(3, Cin, 3 * Cout)
    bias = b_ref[..., 0].astype(jnp.float32)  # (Cout, 1)

    n = R * W
    acc = None
    for dy in range(3):
        rhs = xm[:, dy * W:dy * W + n]  # lane-tile-aligned slice
        part = jax.lax.dot_general(
            w[dy], rhs, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (3*Cout, R*W)
        acc = part if acc is None else acc + part
    acc = acc.reshape(3, Cout, n)
    left, mid, right = acc[0], acc[1], acc[2]
    z = jnp.zeros((Cout, 1), jnp.float32)
    out = mid + m_ref[0] * jnp.concatenate([z, left[:, :-1]], axis=-1)
    out = out + m_ref[1] * jnp.concatenate([right[:, 1:], z], axis=-1)
    out = (out + bias).astype(cdt)
    o_ref[0] = out.reshape(Cout, R, W)
    if sum_ref is not None:
        of = out.astype(jnp.float32)  # stats over the cdt-rounded output
        sum_ref[0, 0] = jnp.sum(of, axis=1, keepdims=True)
        ssq_ref[0, 0] = jnp.sum(of * of, axis=1, keepdims=True)


def _seg_kernel(leaky_slope, x_ref, w_ref, b_ref, s_ref, t_ref, o_ref):
    """Final 1x1 seg head over the IN-applied, leaky-activated features.
    x: (1, C, R, W); w: (C, K) f32; b: (K, 1, 1); s/t: (1, C, 1, 1) IN apply.
    o: (1, K, R, W) fp32 logits."""
    C, R, W = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    xf = x_ref[0].astype(jnp.float32) * s_ref[0] + t_ref[0]
    xf = jnp.where(xf >= 0, xf, xf * leaky_slope)
    x = xf.astype(x_ref.dtype).reshape(C, R * W)
    out = jax.lax.dot_general(
        w_ref[...].astype(x_ref.dtype), x, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (K, R*W)
    K = o_ref.shape[1]
    o_ref[0] = out.reshape(K, R, W) + b_ref[...]


_CHUNK_ROWS = 8  # inner accumulator rows: f32 (3*Cout, 8*W) stays ~1.6 MB


def _pick_stripe(h: int, vmem_rows: int = 32):
    """Stripe height: the largest multiple-of-8 divisor of h <= vmem_rows
    (the stats sums require exact tiling — no padded rows). None if h has
    no such divisor."""
    for r in range(min(vmem_rows, h), 7, -8):
        if h % r == 0 and r % 8 == 0:
            return r
    return None


def tail_supported(shape: Tuple[int, ...]) -> bool:
    """Whether the fused tail kernels can run on a (B, C, H, W) feature map:
    H must split into equal multiple-of-8 stripes and W must fill whole
    lane tiles (both hold for every nnU-Net 2d patch size, which are
    divisible by 2**n_stages)."""
    H, W = shape[-2], shape[-1]
    return _pick_stripe(H) is not None and W % 128 == 0


def _stack_conv_weights(w):
    """(3, 3, Cin, Cout) -> (3*Cin, 3*Cout) stacked [(dy, cin), (dx, cout)]."""
    ky, kx, cin, cout = w.shape
    assert ky == 3 and kx == 3
    return jnp.transpose(w, (0, 2, 1, 3)).reshape(3 * cin, 3 * cout)


def conv3x3_cm(x_cm, w, b, prologue=None, leaky_slope=0.01,
               interpret: bool = False, stats: bool = True,
               inner: str = None):
    """conv3x3(SAME, bias) over channel-major (B, Cin, H, W) input, with an
    optional fused input prologue `leaky(x * s + t)` (s/t (B, Cin) fp32 — the
    preceding InstanceNorm's apply). Returns (y (B, Cout, H, W) in x.dtype,
    sum (B, Cout) f32, sumsq (B, Cout) f32) where the sums run over H*W of y;
    with stats=False (a consumer that needs no norm statistics, e.g. the SPM
    stem whose BatchNorm uses running stats at inference) returns y alone.
    w: (3, 3, Cin, Cout) f32 (flax nn.Conv layout); b: (Cout,) f32.
    inner: 'merged' (default — aligned lane-slice dy taps over one merged
    stripe, _conv_kernel_merged) or 'chunked' (the round-3 dy-shifted-read
    kernel, kept for A/B)."""
    from dinounet_tpu.configuration import conv_cm_inner

    B, Cin, H, W = x_cm.shape
    Cout = w.shape[-1]
    if inner is None:
        inner = conv_cm_inner()
    merged = inner == "merged"
    # merged keeps a whole-stripe f32 (3*Cout, R*W) accumulator in VMEM, so
    # it runs narrower stripes than the chunked kernel
    R = _pick_stripe(H, vmem_rows=16) if merged else _pick_stripe(H)
    assert R is not None and H % R == 0, (H, R)
    n_stripes = H // R
    if prologue is None:
        s = jnp.ones((B, Cin), jnp.float32)
        t = jnp.zeros((B, Cin), jnp.float32)
        slope = None
    else:
        s, t = prologue
        slope = leaky_slope
    ws = _stack_conv_weights(w)
    if merged:
        kern = functools.partial(_conv_kernel_merged, slope, n_stripes)
    else:
        kern = functools.partial(_conv_kernel, slope, n_stripes)

    # halo operands: the neighbor stripe's edge 8-row window (dim-2 block
    # size 8 => block index units of 8 rows; R % 8 == 0 so the halo row sits
    # at a fixed offset). Clamped at the boundary; the kernel masks it to
    # the conv's zero padding.
    r8 = R // 8
    prev_spec = pl.BlockSpec(
        (1, Cin, 8, W),
        lambda bi, i: (bi, 0, jnp.maximum(i * r8 - 1, 0), 0),
        memory_space=pltpu.VMEM)
    next_spec = pl.BlockSpec(
        (1, Cin, 8, W),
        lambda bi, i: (bi, 0, jnp.minimum((i + 1) * r8, H // 8 - 1), 0),
        memory_space=pltpu.VMEM)
    out_specs = [
        pl.BlockSpec((1, Cout, R, W), lambda bi, i: (bi, 0, i, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [jax.ShapeDtypeStruct((B, Cout, H, W), x_cm.dtype)]
    if stats:
        stat_spec = pl.BlockSpec((1, 1, Cout, 1), lambda bi, i: (bi, i, 0, 0),
                                 memory_space=pltpu.VMEM)
        out_specs += [stat_spec, stat_spec]
        out_shape += [
            jax.ShapeDtypeStruct((B, n_stripes, Cout, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, n_stripes, Cout, 1), jnp.float32),
        ]
    in_specs = [
        pl.BlockSpec((1, Cin, R, W), lambda bi, i: (bi, 0, i, 0),
                     memory_space=pltpu.VMEM),
        prev_spec,
        next_spec,
        pl.BlockSpec((3 * Cin, 3 * Cout), lambda bi, i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Cout, 1, 1), lambda bi, i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Cin, 1, 1), lambda bi, i: (bi, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Cin, 1, 1), lambda bi, i: (bi, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [x_cm, x_cm, x_cm, ws, b.reshape(Cout, 1, 1),
                s.reshape(B, Cin, 1, 1), t.reshape(B, Cin, 1, 1)]
    if merged:
        # row-edge masks for the merged dx shift-add: row 0 zeros columns
        # x % W == 0 (left-tap wrap), row 1 zeros x % W == W-1 (right-tap)
        m = np.ones((2, R, W), np.float32)
        m[0, :, 0] = 0.0
        m[1, :, -1] = 0.0
        in_specs.append(pl.BlockSpec((2, R * W), lambda bi, i: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(jnp.asarray(m.reshape(2, R * W)))
    res = pl.pallas_call(
        kern,
        grid=(B, n_stripes),
        in_specs=in_specs,
        out_specs=out_specs if stats else out_specs[0],
        out_shape=out_shape if stats else out_shape[0],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * 9 * Cin * Cout,
            bytes_accessed=x_cm.dtype.itemsize * B * H * W * (Cin + Cout),
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)
    if not stats:
        return res
    y, ssum, ssq = res
    return y, jnp.sum(ssum, axis=(1, 3)), jnp.sum(ssq, axis=(1, 3))


def seg_head_cm(x_cm, w, b, prologue, leaky_slope=0.01,
                interpret: bool = False):
    """1x1 seg head over channel-major features with the fused
    `leaky(x * s + t)` prologue. x_cm: (B, C, H, W); w: (C, K) f32;
    b: (K,) f32. Returns fp32 logits (B, K, H, W)."""
    B, C, H, W = x_cm.shape
    K = w.shape[-1]
    R = _pick_stripe(H)
    assert R is not None and H % R == 0, (H, R)
    n_stripes = H // R
    s, t = prologue
    kern = functools.partial(_seg_kernel, leaky_slope)
    return pl.pallas_call(
        kern,
        grid=(B, n_stripes),
        in_specs=[
            pl.BlockSpec((1, C, R, W), lambda bi, i: (bi, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, K), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 1, 1), lambda bi, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, 1, 1), lambda bi, i: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, 1, 1), lambda bi, i: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, K, R, W), lambda bi, i: (bi, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, K, H, W), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * C * K,
            bytes_accessed=x_cm.dtype.itemsize * B * H * W * C,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x_cm, w, b.astype(jnp.float32).reshape(K, 1, 1),
      s.reshape(B, C, 1, 1), t.reshape(B, C, 1, 1))


def _transpconv_kernel(leaky_slope, packed, x_ref, w_ref, b_ref, s_ref,
                       t_ref, o_ref):
    """One (batch, stripe) program of a kernel=stride=2 transposed conv in
    channel-major layout, with an optional `leaky(x*s + t)` input prologue
    (the previous InstanceNorm's apply — lets CM decoder stages chain
    without materializing the activated map). x: (1, Cin, R, W); w:
    (Cin, 4*Cout) stacked [(cin), (p, q, cout)]; b: (4*Cout, 1); s/t:
    (1, Cin, 1, 1); o: packed -> (1, Cout, 2R, W) uint32 (bf16 pairs),
    else (1, Cout, 2R, 2W) compute dtype.

    k2s2 transpconv = four phase matmuls (one full-MXU M=4*Cout dot) +
    spatial interleave: out[c, 2j+p, 2x+q] = ph[(p, q, c), j, x] + b.

    The bias arrives pre-stacked as (4*Cout, 1) and is added to the 2-D
    matmul result by lane broadcast — Mosaic rejects reshapes that move the
    lane dimension into the middle of a higher-rank vector (the original
    (1, Cout) -> (1, 1, Cout, 1, 1) bias cast failed infer-vector-layout on
    real TPU hardware).

    The column (q) interleave is the hard part: Mosaic cannot lower a
    (..., W, 2) -> (..., 2W) lane-moving shape cast (the round-2 hardware
    failure: `tpu.reshape vector<32x16x128x2xf32> -> vector<32x16x1x256xf32>`,
    BENCH_r02.json). With a bf16 output, the interleave is instead done as a
    LANE-LOCAL bit pack (tools/probe_interleave.py, strategy D): round both
    phases to bf16, place q=0 in the low 16 bits and q=1 in the high 16 bits
    of a uint32 lane, and let the caller bit-view the (.., W) uint32 output
    as (.., 2W) bf16 — which XLA performs as a free layout-preserving
    bitcast+reshape. The row (p) interleave is a sublane-dim stack+reshape,
    which Mosaic lowers fine (probe strategy E)."""
    Cin, R, W = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    Cout = o_ref.shape[1]
    cdt = jnp.bfloat16 if packed else o_ref.dtype
    x = x_ref[0]
    if leaky_slope is not None:
        xf = x.astype(jnp.float32) * s_ref[0] + t_ref[0]
        x = jnp.where(xf >= 0, xf, xf * leaky_slope).astype(cdt)
    ph = jax.lax.dot_general(
        w_ref[...].astype(x.dtype), x.reshape(Cin, R * W),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ) + b_ref[...].astype(jnp.float32)  # (4*Cout, R*W) + (4*Cout, 1)
    ph = ph.reshape(2, 2, Cout, R, W)
    if packed:
        def pack(a, b):
            # uint32 lane = bf16(b) << 16 | bf16(a); the bf16->f32 round
            # trip is exact, so the high 16 bits of the f32 pattern ARE the
            # RNE-rounded bf16 bits
            ua = pltpu.bitcast(
                a.astype(jnp.bfloat16).astype(jnp.float32), jnp.uint32)
            ub = pltpu.bitcast(
                b.astype(jnp.bfloat16).astype(jnp.float32), jnp.uint32)
            return (ub & jnp.uint32(0xFFFF0000)) | (ua >> 16)

        rows = [pack(ph[p, 0], ph[p, 1]) for p in range(2)]
        o_ref[0] = jnp.stack(rows, axis=2).reshape(Cout, 2 * R, W)
    else:
        # interpret-mode / non-bf16 fallback: plain stack+reshape interleave
        # (numerically identical; does not lower on real TPU hardware)
        rows = []
        for p in range(2):
            wide = jnp.stack([ph[p, 0], ph[p, 1]],
                             axis=-1).reshape(Cout, R, 2 * W)
            rows.append(wide)
        o_ref[0] = jnp.stack(rows, axis=2).reshape(
            Cout, 2 * R, 2 * W).astype(o_ref.dtype)


def transpconv2x2_cm(x_cm, w, b, prologue=None, leaky_slope=0.01,
                     interpret: bool = False):
    """ConvTranspose(kernel=2, stride=2) over channel-major (B, Cin, H, W),
    with an optional fused `leaky(x*s + t)` input prologue (s/t (B, Cin)
    f32 — the preceding InstanceNorm's apply): returns (B, Cout, 2H, 2W) in
    x.dtype. w: (2, 2, Cin, Cout) f32 (flax nn.ConvTranspose layout);
    b: (Cout,) f32 (pass zeros when bias-free)."""
    B, Cin, H, W = x_cm.shape
    Cout = w.shape[-1]
    if W % 128 != 0:
        # Narrow maps (the chain's lowest-res entry, e.g. 64^2 for a 512^2
        # tile) can't merge (R, W) into the lane dim — Mosaic rejects the
        # (Cin, R, W) -> (Cin, R*W) shape cast unless W fills whole 128-lane
        # tiles. These inputs are tiny (<2% of the chain's FLOPs), so run
        # them XLA-side with the same rounding points as the kernel: bf16
        # conv, one f32 bias add, single round to the compute dtype.
        x = x_cm
        if prologue is not None:
            s, t = prologue
            xf = (x.astype(jnp.float32) * s[:, :, None, None]
                  + t[:, :, None, None])
            x = jnp.where(xf >= 0, xf, xf * leaky_slope).astype(x_cm.dtype)
        y = jax.lax.conv_transpose(
            x, w.astype(x.dtype), (2, 2), "VALID",
            dimension_numbers=("NCHW", "HWIO", "NCHW"),
            preferred_element_type=jnp.float32)
        return (y + b[None, :, None, None]).astype(x_cm.dtype)
    R = _pick_stripe(H, vmem_rows=16)
    assert R is not None and H % R == 0, (H, R)
    n_stripes = H // R
    if prologue is None:
        s = jnp.ones((B, Cin), jnp.float32)
        t = jnp.zeros((B, Cin), jnp.float32)
        slope = None
    else:
        s, t = prologue
        slope = leaky_slope
    # lax.conv_transpose flips the kernel spatially: out phase (p, q) reads
    # K[1-p, 1-q] (verified against flax TransposedConv with a delta input)
    ws = jnp.transpose(w[::-1, ::-1], (2, 0, 1, 3)).reshape(Cin, 4 * Cout)
    # bf16 output -> the lane (q) interleave runs as an in-kernel bit pack
    # into uint32 lanes (the only interleave Mosaic lowers on hardware; see
    # _transpconv_kernel) and the pairs are bit-viewed back here, which XLA
    # compiles to a free bitcast (layout-preserving). Other dtypes keep the
    # stack+reshape interleave, which only runs in interpret mode.
    packed = x_cm.dtype == jnp.bfloat16
    if packed:
        out_spec = pl.BlockSpec((1, Cout, 2 * R, W),
                                lambda bi, i: (bi, 0, i, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((B, Cout, 2 * H, W), jnp.uint32)
    else:
        out_spec = pl.BlockSpec((1, Cout, 2 * R, 2 * W),
                                lambda bi, i: (bi, 0, i, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((B, Cout, 2 * H, 2 * W), x_cm.dtype)
    y = pl.pallas_call(
        functools.partial(_transpconv_kernel, slope, packed),
        grid=(B, n_stripes),
        in_specs=[
            pl.BlockSpec((1, Cin, R, W), lambda bi, i: (bi, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Cin, 4 * Cout), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * Cout, 1), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cin, 1, 1), lambda bi, i: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cin, 1, 1), lambda bi, i: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_spec,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * 4 * Cin * Cout,
            bytes_accessed=x_cm.dtype.itemsize * B * H * W * (Cin + 4 * Cout),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x_cm, ws, jnp.tile(b, 4).reshape(4 * Cout, 1),
      s.reshape(B, Cin, 1, 1), t.reshape(B, Cin, 1, 1))
    if packed:
        # bit-view the u32 pairs back to interleaved bf16. The f32-view
        # formulation (low half << 16 / masked high half are exactly the f32
        # patterns of the two bf16 values) measures at copy cost on TPU,
        # where bitcast_convert_type(u32 -> bf16[..., 2]) costs an extra
        # layout pass (microbench: +0.16 vs +0.62 ms on the 512^2 stage).
        lo = jax.lax.bitcast_convert_type(
            y << 16, jnp.float32).astype(jnp.bfloat16)
        hi = jax.lax.bitcast_convert_type(
            y & jnp.uint32(0xFFFF0000), jnp.float32).astype(jnp.bfloat16)
        y = jnp.stack([lo, hi], axis=-1).reshape(B, Cout, 2 * H, 2 * W)
    return y


def instance_norm_apply_params(ssum, ssq, n, gamma, beta, eps=1e-5):
    """Per-(sample, channel) InstanceNorm apply coefficients from the
    accumulated sums: returns (s, t) with IN(x) = x * s + t.
    ssum/ssq: (B, C) f32; n = H*W; gamma/beta: (C,) f32."""
    mu = ssum / n
    var = jnp.maximum(ssq / n - mu * mu, 0.0)
    s = gamma[None, :] * jax.lax.rsqrt(var + eps)
    return s, beta[None, :] - mu * s


def decoder_tail_reference(up_skip_cm, w0, b0, g0, be0, w1, b1, g1, be1,
                           wseg, bseg, eps=1e-5, slope=0.01):
    """Pure-jnp reference of the fused tail (same rounding points), for tests.
    up_skip_cm: (B, Cin, H, W) compute dtype."""
    x = jnp.transpose(up_skip_cm, (0, 2, 3, 1))  # NHWC

    def conv(x, w, b):
        y = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return (y + b.astype(jnp.float32)).astype(x.dtype)

    def in_leaky(y, g, be):
        yf = y.astype(jnp.float32)
        mu = yf.mean((1, 2), keepdims=True)
        var = jnp.maximum((yf * yf).mean((1, 2), keepdims=True) - mu * mu, 0.0)
        z = (yf - mu) * jax.lax.rsqrt(var + eps) * g + be
        return jnp.where(z >= 0, z, z * slope)

    y0 = conv(x, w0, b0)
    z0 = in_leaky(y0, g0, be0).astype(x.dtype)
    y1 = conv(z0, w1, b1)
    z1 = in_leaky(y1, g1, be1).astype(x.dtype)
    logits = jnp.einsum("bhwc,ck->bhwk", z1.astype(jnp.float32),
                        wseg) + bseg
    return jnp.transpose(logits, (0, 3, 1, 2))


def decoder_chain_cm(lres_cm, skips_cm, stage_params, seg_params,
                     deep_supervision: bool, eps=1e-5, slope=0.01,
                     interpret: bool = False):
    """Run consecutive decoder stages entirely channel-major: per stage,
    transpconv(leaky(IN(x))) -> concat(skip) -> conv0 -> IN -> leaky ->
    conv1 -> IN-stats, with each InstanceNorm apply fused into the next
    kernel's input prologue — the activated feature map is never
    materialized between stages.

    lres_cm: (B, C, h, w) lowest-res stream (raw — the first transpconv has
    no pending norm); skips_cm: per-stage CM skip tensors (decoding order);
    stage_params: per-stage (kt, bt, w0, b0, g0, be0, w1, b1, g1, be1);
    seg_params: per-stage (wseg (C, K), bseg (K,)). Returns a list with one
    entry per stage (decoding order): fp32 logits (B, K, H, W) where a seg
    head is computed (all stages under deep supervision, else the last
    only), None elsewhere."""
    x = lres_cm
    prologue = None
    outs = []
    n_stages = len(stage_params)
    for i, ((kt, bt, w0, b0, g0, be0, w1, b1, g1, be1), skip_cm) in enumerate(
            zip(stage_params, skips_cm)):
        up = transpconv2x2_cm(x, kt, bt, prologue=prologue, leaky_slope=slope,
                              interpret=interpret)
        xx = jnp.concatenate([up, skip_cm], axis=1)
        n = xx.shape[2] * xx.shape[3]
        y0, s0, q0 = conv3x3_cm(xx, w0, b0, interpret=interpret)
        p0 = instance_norm_apply_params(s0, q0, n, g0, be0, eps)
        y1, s1, q1 = conv3x3_cm(y0, w1, b1, prologue=p0, leaky_slope=slope,
                                interpret=interpret)
        prologue = instance_norm_apply_params(s1, q1, n, g1, be1, eps)
        if deep_supervision or i == n_stages - 1:
            wseg, bseg = seg_params[i]
            outs.append(seg_head_cm(y1, wseg, bseg, prologue,
                                    leaky_slope=slope, interpret=interpret))
        else:
            outs.append(None)
        x = y1
    return outs


def decoder_tail_cm(up_skip_cm, w0, b0, g0, be0, w1, b1, g1, be1, wseg, bseg,
                    eps=1e-5, slope=0.01, interpret: bool = False):
    """The full fused tail over a channel-major (B, Cin, H, W) input (the
    concatenated transpconv+skip features): conv0 -> IN -> leaky -> conv1 ->
    IN -> leaky -> 1x1 seg. Returns fp32 logits (B, K, H, W)."""
    n = up_skip_cm.shape[2] * up_skip_cm.shape[3]
    y0, s0, q0 = conv3x3_cm(up_skip_cm, w0, b0, interpret=interpret)
    p0 = instance_norm_apply_params(s0, q0, n, g0, be0, eps)
    y1, s1, q1 = conv3x3_cm(y0, w1, b1, prologue=p0, leaky_slope=slope,
                            interpret=interpret)
    p1 = instance_norm_apply_params(s1, q1, n, g1, be1, eps)
    return seg_head_cm(y1, wseg, bseg, p1, leaky_slope=slope,
                       interpret=interpret)
