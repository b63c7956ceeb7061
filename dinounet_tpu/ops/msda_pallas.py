"""Multi-scale deformable attention — Pallas TPU kernel.

Replaces the reference CUDA extension (ref: dinounet/dinov3/eval/segmentation/
models/utils/ops/src/cuda/ms_deform_im2col_cuda.cuh:243-304) with a TPU-native
formulation: instead of per-thread scalar gathers (a GPU pattern that maps badly
onto the TPU's vector/matrix units), each (batch, head, query-block) program
builds a sparse bilinear-interpolation matrix W[s, q] = sum_p attn[q,p] *
bilerp_weight(s; loc[q,p]) in VMEM and contracts it against the value level
with the MXU:

    out[d, q] = sum_s value[d, s] @ W[s, q]

W is built FACTORIZED: the bilinear weight separates into row and column
parts, bilerp(y, x) = wy(y) * wx(x), so per sampling point the kernel builds
two thin one-hot-weighted vectors Yw (H, Q) and Xw (W, Q) (two compares each)
and materializes their outer product Yw[:, None, :] * Xw[None, :, :] directly
into the (H, W, Q) accumulator — one fused multiply-add over S*Q per point
instead of four one-hot compare/select passes per corner. This is ~3x faster
than the per-corner one-hot build at DinoUNet shapes (S=1024, Lq=5376).

All arrays are laid out with the large dims (S | Q) on the TPU lane axis.

Three public entry points:

- `ms_deform_attn_pallas` — reference-layout API (value (B, S, M, D),
  normalized locations (B, Lq, M, L, P, 2)); does the layout transposes on the
  XLA side. Used by tests and the generic path.
- `ms_deform_attn_pallas_premapped` — kernel-native layouts (value
  (B, M, D, S); unnormalized pixel coords / weights (B, M, L*P, Lq)). The
  adapter produces these layouts directly from its projection matmuls
  (channel-major einsum outputs), removing ~100 MB/call of XLA-side
  transpose+pad traffic that round-1 profiling attributed to MSDA prep.
- `ms_deform_attn_pallas_premapped_fused` — premapped plus in-kernel prep:
  consumes the projections' raw bf16 offsets (x/y-interleaved rows) and
  pre-softmax logits with a constant fp32 reference-point base grid, doing
  the fp32 cast + base add + point-softmax in VMEM (opt-in via
  DINOUNET_TPU_MSDA_PREP=fused; see configuration.msda_fused_prep).

Numerics match ops.msda.ms_deform_attn_core (the pure-JAX/grid_sample-parity
implementation). The backward is a second Pallas kernel with the same
factorization — the col2im semantics of the CUDA extension
(ref: ms_deform_im2col_cuda.cuh:307-928): grad_value = g @ W^T on the MXU,
grad_attn/grad_loc from re-sampled values and the separable weight
derivatives d bilerp/dx = wy * wx', d bilerp/dy = wy' * wx.
"""

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dinounet_tpu.ops.msda import ms_deform_attn_core

# Default query-block size: 512 measured ~8% faster than 256 at DinoUNet
# shapes (Lq=5376, S=1024): bigger blocks amortize the per-program
# iota/zero-init and raise the final dot's N-dimension utilization; 1024
# regresses (VMEM pressure on the (H, W, Q) accumulator).
BLK_Q = 512


def _pick_blk_q(Lq: int) -> int:
    """Largest lane-aligned block that divides Lq exactly (no padding, no
    in-kernel masking); falls back to BLK_Q + padding. Lq=5376 -> 384."""
    for blk in (512, 384, 256, 128):
        if Lq % blk == 0:
            return blk
    return BLK_Q


def _row_col_weights(iota_h, iota_w, H, W, x, y):
    """Separable bilinear weight vectors for one sampling point.

    Returns (yw, xw, dyw, dxw): yw/xw are the one-hot-weighted row/column
    weight vectors ((H, Q) / (W, Q)) whose outer product is the bilinear
    weight matrix; dyw/dxw are their derivatives wrt y/x (for the backward).
    Out-of-range corners contribute zero (grid_sample padding_mode='zeros').
    """
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    vy0 = ((y0i >= 0) & (y0i < H)).astype(jnp.float32)
    vy1 = ((y0i + 1 >= 0) & (y0i + 1 < H)).astype(jnp.float32)
    vx0 = ((x0i >= 0) & (x0i < W)).astype(jnp.float32)
    vx1 = ((x0i + 1 >= 0) & (x0i + 1 < W)).astype(jnp.float32)
    hit_y0 = iota_h == y0i
    hit_y1 = iota_h == y0i + 1
    hit_x0 = iota_w == x0i
    hit_x1 = iota_w == x0i + 1
    yw = (jnp.where(hit_y0, (1.0 - fy) * vy0, 0.0)
          + jnp.where(hit_y1, fy * vy1, 0.0))
    xw = (jnp.where(hit_x0, (1.0 - fx) * vx0, 0.0)
          + jnp.where(hit_x1, fx * vx1, 0.0))
    dyw = jnp.where(hit_y1, vy1, 0.0) - jnp.where(hit_y0, vy0, 0.0)
    dxw = jnp.where(hit_x1, vx1, 0.0) - jnp.where(hit_x0, vx0, 0.0)
    return yw, xw, dyw, dxw


def _fwd_kernel(shapes, P, build_dtype, xs_ref, ys_ref, aw_ref, value_ref,
                out_ref):
    """One program = one (b, m, q-block).

    xs_ref/ys_ref/aw_ref: (1, 1, L*P, BLK) fp32 — unnormalized sample coords
      (align_corners=False pixel space) and softmaxed attention weights.
    value_ref: (1, 1, D, S) in build_dtype.
    out_ref:   (1, 1, D, BLK) fp32.

    build_dtype=bfloat16 (opt-in, configuration.msda_bf16_build) packs the
    dominant (H, W, Q) accumulate at 2x VPU rate; coords/weights stay f32 up
    to the thin per-point vectors, the MXU dot accumulates f32.
    """
    D = value_ref.shape[2]
    Q = out_ref.shape[3]
    acc = None  # first level's dot writes the accumulator directly (the
    # DinoUNet path has a single level, so a zero-init + add is pure waste)
    start = 0
    for lvl, (H, W) in enumerate(shapes):
        S_l = H * W
        iota_h = jax.lax.broadcasted_iota(jnp.int32, (H, Q), 0)
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (W, Q), 0)
        w3 = None  # first point writes the (H, W, Q) buffer directly — no
        # zero-init + add pass over the largest tensor in the kernel
        for p in range(P):
            row = lvl * P + p
            x = xs_ref[0, 0, row : row + 1, :]  # (1, BLK)
            y = ys_ref[0, 0, row : row + 1, :]
            aw = aw_ref[0, 0, row : row + 1, :]
            yw, xw, _, _ = _row_col_weights(iota_h, iota_w, H, W, x, y)
            yw = yw.astype(build_dtype)
            awxw = (aw * xw).astype(build_dtype)
            term = yw[:, None, :] * awxw[None, :, :]
            w3 = term if w3 is None else w3 + term
        # value arrives in its storage dtype (bf16 halves the DMA); the
        # cast to the build dtype happens on the VMEM-resident slice
        v = value_ref[0, 0, :, start : start + S_l].astype(build_dtype)
        lvl_out = jax.lax.dot_general(
            v, w3.reshape(S_l, Q), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = lvl_out if acc is None else acc + lvl_out
        start += S_l
    out_ref[0, 0] = acc.astype(out_ref.dtype)


def _pad_q(arrs, blk, coord_pad=-10.0):
    """Pad the last (lane) axis of [(array, is_coord), ...] up to a multiple
    of blk. Coord arrays pad with an out-of-range value (zero contribution);
    weight/grad arrays pad with zero."""
    Lq = arrs[0][0].shape[-1]
    q_pad = (-Lq) % blk
    if not q_pad:
        return [a for a, _ in arrs]
    return [
        jnp.pad(a, ((0, 0), (0, 0), (0, 0), (0, q_pad)),
                constant_values=coord_pad if is_coord else 0.0)
        for a, is_coord in arrs
    ]


def _forward_premapped(v, spatial_shapes, xs, ys, aw, interpret=False,
                       out_dtype=jnp.float32):
    """Kernel-native layouts in, kernel-native layout out.

    v: (B, M, D, S) fp32 (or bf16 under msda_bf16_build); xs/ys:
    (B, M, L*P, Lq) fp32 unnormalized pixel coords (value_grid * loc - 0.5);
    aw: (B, M, L*P, Lq) fp32. Returns (B, M, D, Lq) in out_dtype — the
    kernel rounds its fp32 accumulator on store, so a bf16 consumer (the
    fused output projection) skips a separate 30+ MB XLA cast pass."""
    from dinounet_tpu.configuration import msda_bf16_build

    B, M, D, S = v.shape
    LP, Lq = xs.shape[2], xs.shape[3]
    L = len(spatial_shapes)
    P = LP // L
    build_dtype = jnp.bfloat16 if msda_bf16_build() else jnp.float32

    blk = _pick_blk_q(Lq)
    xs, ys, aw = _pad_q([(xs, True), (ys, True), (aw, False)], blk)
    Lq_p = xs.shape[3]
    n_qb = Lq_p // blk

    kernel = functools.partial(_fwd_kernel, tuple(spatial_shapes), P,
                               build_dtype)
    out = pl.pallas_call(
        kernel,
        grid=(B, M, n_qb),
        in_specs=[
            pl.BlockSpec((1, 1, LP, blk), lambda b, m, q: (b, m, 0, q),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, LP, blk), lambda b, m, q: (b, m, 0, q),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, LP, blk), lambda b, m, q: (b, m, 0, q),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D, S), lambda b, m, q: (b, m, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, D, blk), lambda b, m, q: (b, m, 0, q),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, M, D, Lq_p), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * M * D * S * Lq_p,
            bytes_accessed=4 * B * M * (3 * LP * Lq_p + D * S + D * Lq_p),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xs, ys, aw, v)
    if Lq_p != Lq:
        out = out[:, :, :, :Lq]
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 5, 6))
def ms_deform_attn_pallas_premapped(value_t,
                                    spatial_shapes: Tuple[Tuple[int, int], ...],
                                    xs, ys, aw, interpret=False,
                                    out_dtype=jnp.float32):
    """Pallas MSDA over kernel-native layouts (see module docstring).

    value_t (B, M, D, S) fp32, xs/ys/aw (B, M, L*P, Lq) fp32 with xs/ys in
    unnormalized pixel space (grid * normalized_loc - 0.5). Returns
    (B, M, D, Lq) in out_dtype. Backward is the Pallas col2im kernel; the
    returned coordinate grads are in the same pixel units (the caller's
    unnormalize chain is differentiated by JAX outside this custom_vjp)."""
    return _forward_premapped(value_t, spatial_shapes, xs, ys, aw, interpret,
                              out_dtype)


def _premapped_fwd(value_t, spatial_shapes, xs, ys, aw, interpret, out_dtype):
    out = _forward_premapped(value_t, spatial_shapes, xs, ys, aw, interpret,
                             out_dtype)
    return out, (value_t, xs, ys, aw)


def _premapped_bwd(spatial_shapes, interpret, out_dtype, res, g):
    value_t, xs, ys, aw = res
    gv, ga, gx, gy = _backward_premapped(
        value_t, spatial_shapes, xs, ys, aw, g.astype(jnp.float32), interpret)
    # cotangent dtypes must match the primals (value_t may be bf16; the
    # col2im kernel accumulates f32)
    return gv.astype(value_t.dtype), gx, gy, ga


ms_deform_attn_pallas_premapped.defvjp(_premapped_fwd, _premapped_bwd)


def _fwd_kernel_fused(shapes, P, build_dtype, off_ref, logit_ref, base_ref,
                      value_ref, out_ref):
    """Fused-prep forward: one program = one (b, m, q-block).

    Takes the adapter's projection outputs RAW — bf16 sampling offsets
    (interleaved x/y rows) and bf16 pre-softmax attention logits — plus the
    constant reference-point base grid, and performs the prep the XLA side
    used to do (fp32 cast, base add, softmax over the L*P points) in VMEM.
    The offset/logit DMAs move half the bytes and three XLA passes per MSDA
    call disappear; the added VPU work (L*P-row softmax + adds over the
    (L*P, BLK) tile) is <1% of the W-build.

    off_ref:   (1, 1, 2*L*P, BLK) — rows 2r / 2r+1 = x / y offset of point r
               (the natural row order of the offsets projection's
               (M, L*P, 2) feature layout).
    logit_ref: (1, 1, L*P, BLK) — pre-softmax attention logits.
    base_ref:  (2*L*P, BLK) fp32 — ref*grid − 0.5, same interleaving; shared
               across (b, m).
    """
    _fused_core(shapes, P, build_dtype, off_ref[0, 0], logit_ref[0, 0],
                base_ref, value_ref, out_ref)


def _fwd_kernel_fused_merged(shapes, P, build_dtype, packed_ref, base_ref,
                             value_ref, out_ref):
    """Fused-prep forward over the MERGED projection buffer (round 5).

    packed_ref: (1, 1, 3*L*P, BLK) — per head, rows [0, 2LP) are the raw
    bf16 sampling offsets (x/y interleaved) and rows [2LP, 3LP) the raw
    pre-softmax attention logits, as emitted by ONE channel-major einsum
    whose weight matrix interleaves the sampling_offsets / attention_weights
    kernels per head. The query activation is then read from HBM once per
    extractor instead of twice (the two separate 66 MB dot reads the round-5
    floor analysis flagged). Both slices are sublane-aligned (2LP = 8)."""
    LP2 = 2 * len(shapes) * P
    _fused_core(shapes, P, build_dtype, packed_ref[0, 0, :LP2],
                packed_ref[0, 0, LP2:], base_ref, value_ref, out_ref)


def _fused_core(shapes, P, build_dtype, off, logits, base_ref, value_ref,
                out_ref):
    Q = out_ref.shape[3]
    logits = logits.astype(jnp.float32)  # (LP, Q)
    logits = logits - jnp.max(logits, axis=0, keepdims=True)
    ex = jnp.exp(logits)
    s = ex / jnp.sum(ex, axis=0, keepdims=True)
    coords = off.astype(jnp.float32) + base_ref[...]  # (2LP, Q)
    acc = None
    start = 0
    for lvl, (H, W) in enumerate(shapes):
        S_l = H * W
        iota_h = jax.lax.broadcasted_iota(jnp.int32, (H, Q), 0)
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (W, Q), 0)
        w3 = None
        for p in range(P):
            row = lvl * P + p
            x = coords[2 * row : 2 * row + 1, :]  # (1, BLK)
            y = coords[2 * row + 1 : 2 * row + 2, :]
            aw = s[row : row + 1, :]
            yw, xw, _, _ = _row_col_weights(iota_h, iota_w, H, W, x, y)
            yw = yw.astype(build_dtype)
            awxw = (aw * xw).astype(build_dtype)
            term = yw[:, None, :] * awxw[None, :, :]
            w3 = term if w3 is None else w3 + term
        v = value_ref[0, 0, :, start : start + S_l].astype(build_dtype)
        lvl_out = jax.lax.dot_general(
            v, w3.reshape(S_l, Q), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = lvl_out if acc is None else acc + lvl_out
        start += S_l
    out_ref[0, 0] = acc.astype(out_ref.dtype)


def _forward_premapped_fused(v, spatial_shapes, off, logits, base,
                             interpret=False, out_dtype=jnp.float32):
    """Fused-prep variant of _forward_premapped.

    v (B, M, D, S) storage dtype; off (B, M, 2*L*P, Lq) / logits
    (B, M, L*P, Lq) in the projections' compute dtype (bf16); base
    (2*L*P, Lq) fp32. Returns (B, M, D, Lq) in out_dtype."""
    from dinounet_tpu.configuration import msda_bf16_build

    B, M, D, S = v.shape
    LP, Lq = logits.shape[2], logits.shape[3]
    L = len(spatial_shapes)
    P = LP // L
    build_dtype = jnp.bfloat16 if msda_bf16_build() else jnp.float32

    blk = _pick_blk_q(Lq)
    q_pad = (-Lq) % blk
    if q_pad:
        # pad offsets/logits with zero and the base with an out-of-range
        # coordinate so padded queries contribute nothing
        off = jnp.pad(off, ((0, 0), (0, 0), (0, 0), (0, q_pad)))
        logits = jnp.pad(logits, ((0, 0), (0, 0), (0, 0), (0, q_pad)))
        base = jnp.pad(base, ((0, 0), (0, q_pad)), constant_values=-10.0)
    Lq_p = logits.shape[3]
    n_qb = Lq_p // blk

    kernel = functools.partial(_fwd_kernel_fused, tuple(spatial_shapes), P,
                               build_dtype)
    out = pl.pallas_call(
        kernel,
        grid=(B, M, n_qb),
        in_specs=[
            pl.BlockSpec((1, 1, 2 * LP, blk), lambda b, m, q: (b, m, 0, q),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, LP, blk), lambda b, m, q: (b, m, 0, q),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * LP, blk), lambda b, m, q: (0, q),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D, S), lambda b, m, q: (b, m, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, D, blk), lambda b, m, q: (b, m, 0, q),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, M, D, Lq_p), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * M * D * S * Lq_p,
            bytes_accessed=B * M * (2 * 3 * LP * Lq_p + 2 * D * S
                                    + 4 * D * Lq_p),
            transcendentals=B * M * LP * Lq_p,
        ),
        interpret=interpret,
    )(off, logits, base, v)
    if Lq_p != Lq:
        out = out[:, :, :, :Lq]
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 5, 6))
def ms_deform_attn_pallas_premapped_fused(value_t,
                                          spatial_shapes: Tuple[Tuple[int, int], ...],
                                          off, logits, base, interpret=False,
                                          out_dtype=jnp.float32):
    """Pallas MSDA with in-kernel prep (base add + softmax) — see
    _fwd_kernel_fused. Forward-equal to

        xs = f32(off[:, :, 0::2]) + base[0::2]
        ys = f32(off[:, :, 1::2]) + base[1::2]
        ms_deform_attn_pallas_premapped(value_t, shapes, xs, ys,
                                        softmax(f32(logits), axis=2))

    The backward recomputes the prep on the XLA side (cheap relative to the
    col2im kernels), runs the premapped col2im backward, and chain-rules the
    softmax analytically: g_logits = s * (g_s − Σ_p g_s·s). `base` is built
    from constant reference grids (deform_inputs), so its cotangent is zero."""
    return _forward_premapped_fused(value_t, spatial_shapes, off, logits,
                                    base, interpret, out_dtype)


def _premapped_fused_prep(off, logits, base):
    xs = off[:, :, 0::2, :].astype(jnp.float32) + base[0::2]
    ys = off[:, :, 1::2, :].astype(jnp.float32) + base[1::2]
    s = jax.nn.softmax(logits.astype(jnp.float32), axis=2)
    return xs, ys, s


def _premapped_fused_fwd(value_t, spatial_shapes, off, logits, base,
                         interpret, out_dtype):
    out = _forward_premapped_fused(value_t, spatial_shapes, off, logits,
                                   base, interpret, out_dtype)
    return out, (value_t, off, logits, base)


def _premapped_fused_bwd(spatial_shapes, interpret, out_dtype, res, g):
    value_t, off, logits, base = res
    B, M, LP, Lq = logits.shape
    xs, ys, s = _premapped_fused_prep(off, logits, base)
    gv, gs, gx, gy = _backward_premapped(
        value_t, spatial_shapes, xs, ys, s, g.astype(jnp.float32), interpret)
    g_logits = (s * (gs - jnp.sum(gs * s, axis=2, keepdims=True))
                ).astype(logits.dtype)
    g_off = jnp.stack([gx, gy], axis=3).reshape(B, M, 2 * LP, Lq
                                                ).astype(off.dtype)
    return gv.astype(value_t.dtype), g_off, g_logits, jnp.zeros_like(base)


ms_deform_attn_pallas_premapped_fused.defvjp(_premapped_fused_fwd,
                                             _premapped_fused_bwd)


def _forward_premapped_fused_merged(v, spatial_shapes, packed, base,
                                    interpret=False, out_dtype=jnp.float32):
    """Fused-prep forward over the merged projection buffer.

    v (B, M, D, S) storage dtype; packed (B, M, 3*L*P, Lq) bf16 — per head,
    rows [0, 2LP) raw offsets / rows [2LP, 3LP) raw logits (see
    _fwd_kernel_fused_merged); base (2*L*P, Lq) fp32."""
    from dinounet_tpu.configuration import msda_bf16_build

    B, M, D, S = v.shape
    LP3, Lq = packed.shape[2], packed.shape[3]
    L = len(spatial_shapes)
    LP = LP3 // 3
    P = LP // L
    build_dtype = jnp.bfloat16 if msda_bf16_build() else jnp.float32

    blk = _pick_blk_q(Lq)
    q_pad = (-Lq) % blk
    if q_pad:
        # zero offset/logit padding + out-of-range base: padded queries
        # contribute nothing (same scheme as the unmerged variant)
        packed = jnp.pad(packed, ((0, 0), (0, 0), (0, 0), (0, q_pad)))
        base = jnp.pad(base, ((0, 0), (0, q_pad)), constant_values=-10.0)
    Lq_p = packed.shape[3]
    n_qb = Lq_p // blk

    kernel = functools.partial(_fwd_kernel_fused_merged,
                               tuple(spatial_shapes), P, build_dtype)
    out = pl.pallas_call(
        kernel,
        grid=(B, M, n_qb),
        in_specs=[
            pl.BlockSpec((1, 1, 3 * LP, blk), lambda b, m, q: (b, m, 0, q),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * LP, blk), lambda b, m, q: (0, q),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D, S), lambda b, m, q: (b, m, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, D, blk), lambda b, m, q: (b, m, 0, q),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, M, D, Lq_p), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * M * D * S * Lq_p,
            bytes_accessed=B * M * (2 * 3 * LP * Lq_p + 2 * D * S
                                    + 4 * D * Lq_p),
            transcendentals=B * M * LP * Lq_p,
        ),
        interpret=interpret,
    )(packed, base, v)
    if Lq_p != Lq:
        out = out[:, :, :, :Lq]
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 4, 5))
def ms_deform_attn_pallas_premapped_fused_merged(
        value_t, spatial_shapes: Tuple[Tuple[int, int], ...], packed, base,
        interpret=False, out_dtype=jnp.float32):
    """Fused-prep MSDA consuming the merged offsets+logits projection.

    Forward-equal to ms_deform_attn_pallas_premapped_fused with
    off = packed[:, :, :2LP], logits = packed[:, :, 2LP:] — but the adapter
    emits `packed` from ONE einsum over the query (the sampling_offsets and
    attention_weights kernels interleaved per head on the weight side), so
    the 66 MB query activation is read once instead of twice per extractor
    and no XLA slice pass materializes between the projection and this
    custom call (round 5; configuration.msda_merged_proj)."""
    return _forward_premapped_fused_merged(value_t, spatial_shapes, packed,
                                           base, interpret, out_dtype)


def _premapped_fused_merged_fwd(value_t, spatial_shapes, packed, base,
                                interpret, out_dtype):
    out = _forward_premapped_fused_merged(value_t, spatial_shapes, packed,
                                          base, interpret, out_dtype)
    return out, (value_t, packed, base)


def _premapped_fused_merged_bwd(spatial_shapes, interpret, out_dtype, res, g):
    value_t, packed, base = res
    LP = packed.shape[2] // 3
    off = packed[:, :, :2 * LP]
    logits = packed[:, :, 2 * LP:]
    B, M, _, Lq = logits.shape
    xs, ys, s = _premapped_fused_prep(off, logits, base)
    gv, gs, gx, gy = _backward_premapped(
        value_t, spatial_shapes, xs, ys, s, g.astype(jnp.float32), interpret)
    g_logits = (s * (gs - jnp.sum(gs * s, axis=2, keepdims=True))
                ).astype(packed.dtype)
    g_off = jnp.stack([gx, gy], axis=3).reshape(B, M, 2 * LP, Lq
                                                ).astype(packed.dtype)
    g_packed = jnp.concatenate([g_off, g_logits], axis=2)
    return gv.astype(value_t.dtype), g_packed, jnp.zeros_like(base)


ms_deform_attn_pallas_premapped_fused_merged.defvjp(
    _premapped_fused_merged_fwd, _premapped_fused_merged_bwd)


def _pallas_forward(value, spatial_shapes, sampling_locations, attention_weights,
                    interpret=False):
    B, S, M, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape

    # XLA-side prep: unnormalize coords, fold levels*points, lane-major layouts.
    sizes = jnp.asarray([[w, h] for (h, w) in spatial_shapes], jnp.float32)  # (L,2)
    unnorm = sampling_locations.astype(jnp.float32) * sizes[None, None, None, :, None, :] - 0.5
    # (B, Lq, M, L, P, 2) -> (B, M, L*P, Lq)
    xs = unnorm[..., 0].transpose(0, 2, 3, 4, 1).reshape(B, M, L * P, Lq)
    ys = unnorm[..., 1].transpose(0, 2, 3, 4, 1).reshape(B, M, L * P, Lq)
    aw = attention_weights.astype(jnp.float32).transpose(0, 2, 3, 4, 1).reshape(B, M, L * P, Lq)
    # value (B, S, M, D) -> (B, M, D, S)
    v = value.astype(jnp.float32).transpose(0, 2, 3, 1)

    out = _forward_premapped(v, spatial_shapes, xs, ys, aw, interpret)
    # (B, M, D, Lq) -> (B, Lq, M*D)
    out = out.transpose(0, 3, 1, 2).reshape(B, Lq, M * D)
    return out.astype(value.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 4))
def ms_deform_attn_pallas(value, spatial_shapes: Tuple[Tuple[int, int], ...],
                          sampling_locations, attention_weights, interpret=False):
    """Pallas-accelerated forward; backward is the Pallas col2im kernel
    (`_pallas_backward`, wired via defvjp below) computing grad_value /
    grad_sampling_locations / grad_attention_weights with scatter-add
    semantics identical to the CUDA col2im backward
    (ref: ms_deform_im2col_cuda.cuh:307-928)."""
    return _pallas_forward(value, spatial_shapes, sampling_locations,
                           attention_weights, interpret)


def _fwd(value, spatial_shapes, sampling_locations, attention_weights, interpret):
    out = _pallas_forward(value, spatial_shapes, sampling_locations,
                          attention_weights, interpret)
    return out, (value, sampling_locations, attention_weights)


def _bwd(spatial_shapes, interpret, res, g):
    value, sampling_locations, attention_weights = res
    return _pallas_backward(value, spatial_shapes, sampling_locations,
                            attention_weights, g, interpret)


ms_deform_attn_pallas.defvjp(_fwd, _bwd)


def _bwd_kernel(shapes, P, xs_ref, ys_ref, aw_ref, value_ref, g_ref,
                gv_ref, ga_ref, gx_ref, gy_ref):
    """One program = one (b, m, q-block); q is the innermost (sequential) grid
    dim so gv_ref (whose index map ignores q) accumulates across q-blocks.

    Semantics = the CUDA col2im backward
    (ref: ms_deform_im2col_cuda.cuh:307-928): grad_value is the scatter-add
    transpose of the forward gather, expressed here as the matmul
    g (D,Q) @ W^T (Q,S); grad_attn / grad_loc contract re-sampled values and
    bilinear-weight derivatives against g on the MXU.
    """
    D = value_ref.shape[2]
    Q = g_ref.shape[3]
    qb = pl.program_id(2)

    @pl.when(qb == 0)
    def _():
        gv_ref[0, 0] = jnp.zeros_like(gv_ref[0, 0])

    g = g_ref[0, 0]  # (D, Q)
    start = 0
    for lvl, (H, W) in enumerate(shapes):
        S_l = H * W
        iota_h = jax.lax.broadcasted_iota(jnp.int32, (H, Q), 0)
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (W, Q), 0)
        v = value_ref[0, 0, :, start : start + S_l].astype(jnp.float32)
        w3_total = None  # first point writes the buffer directly
        for p in range(P):
            row = lvl * P + p
            x = xs_ref[0, 0, row : row + 1, :]  # (1, Q)
            y = ys_ref[0, 0, row : row + 1, :]
            aw = aw_ref[0, 0, row : row + 1, :]
            yw, xw, dyw, dxw = _row_col_weights(iota_h, iota_w, H, W, x, y)
            w_plain = (yw[:, None, :] * xw[None, :, :]).reshape(S_l, Q)
            dwdx = (yw[:, None, :] * dxw[None, :, :]).reshape(S_l, Q)
            dwdy = (dyw[:, None, :] * xw[None, :, :]).reshape(S_l, Q)
            term = yw[:, None, :] * (aw * xw)[None, :, :]
            w3_total = term if w3_total is None else w3_total + term

            # sampled value / its positional derivatives at this point: (D, Q)
            sampled = jax.lax.dot_general(
                v, w_plain, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            sdx = jax.lax.dot_general(
                v, dwdx, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            sdy = jax.lax.dot_general(
                v, dwdy, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            ga_ref[0, 0, row, :] = jnp.sum(sampled * g, axis=0)
            gx_ref[0, 0, row, :] = aw[0] * jnp.sum(sdx * g, axis=0)
            gy_ref[0, 0, row, :] = aw[0] * jnp.sum(sdy * g, axis=0)

        # grad_value level block: g (D,Q) @ w_total^T (Q,S_l) -> (D, S_l)
        gv_ref[0, 0, :, start : start + S_l] += jax.lax.dot_general(
            g, w3_total.reshape(S_l, Q), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        start += S_l


def _backward_premapped(v, spatial_shapes, xs, ys, aw, g, interpret=False):
    """Premapped-layout backward: v (B, M, D, S), xs/ys/aw (B, M, L*P, Lq),
    g (B, M, D, Lq). Returns (gv (B,M,D,S), ga, gx, gy (B,M,L*P,Lq)) with
    coordinate grads in pixel units."""
    B, M, D, S = v.shape
    LP, Lq = xs.shape[2], xs.shape[3]
    L = len(spatial_shapes)
    P = LP // L

    blk = _pick_blk_q(Lq)
    xs, ys, aw = _pad_q([(xs, True), (ys, True), (aw, False)], blk)
    q_pad = xs.shape[3] - Lq
    if q_pad:
        g = jnp.pad(g, ((0, 0), (0, 0), (0, 0), (0, q_pad)))
    Lq_p = xs.shape[3]
    n_qb = Lq_p // blk

    kernel = functools.partial(_bwd_kernel, tuple(spatial_shapes), P)
    lane_spec = pl.BlockSpec((1, 1, LP, blk), lambda b, m, q: (b, m, 0, q),
                             memory_space=pltpu.VMEM)
    gv, ga, gx, gy = pl.pallas_call(
        kernel,
        grid=(B, M, n_qb),
        in_specs=[
            lane_spec, lane_spec, lane_spec,
            pl.BlockSpec((1, 1, D, S), lambda b, m, q: (b, m, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D, blk), lambda b, m, q: (b, m, 0, q),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, D, S), lambda b, m, q: (b, m, 0, 0),
                         memory_space=pltpu.VMEM),
            lane_spec, lane_spec, lane_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, M, D, S), jnp.float32),
            jax.ShapeDtypeStruct((B, M, LP, Lq_p), jnp.float32),
            jax.ShapeDtypeStruct((B, M, LP, Lq_p), jnp.float32),
            jax.ShapeDtypeStruct((B, M, LP, Lq_p), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 4 * B * M * D * S * Lq_p,
            bytes_accessed=4 * B * M * (4 * LP * Lq_p + 2 * D * S + D * Lq_p),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xs, ys, aw, v, g)
    if q_pad:
        ga, gx, gy = (a[..., :Lq] for a in (ga, gx, gy))
    return gv, ga, gx, gy


def _pallas_backward(value, spatial_shapes, sampling_locations, attention_weights,
                     g, interpret=False):
    """Returns (grad_value, grad_sampling_locations, grad_attention_weights)
    in the reference layouts."""
    B, S, M, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape

    sizes = jnp.asarray([[w, h] for (h, w) in spatial_shapes], jnp.float32)  # (L,2)
    unnorm = (sampling_locations.astype(jnp.float32)
              * sizes[None, None, None, :, None, :] - 0.5)
    xs = unnorm[..., 0].transpose(0, 2, 3, 4, 1).reshape(B, M, L * P, Lq)
    ys = unnorm[..., 1].transpose(0, 2, 3, 4, 1).reshape(B, M, L * P, Lq)
    aw = (attention_weights.astype(jnp.float32)
          .transpose(0, 2, 3, 4, 1).reshape(B, M, L * P, Lq))
    v = value.astype(jnp.float32).transpose(0, 2, 3, 1)  # (B, M, D, S)
    # g: (B, Lq, M*D) -> (B, M, D, Lq)
    gt = g.astype(jnp.float32).reshape(B, Lq, M, D).transpose(0, 2, 3, 1)

    gv, ga, gx, gy = _backward_premapped(v, spatial_shapes, xs, ys, aw, gt,
                                         interpret)

    # back to caller layouts
    grad_value = gv.transpose(0, 3, 1, 2).astype(value.dtype)  # (B, S, M, D)
    ga = ga.reshape(B, M, L, P, Lq).transpose(0, 4, 1, 2, 3)
    grad_attn = ga.astype(attention_weights.dtype)
    gx = gx.reshape(B, M, L, P, Lq).transpose(0, 4, 1, 2, 3)
    gy = gy.reshape(B, M, L, P, Lq).transpose(0, 4, 1, 2, 3)
    # chain rule through unnormalization: d unnorm/d loc = (W_l, H_l)
    grad_loc = jnp.stack(
        [gx * sizes[None, None, None, :, None, 0],
         gy * sizes[None, None, None, :, None, 1]], axis=-1
    ).astype(sampling_locations.dtype)
    return grad_value, grad_loc, grad_attn
