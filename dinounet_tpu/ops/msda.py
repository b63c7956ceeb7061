"""Multi-scale deformable attention core — pure-JAX implementation.

Replaces the reference's CUDA extension
(ref: dinounet/dinov3/eval/segmentation/models/utils/ops/src/cuda/ms_deform_im2col_cuda.cuh:243-304)
and matches the numerics of its pytorch debug path
(ref: dinounet/dinov3/eval/segmentation/models/utils/ms_deform_attn.py:71-92):
`F.grid_sample(..., mode='bilinear', padding_mode='zeros', align_corners=False)`
per level, weighted by softmaxed attention weights.

This version is a vectorized gather formulation: fully differentiable through
JAX autodiff (the take_along_axis VJP is a scatter-add, which is exactly the
col2im backward of the CUDA kernel). It is the numerical ground truth for the
Pallas kernel in msda_pallas.py and the implementation used on CPU.

Conventions (matching the reference):
  value:              (B, S, M, D)   S = sum of H_l*W_l over levels
  spatial_shapes:     static tuple ((H_0, W_0), ...)
  sampling_locations: (B, Lq, M, L, P, 2) in [0, 1], (x, y) order
  attention_weights:  (B, Lq, M, L, P) (already softmaxed over L*P)
  returns:            (B, Lq, M*D)
"""

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def _bilinear_gather_level(value_l: jnp.ndarray, loc: jnp.ndarray,
                           H: int, W: int) -> jnp.ndarray:
    """Sample one level with bilinear interpolation, zero padding outside.

    value_l: (B, M, H*W, D); loc: (B, Lq, M, P, 2) in [0,1] (x, y).
    Returns (B, Lq, M, P, D).
    """
    B, Lq, M, P, _ = loc.shape
    D = value_l.shape[-1]

    # align_corners=False pixel centers: unnormalized coord = loc * size - 0.5
    x = loc[..., 0] * W - 0.5
    y = loc[..., 1] * H - 0.5

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)

    out = None
    for dy, dx, wgt in (
        (0, 0, (1.0 - fy) * (1.0 - fx)),
        (0, 1, (1.0 - fy) * fx),
        (1, 0, fy * (1.0 - fx)),
        (1, 1, fy * fx),
    ):
        yy = y0 + dy
        xx = x0 + dx
        valid = (yy >= 0) & (yy < H) & (xx >= 0) & (xx < W)
        idx = jnp.clip(yy, 0, H - 1) * W + jnp.clip(xx, 0, W - 1)  # (B, Lq, M, P)
        # gather per head: value_l (B, M, HW, D), idx -> (B, M, Lq*P)
        idx_bm = idx.transpose(0, 2, 1, 3).reshape(B, M, Lq * P)
        g = jnp.take_along_axis(value_l, idx_bm[..., None], axis=2)  # (B, M, Lq*P, D)
        g = g.reshape(B, M, Lq, P, D).transpose(0, 2, 1, 3, 4)  # (B, Lq, M, P, D)
        w = jnp.where(valid, wgt, 0.0)
        contrib = g * w[..., None].astype(g.dtype)
        out = contrib if out is None else out + contrib
    return out


def ms_deform_attn_core(value: jnp.ndarray,
                        spatial_shapes: Sequence[Tuple[int, int]],
                        sampling_locations: jnp.ndarray,
                        attention_weights: jnp.ndarray) -> jnp.ndarray:
    """Pure-JAX multi-scale deformable attention (see module docstring)."""
    B, S, M, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    assert L == len(spatial_shapes)
    assert S == sum(h * w for h, w in spatial_shapes)

    # (B, S, M, D) -> (B, M, S, D) once, then slice per level
    value_bm = value.transpose(0, 2, 1, 3)

    out = jnp.zeros((B, Lq, M, D), dtype=value.dtype)
    start = 0
    for lvl, (H, W) in enumerate(spatial_shapes):
        value_l = jax.lax.slice_in_dim(value_bm, start, start + H * W, axis=2)
        sampled = _bilinear_gather_level(
            value_l, sampling_locations[:, :, :, lvl], H, W
        )  # (B, Lq, M, P, D)
        w = attention_weights[:, :, :, lvl]  # (B, Lq, M, P)
        out = out + (sampled * w[..., None].astype(sampled.dtype)).sum(axis=3)
        start += H * W
    return out.reshape(B, Lq, M * D)
