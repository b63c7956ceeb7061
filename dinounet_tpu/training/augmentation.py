"""On-device (jit-compiled, vmapped) training augmentation.

Capability parity with the reference's batchgenerators CPU pipeline
(ref: dinounet/training/nnUNetTrainer/nnUNetTrainer.py:683-805 and
training/data_augmentation/*): spatial rotation+scaling with center crop from
the enlarged loader patch, Gaussian noise/blur, multiplicative brightness,
contrast (range-preserving), low-resolution simulation, double gamma (inverted
and plain, stats-retaining), mirroring, nonzero-mask zeroing, and the -1->0
label cleanup.

TPU-native design: the reference burns a pool of CPU worker processes on this
(`LimitedLenWrapper(NonDetMultiThreadedAugmenter)`, ref nnUNetTrainer.py:643);
here the whole pipeline is a single jit-compiled function over the batch on
device — the TPU augments while the host only memmap-copies patches.
Interpolation for the random affine is bilinear (data) / nearest (seg) rather
than the reference's cubic/linear — a documented deviation that keeps the warp
a pure gather (augmentation is stochastic; this does not change the label
distribution).

Layout: data (B, H, W, C) float32, seg (B, H, W) int32 (NHWC, channels last).
"""

import dataclasses
import math
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def get_enlarged_patch_size(final_patch_size, rot_max_rad: float,
                            scale_range=(0.85, 1.25)) -> np.ndarray:
    """Initial loader patch so that rotation+scaling never samples out of bounds.

    ref: training/data_augmentation/compute_initial_patch_size.py:4-24 (2-D case:
    rotate the patch corners by the max rotation, divide by min scale).
    """
    rot = min(90 / 360 * 2 * np.pi, abs(rot_max_rad))
    coords = np.array(final_patch_size[-2:], dtype=float)
    # |R(rot) @ coords| per axis
    rotated = np.abs(
        np.array([
            coords[0] * np.cos(rot) + coords[1] * np.sin(rot),
            coords[0] * np.sin(rot) + coords[1] * np.cos(rot),
        ])
    )
    final_shape = np.maximum(rotated, coords)
    final_shape /= min(scale_range)
    return final_shape.astype(int)


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    patch_size: Tuple[int, int] = (512, 512)  # final (network) patch size
    rotation_range: Tuple[float, float] = (-np.pi, np.pi)
    p_rotation: float = 0.2
    scale_range: Tuple[float, float] = (0.7, 1.4)
    p_scale: float = 0.2
    p_noise: float = 0.1
    noise_variance: Tuple[float, float] = (0.0, 0.1)
    p_blur: float = 0.2
    p_blur_per_channel: float = 0.5
    blur_sigma: Tuple[float, float] = (0.5, 1.0)
    p_brightness: float = 0.15
    brightness_range: Tuple[float, float] = (0.75, 1.25)
    p_contrast: float = 0.15
    contrast_range: Tuple[float, float] = (0.75, 1.25)
    p_lowres: float = 0.25
    p_lowres_per_channel: float = 0.5
    lowres_zoom: Tuple[float, float] = (0.5, 1.0)
    p_gamma_invert: float = 0.1
    p_gamma: float = 0.3
    gamma_range: Tuple[float, float] = (0.7, 1.5)
    mirror_axes: Tuple[int, ...] = (0, 1)
    use_mask_for_norm: Tuple[bool, ...] = ()


def _affine_coords(key, in_hw, out_hw, cfg: AugmentConfig):
    """Sample rotation/scale and produce source coords for each output pixel."""
    k_prot, k_rot, k_pscale, k_scale = jax.random.split(key, 4)
    do_rot = jax.random.uniform(k_prot) < cfg.p_rotation
    angle = jnp.where(
        do_rot, jax.random.uniform(k_rot, minval=cfg.rotation_range[0],
                                   maxval=cfg.rotation_range[1]), 0.0,
    )
    do_scale = jax.random.uniform(k_pscale) < cfg.p_scale
    scale = jnp.where(
        do_scale, jax.random.uniform(k_scale, minval=cfg.scale_range[0],
                                     maxval=cfg.scale_range[1]), 1.0,
    )
    H_in, W_in = in_hw
    H_out, W_out = out_hw
    cy_in, cx_in = (H_in - 1) / 2.0, (W_in - 1) / 2.0
    cy_out, cx_out = (H_out - 1) / 2.0, (W_out - 1) / 2.0
    ys = jnp.arange(H_out, dtype=jnp.float32) - cy_out
    xs = jnp.arange(W_out, dtype=jnp.float32) - cx_out
    yy = jnp.broadcast_to(ys[:, None], (H_out, W_out))
    xx = jnp.broadcast_to(xs[None, :], (H_out, W_out))
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    # batchgenerators scales the sampling grid: scale > 1 zooms out
    src_y = (cos * yy - sin * xx) * scale + cy_in
    src_x = (sin * yy + cos * xx) * scale + cx_in
    return src_y, src_x


def _bilinear_sample(img: jnp.ndarray, src_y, src_x, cval: float = 0.0):
    """img (H, W, C); src coords (h, w) -> (h, w, C), zero/cval outside."""
    H, W, _ = img.shape
    y0 = jnp.floor(src_y)
    x0 = jnp.floor(src_x)
    fy = src_y - y0
    fx = src_x - x0
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)
    out = 0.0
    for dy, dx, w in ((0, 0, (1 - fy) * (1 - fx)), (0, 1, (1 - fy) * fx),
                      (1, 0, fy * (1 - fx)), (1, 1, fy * fx)):
        yy = y0 + dy
        xx = x0 + dx
        valid = (yy >= 0) & (yy < H) & (xx >= 0) & (xx < W)
        v = img[jnp.clip(yy, 0, H - 1), jnp.clip(xx, 0, W - 1)]
        v = jnp.where(valid[..., None], v, cval)
        out = out + v * w[..., None]
    return out


def _nearest_sample(img: jnp.ndarray, src_y, src_x, cval):
    """img (H, W) int; nearest-neighbor with constant fill."""
    H, W = img.shape
    yy = jnp.round(src_y).astype(jnp.int32)
    xx = jnp.round(src_x).astype(jnp.int32)
    valid = (yy >= 0) & (yy < H) & (xx >= 0) & (xx < W)
    v = img[jnp.clip(yy, 0, H - 1), jnp.clip(xx, 0, W - 1)]
    return jnp.where(valid, v, cval)


def _gaussian_kernel(sigma, radius: int = 4):
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / jnp.maximum(sigma, 1e-6)) ** 2)
    return k / k.sum()


def _blur_channel(img2d: jnp.ndarray, sigma, enabled):
    """Separable Gaussian blur of one (H, W) channel."""
    k = _gaussian_kernel(sigma)
    r = (k.shape[0] - 1) // 2
    padded = jnp.pad(img2d, ((r, r), (0, 0)), mode="edge")
    v = jax.vmap(lambda col: jnp.convolve(col, k, mode="valid"), in_axes=1, out_axes=1)(padded)
    padded = jnp.pad(v, ((0, 0), (r, r)), mode="edge")
    h = jax.vmap(lambda row: jnp.convolve(row, k, mode="valid"), in_axes=0, out_axes=0)(padded)
    return jnp.where(enabled, h, img2d)


def _gamma_channel(x: jnp.ndarray, key, p: float, invert: bool, gamma_range):
    """Stats-retaining gamma (batchgenerators semantics): if U<0.5 draw gamma
    below 1, else above; normalize to [0,1] range first; restore mean/std."""
    k_p, k_side, k_lo, k_hi = jax.random.split(key, 4)
    apply = jax.random.uniform(k_p) < p
    gamma = jnp.where(
        jax.random.uniform(k_side) < 0.5,
        jax.random.uniform(k_lo, minval=gamma_range[0], maxval=1.0),
        jax.random.uniform(k_hi, minval=1.0, maxval=gamma_range[1]),
    )
    xin = -x if invert else x
    mean, std = xin.mean(), xin.std()
    mn = xin.min()
    rng_ = xin.max() - mn
    y = ((xin - mn) / jnp.maximum(rng_, 1e-7)) ** gamma * rng_ + mn
    # retain stats
    y = (y - y.mean()) / jnp.maximum(y.std(), 1e-8) * std + mean
    y = -y if invert else y
    return jnp.where(apply, y, x)


def _augment_one(key, data: jnp.ndarray, seg: jnp.ndarray, cfg: AugmentConfig):
    """data (H_in, W_in, C) float32; seg (H_in, W_in) int32 -> final patch size."""
    keys = jax.random.split(key, 18)
    H_out, W_out = cfg.patch_size
    C = data.shape[-1]

    # 1. spatial: rotation + scale + center crop to the final patch
    src_y, src_x = _affine_coords(keys[0], data.shape[:2], (H_out, W_out), cfg)
    x = _bilinear_sample(data, src_y, src_x, 0.0)
    seg = _nearest_sample(seg, src_y, src_x, -1)

    # 2. gaussian noise
    std = jax.random.uniform(keys[1], minval=cfg.noise_variance[0],
                             maxval=cfg.noise_variance[1])
    noise = jax.random.normal(keys[2], x.shape) * std
    x = jnp.where(jax.random.uniform(keys[3]) < cfg.p_noise, x + noise, x)

    # 3. gaussian blur (per channel)
    do_blur = jax.random.uniform(keys[4]) < cfg.p_blur
    ch_on = jax.random.uniform(keys[5], (C,)) < cfg.p_blur_per_channel
    sigmas = jax.random.uniform(keys[6], (C,), minval=cfg.blur_sigma[0],
                                maxval=cfg.blur_sigma[1])
    x = jax.vmap(
        lambda img2d, s, on: _blur_channel(img2d, s, do_blur & on),
        in_axes=(2, 0, 0), out_axes=2,
    )(x, sigmas, ch_on)

    # 4. multiplicative brightness (per channel)
    mult = jax.random.uniform(keys[7], (C,), minval=cfg.brightness_range[0],
                              maxval=cfg.brightness_range[1])
    x = jnp.where(jax.random.uniform(keys[8]) < cfg.p_brightness, x * mult, x)

    # 5. contrast, range preserving (per channel)
    f = jax.random.uniform(keys[9], (C,), minval=cfg.contrast_range[0],
                           maxval=cfg.contrast_range[1])
    mean = x.mean(axis=(0, 1), keepdims=True)
    mn = x.min(axis=(0, 1), keepdims=True)
    mx = x.max(axis=(0, 1), keepdims=True)
    contrasted = jnp.clip((x - mean) * f + mean, mn, mx)
    x = jnp.where(jax.random.uniform(keys[10]) < cfg.p_contrast, contrasted, x)

    # 6. simulate low resolution (per channel): nearest down, linear up
    do_lr = jax.random.uniform(keys[11]) < cfg.p_lowres
    lr_ch = jax.random.uniform(keys[12], (C,)) < cfg.p_lowres_per_channel
    zooms = jax.random.uniform(keys[13], (C,), minval=cfg.lowres_zoom[0],
                               maxval=cfg.lowres_zoom[1])

    def _lowres_channel(img2d, zoom, on):
        # downsample grid (nearest at stride 1/zoom), then sample it back linearly
        ys = jnp.arange(H_out, dtype=jnp.float32)
        xs = jnp.arange(W_out, dtype=jnp.float32)
        # nearest 'pixelation': snap coordinates to the coarse grid
        step = 1.0 / zoom
        snap_y = jnp.floor(ys / step) * step + step / 2
        snap_x = jnp.floor(xs / step) * step + step / 2
        yy = jnp.broadcast_to(snap_y[:, None], (H_out, W_out))
        xx = jnp.broadcast_to(snap_x[None, :], (H_out, W_out))
        out = _bilinear_sample(img2d[..., None], yy, xx, 0.0)[..., 0]
        return jnp.where(on & do_lr, out, img2d)

    x = jax.vmap(_lowres_channel, in_axes=(2, 0, 0), out_axes=2)(x, zooms, lr_ch)

    # 7. gamma (inverted then plain), per sample over all channels
    x = _gamma_channel(x, keys[14], cfg.p_gamma_invert, True, cfg.gamma_range)
    x = _gamma_channel(x, keys[15], cfg.p_gamma, False, cfg.gamma_range)

    # 8. mirroring
    km = (keys[16], keys[17])
    if 0 in cfg.mirror_axes:
        flip = jax.random.uniform(km[0]) < 0.5
        x = jnp.where(flip, x[::-1], x)
        seg = jnp.where(flip, seg[::-1], seg)
    if 1 in cfg.mirror_axes:
        flip = jax.random.uniform(km[1]) < 0.5
        x = jnp.where(flip, x[:, ::-1], x)
        seg = jnp.where(flip, seg[:, ::-1], seg)

    # 9. nonzero-mask zeroing (MaskTransform) + label cleanup (-1 -> 0)
    if any(cfg.use_mask_for_norm):
        outside = seg < 0
        for c, use in enumerate(cfg.use_mask_for_norm):
            if use:
                x = x.at[..., c].set(jnp.where(outside, 0.0, x[..., c]))
    seg = jnp.where(seg < 0, 0, seg)
    return x, seg


@partial(jax.jit, static_argnums=(3,))
def augment_batch_2d(key, data: jnp.ndarray, seg: jnp.ndarray,
                     cfg: AugmentConfig):
    """data (B, H_in, W_in, C) float32, seg (B, H_in, W_in) int32
    -> (B, *cfg.patch_size, C), (B, *cfg.patch_size)."""
    keys = jax.random.split(key, data.shape[0])
    return jax.vmap(lambda k, d, s: _augment_one(k, d, s, cfg))(keys, data, seg)


def downsample_seg_for_ds(seg: jnp.ndarray, scales: Sequence[Tuple[float, ...]]):
    """Nearest-neighbor seg pyramids for deep supervision
    (ref: deep_supervision_donwsampling.py:8)."""
    outs = []
    for scale in scales:
        if all(s == 1 for s in scale):
            outs.append(seg)
        else:
            tgt = tuple(int(round(d * s)) for d, s in zip(seg.shape[1:], scale))
            outs.append(
                jax.image.resize(seg, (seg.shape[0], *tgt), method="nearest")
            )
    return outs
