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
Interpolation for the random affine defaults to bilinear (data) / nearest
(seg) rather than the reference's cubic/linear — bilinear keeps the warp a
4-tap gather. A cubic (Catmull-Rom) data warp is available via
`AugmentConfig(data_interp_order=3)`; a controlled training comparison
(tools/aug_interp_experiment.py, results in BASELINE.md) measured the
bilinear-vs-cubic choice as training-neutral on the synthetic learnability
task, backing the default.

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
    # 1 = bilinear (default; pure 4-tap gather), 3 = cubic Catmull-Rom
    # (16-tap; the reference pipeline's order_data=3 equivalent). The
    # bilinear-vs-cubic choice was measured to be training-neutral — see
    # BASELINE.md "Augmentation interpolation experiment".
    data_interp_order: int = 1


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


def _cubic_sample(img: jnp.ndarray, src_y, src_x, cval: float = 0.0):
    """Separable cubic (Catmull-Rom, a=-0.5) warp of img (H, W, C): the
    on-device stand-in for the reference pipeline's order-3 spatial warp
    (batchgenerators SpatialTransform order_data=3). 16-tap gather; outside
    taps contribute cval (border_mode_data='constant')."""
    H, W, _ = img.shape
    a = -0.5
    y0 = jnp.floor(src_y)
    x0 = jnp.floor(src_x)
    fy = src_y - y0
    fx = src_x - x0
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)

    def cubic_w(d):
        ad = jnp.abs(d)
        w_near = (a + 2.0) * ad ** 3 - (a + 3.0) * ad ** 2 + 1.0
        w_far = a * ad ** 3 - 5.0 * a * ad ** 2 + 8.0 * a * ad - 4.0 * a
        return jnp.where(ad <= 1.0, w_near, jnp.where(ad < 2.0, w_far, 0.0))

    wy = [cubic_w(fy - dy) for dy in (-1, 0, 1, 2)]
    wx = [cubic_w(fx - dx) for dx in (-1, 0, 1, 2)]
    out = 0.0
    for iy, dy in enumerate((-1, 0, 1, 2)):
        yy = y0 + dy
        vy = (yy >= 0) & (yy < H)
        yc = jnp.clip(yy, 0, H - 1)
        for ix, dx in enumerate((-1, 0, 1, 2)):
            xx = x0 + dx
            valid = vy & (xx >= 0) & (xx < W)
            v = img[yc, jnp.clip(xx, 0, W - 1)]
            v = jnp.where(valid[..., None], v, cval)
            out = out + v * (wy[iy] * wx[ix])[..., None]
    return out


def _nearest_sample(img: jnp.ndarray, src_y, src_x, cval):
    """img (H, W) or (H, W, S) int; nearest-neighbor with constant fill."""
    H, W = img.shape[:2]
    yy = jnp.round(src_y).astype(jnp.int32)
    xx = jnp.round(src_x).astype(jnp.int32)
    valid = (yy >= 0) & (yy < H) & (xx >= 0) & (xx < W)
    v = img[jnp.clip(yy, 0, H - 1), jnp.clip(xx, 0, W - 1)]
    if img.ndim == 3:
        valid = valid[..., None]
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
    """data (H_in, W_in, C) float32; seg (H_in, W_in) or (H_in, W_in, S) int32
    (extra trailing seg channels, e.g. the cascade's previous-stage labelmap,
    ride through the same spatial transform) -> final patch size."""
    keys = jax.random.split(key, 18)
    H_out, W_out = cfg.patch_size
    C = data.shape[-1]

    # 1. spatial: rotation + scale + center crop to the final patch
    src_y, src_x = _affine_coords(keys[0], data.shape[:2], (H_out, W_out), cfg)
    sample = _cubic_sample if cfg.data_interp_order == 3 else _bilinear_sample
    x = sample(data, src_y, src_x, 0.0)
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
        outside = (seg[..., 0] if seg.ndim == 3 else seg) < 0
        for c, use in enumerate(cfg.use_mask_for_norm):
            if use:
                x = x.at[..., c].set(jnp.where(outside, 0.0, x[..., c]))
    seg = jnp.where(seg < 0, 0, seg)
    return x, seg


@partial(jax.jit, static_argnums=(3,))
def augment_batch_2d(key, data: jnp.ndarray, seg: jnp.ndarray,
                     cfg: AugmentConfig):
    """data (B, H_in, W_in, C) float32, seg (B, H_in, W_in) or
    (B, H_in, W_in, S) int32 -> same ranks at cfg.patch_size."""
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


# --------------------------------------------------------------------------- 3-D


def get_enlarged_patch_size_3d(final_patch_size, rot_rad_per_axis,
                               scale_range=(0.85, 1.25)) -> np.ndarray:
    """3-D analogue of get_enlarged_patch_size: per rotation axis, the two
    in-plane dims grow by the rotated-corner bound
    (ref: compute_initial_patch_size.py:4-24, 3-D case)."""
    rots = [min(90 / 360 * 2 * np.pi, abs(r)) for r in (
        rot_rad_per_axis if isinstance(rot_rad_per_axis, (tuple, list))
        else (rot_rad_per_axis,) * 3)]
    coords = np.array(final_patch_size[-3:], dtype=float)
    final_shape = coords.copy()
    # rotation about axis k mixes the other two axes
    for k, rot in enumerate(rots[:3]):
        i, j = [a for a in range(3) if a != k]
        ci, cj = coords[i], coords[j]
        ri = abs(ci * np.cos(rot) + cj * np.sin(rot))
        rj = abs(ci * np.sin(rot) + cj * np.cos(rot))
        final_shape[i] = max(final_shape[i], ri)
        final_shape[j] = max(final_shape[j], rj)
    final_shape /= min(scale_range)
    return final_shape.astype(int)


def _rotation_matrix_3d(angles):
    """R = Rx(ax) @ Ry(ay) @ Rz(az) (batchgenerators order)."""
    ax, ay, az = angles
    cx, sx = jnp.cos(ax), jnp.sin(ax)
    cy, sy = jnp.cos(ay), jnp.sin(ay)
    cz, sz = jnp.cos(az), jnp.sin(az)
    rx = jnp.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    ry = jnp.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    rz = jnp.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return rx @ ry @ rz


def _affine_coords_3d(key, in_shape, out_shape, cfg: "AugmentConfig3D"):
    k_prot, k_rot, k_pscale, k_scale = jax.random.split(key, 4)
    do_rot = jax.random.uniform(k_prot) < cfg.p_rotation
    lo = jnp.asarray([r[0] for r in cfg.rotation_ranges], jnp.float32)
    hi = jnp.asarray([r[1] for r in cfg.rotation_ranges], jnp.float32)
    angles = jnp.where(
        do_rot, jax.random.uniform(k_rot, (3,)) * (hi - lo) + lo, jnp.zeros(3))
    do_scale = jax.random.uniform(k_pscale) < cfg.p_scale
    scale = jnp.where(
        do_scale, jax.random.uniform(k_scale, minval=cfg.scale_range[0],
                                     maxval=cfg.scale_range[1]), 1.0)
    # dummy-2d (anisotropic) mode: the spatial transform is per-slice — the
    # through-plane axis must be neither rotated (rotation_ranges[1:]=(0,0))
    # nor scaled (ref transforms_for_dummy_2d.py:6 + nnUNetTrainer.py:404-414)
    scale_vec = (jnp.asarray([1.0, 1.0, 1.0]) * scale if not cfg.scale_in_plane_only
                 else jnp.asarray([1.0, 0.0, 0.0]) + scale * jnp.asarray([0.0, 1.0, 1.0]))
    R = _rotation_matrix_3d(angles)
    centers_in = jnp.asarray([(s - 1) / 2.0 for s in in_shape], jnp.float32)
    centers_out = jnp.asarray([(s - 1) / 2.0 for s in out_shape], jnp.float32)
    grids = jnp.meshgrid(*[jnp.arange(s, dtype=jnp.float32) for s in out_shape],
                         indexing="ij")
    coords = jnp.stack([g - c for g, c in zip(grids, centers_out)], axis=-1)
    src = coords @ R.T * scale_vec + centers_in  # (*out_shape, 3)
    return src[..., 0], src[..., 1], src[..., 2]


def _trilinear_sample(vol: jnp.ndarray, sz, sy, sx, cval: float = 0.0):
    """vol (D, H, W, C); src coords (*out) -> (*out, C)."""
    D, H, W, _ = vol.shape
    z0, y0, x0 = jnp.floor(sz), jnp.floor(sy), jnp.floor(sx)
    fz, fy, fx = sz - z0, sy - y0, sx - x0
    z0, y0, x0 = z0.astype(jnp.int32), y0.astype(jnp.int32), x0.astype(jnp.int32)
    out = 0.0
    for dz in (0, 1):
        wz = (1 - fz) if dz == 0 else fz
        for dy in (0, 1):
            wy = (1 - fy) if dy == 0 else fy
            for dx in (0, 1):
                wx = (1 - fx) if dx == 0 else fx
                zz, yy, xx = z0 + dz, y0 + dy, x0 + dx
                valid = ((zz >= 0) & (zz < D) & (yy >= 0) & (yy < H)
                         & (xx >= 0) & (xx < W))
                v = vol[jnp.clip(zz, 0, D - 1), jnp.clip(yy, 0, H - 1),
                        jnp.clip(xx, 0, W - 1)]
                v = jnp.where(valid[..., None], v, cval)
                out = out + v * (wz * wy * wx)[..., None]
    return out


def _nearest_sample_3d(vol: jnp.ndarray, sz, sy, sx, cval):
    """vol (D, H, W) or (D, H, W, S) int; nearest with constant fill."""
    D, H, W = vol.shape[:3]
    zz = jnp.round(sz).astype(jnp.int32)
    yy = jnp.round(sy).astype(jnp.int32)
    xx = jnp.round(sx).astype(jnp.int32)
    valid = (zz >= 0) & (zz < D) & (yy >= 0) & (yy < H) & (xx >= 0) & (xx < W)
    v = vol[jnp.clip(zz, 0, D - 1), jnp.clip(yy, 0, H - 1), jnp.clip(xx, 0, W - 1)]
    if vol.ndim == 4:
        valid = valid[..., None]
    return jnp.where(valid, v, cval)


@dataclasses.dataclass(frozen=True)
class AugmentConfig3D:
    """3-D spatial+intensity augmentation config (ref nnUNetTrainer.py:391-446:
    ±30 deg per axis for near-isotropic patches, in-plane only for dummy-2d)."""
    patch_size: Tuple[int, int, int] = (64, 128, 128)
    rotation_ranges: Tuple[Tuple[float, float], ...] = (
        (-0.5236, 0.5236),) * 3  # 30 deg
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
    p_gamma_invert: float = 0.1
    p_gamma: float = 0.3
    gamma_range: Tuple[float, float] = (0.7, 1.5)
    mirror_axes: Tuple[int, ...] = (0, 1, 2)
    use_mask_for_norm: Tuple[bool, ...] = ()
    scale_in_plane_only: bool = False  # dummy-2d: never scale through-plane


def _blur_volume(vol3d: jnp.ndarray, sigma, enabled):
    """Separable Gaussian blur of one (D, H, W) channel over all three axes."""
    k = _gaussian_kernel(sigma)
    r = (k.shape[0] - 1) // 2

    def conv_last(v):  # convolve along the last axis
        pad = [(0, 0)] * (v.ndim - 1) + [(r, r)]
        vp = jnp.pad(v, pad, mode="edge")
        flat = vp.reshape(-1, vp.shape[-1])
        out = jax.vmap(lambda row: jnp.convolve(row, k, mode="valid"))(flat)
        return out.reshape(*v.shape[:-1], v.shape[-1])

    out = conv_last(vol3d)                      # W axis
    out = conv_last(out.transpose(0, 2, 1)).transpose(0, 2, 1)  # H axis
    out = conv_last(out.transpose(1, 2, 0)).transpose(2, 0, 1)  # D axis
    return jnp.where(enabled, out, vol3d)


def _augment_one_3d(key, data: jnp.ndarray, seg: jnp.ndarray, cfg: AugmentConfig3D):
    """data (D_in, H_in, W_in, C) float32; seg (D_in, H_in, W_in) int32."""
    keys = jax.random.split(key, 16)
    out_shape = cfg.patch_size
    C = data.shape[-1]

    sz, sy, sx = _affine_coords_3d(keys[0], data.shape[:3], out_shape, cfg)
    x = _trilinear_sample(data, sz, sy, sx, 0.0)
    seg = _nearest_sample_3d(seg, sz, sy, sx, -1)

    std = jax.random.uniform(keys[1], minval=cfg.noise_variance[0],
                             maxval=cfg.noise_variance[1])
    noise = jax.random.normal(keys[2], x.shape) * std
    x = jnp.where(jax.random.uniform(keys[3]) < cfg.p_noise, x + noise, x)

    do_blur = jax.random.uniform(keys[4]) < cfg.p_blur
    ch_on = jax.random.uniform(keys[5], (C,)) < cfg.p_blur_per_channel
    sigmas = jax.random.uniform(keys[6], (C,), minval=cfg.blur_sigma[0],
                                maxval=cfg.blur_sigma[1])
    x = jax.vmap(lambda v, s, on: _blur_volume(v, s, do_blur & on),
                 in_axes=(3, 0, 0), out_axes=3)(x, sigmas, ch_on)

    mult = jax.random.uniform(keys[7], (C,), minval=cfg.brightness_range[0],
                              maxval=cfg.brightness_range[1])
    x = jnp.where(jax.random.uniform(keys[8]) < cfg.p_brightness, x * mult, x)

    f = jax.random.uniform(keys[9], (C,), minval=cfg.contrast_range[0],
                           maxval=cfg.contrast_range[1])
    mean = x.mean(axis=(0, 1, 2), keepdims=True)
    mn = x.min(axis=(0, 1, 2), keepdims=True)
    mx = x.max(axis=(0, 1, 2), keepdims=True)
    contrasted = jnp.clip((x - mean) * f + mean, mn, mx)
    x = jnp.where(jax.random.uniform(keys[10]) < cfg.p_contrast, contrasted, x)

    x = _gamma_channel(x, keys[11], cfg.p_gamma_invert, True, cfg.gamma_range)
    x = _gamma_channel(x, keys[12], cfg.p_gamma, False, cfg.gamma_range)

    for axis, kf in zip((0, 1, 2), (keys[13], keys[14], keys[15])):
        if axis in cfg.mirror_axes:
            flip = jax.random.uniform(kf) < 0.5
            x = jnp.where(flip, jnp.flip(x, axis), x)
            seg = jnp.where(flip, jnp.flip(seg, axis), seg)

    if any(cfg.use_mask_for_norm):
        outside = (seg[..., 0] if seg.ndim == 4 else seg) < 0
        for c, use in enumerate(cfg.use_mask_for_norm):
            if use:
                x = x.at[..., c].set(jnp.where(outside, 0.0, x[..., c]))
    seg = jnp.where(seg < 0, 0, seg)
    return x, seg


@partial(jax.jit, static_argnums=(3,))
def augment_batch_3d(key, data: jnp.ndarray, seg: jnp.ndarray, cfg: AugmentConfig3D):
    """data (B, D, H, W, C) float32, seg (B, D, H, W) or (B, D, H, W, S) int32
    -> final patch."""
    keys = jax.random.split(key, data.shape[0])
    return jax.vmap(lambda k, d, s: _augment_one_3d(k, d, s, cfg))(keys, data, seg)


# ----------------------------------------------------------------- cascade


def _dilate_in_mask(x, mask, nd: int):
    """One 4-connectivity (cross) growth step of x restricted to mask.

    Per-axis (1,3) max-pool with a mask-clamp after each axis: diagonal
    neighbours are only reached through an in-mask intermediate, which is
    exactly 4-(/6-)connectivity — matching scipy.ndimage.label's default
    structuring element (the reference's component labelling,
    acvl_utils label_with_component_sizes)."""
    for ax in range(nd):
        win = [1] * nd
        win[ax] = 3
        pad = [(0, 0)] * nd
        pad[ax] = (1, 1)
        grown = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, tuple(win), (1,) * nd, pad)
        x = jnp.minimum(jnp.maximum(x, grown), mask)
    return x


def component_of_seed(mask, seed, max_iters: int = 512):
    """Flood-fill the connected component of `mask` (float 0/1) containing
    `seed` (float 0/1 one-hot map), 4-connectivity, as a lax.while_loop to
    fixpoint. Returns the component as a float 0/1 map."""
    nd = mask.ndim

    def cond(state):
        _, it, changed = state
        return changed & (it < max_iters)

    def body(state):
        cur, it, _ = state
        new = _dilate_in_mask(cur, mask, nd)
        return new, it + 1, jnp.any(new > cur)

    comp, _, _ = jax.lax.while_loop(
        cond, body, (jnp.minimum(seed, mask), jnp.int32(0), jnp.bool_(True)))
    return comp


def remove_random_component(key, onehot: jnp.ndarray,
                            p_per_sample: float = 0.2,
                            fill_with_other_class_p: float = 0.0,
                            max_covered_frac: float = 0.15,
                            max_iters: int = 512):
    """RemoveRandomConnectedComponentFromOneHotEncodingTransform, on device.

    ref: cascade_transforms.py:99-125, wired at nnUNetTrainer.py:754-759
    (p_per_sample 0.2, fill_with_other_class_p 0, max covered 0.15): with
    p_per_sample, every one-hot channel has one connected component removed
    if it covers < max_covered_frac of the patch; optionally the removed
    region is marked in a random other channel.

    The component is found by uniform-random foreground seed + flood fill
    (component_of_seed). Deviation from the reference: the removed component
    is chosen size-weighted (uniform over foreground pixels) instead of
    uniform over component ids, and an oversized pick is a no-op rather than
    re-drawn — the labelling itself is exact.

    onehot: (*spatial, F) float 0/1. Returns same shape/dtype.
    """
    F = onehot.shape[-1]
    spatial = onehot.shape[:-1]
    n_vox = float(np.prod(spatial))
    k_sample, k_ch = jax.random.split(key)
    apply_sample = jax.random.uniform(k_sample) < p_per_sample

    chans = [onehot[..., c] for c in range(F)]
    comps = []
    for c in range(F):
        k_seed, k_fill, k_other = jax.random.split(
            jax.random.fold_in(k_ch, c), 3)
        ch = chans[c]
        mask = (ch > 0.5).astype(jnp.float32)
        has_fg = jnp.any(mask > 0)
        # uniform random foreground pixel via random-score argmax
        scores = jnp.where(mask > 0, jax.random.uniform(k_seed, spatial), -1.0)
        flat = jnp.argmax(scores.reshape(-1))
        seed = jnp.zeros((int(np.prod(spatial)),), jnp.float32
                         ).at[flat].set(1.0).reshape(spatial)
        comp = component_of_seed(mask, seed, max_iters)
        size = comp.sum()
        do_remove = apply_sample & has_fg & (size < max_covered_frac * n_vox)
        comp = jnp.where(do_remove, comp, jnp.zeros_like(comp))
        comps.append(comp)
        chans[c] = ch * (1.0 - comp)
        if F > 1 and fill_with_other_class_p > 0:
            do_fill = do_remove & (jax.random.uniform(k_fill)
                                   < fill_with_other_class_p)
            other = jax.random.randint(k_other, (), 0, F - 1)
            other = jnp.where(other >= c, other + 1, other)
            for o in range(F):
                if o == c:
                    continue
                sel = do_fill & (other == o)
                chans[o] = jnp.where(sel, jnp.maximum(chans[o], comp), chans[o])
    return jnp.stack(chans, axis=-1)


def cascade_onehot_augment(key, prev_labelmap: jnp.ndarray,
                           foreground_labels: Tuple[int, ...],
                           p_binary_op: float = 0.4,
                           strel_radii: Tuple[int, ...] = (1, 2, 3),
                           p_remove_component: float = 0.2):
    """Previous-stage seg -> augmented one-hot data channels (cascade training).

    ref: MoveSegAsOneHotToData + ApplyRandomBinaryOperator +
    RemoveRandomConnectedComponentFromOneHotEncoding
    (training/data_augmentation/custom_transforms/cascade_transforms.py:10-125,
    wired at nnUNetTrainer.py:743-759): each one-hot channel independently gets
    a random morphological op with p=0.4, then with p=0.2 one connected
    component per channel is removed (remove_random_component — exact
    flood-fill labelling on device). Dilation/erosion run as max/min pools
    (reduce_window) with a random square structure element; opening/closing are
    their compositions.

    prev_labelmap: (..., spatial) int; returns float one-hot (..., spatial, F).
    """
    onehot = jnp.stack(
        [(prev_labelmap == l).astype(jnp.float32) for l in foreground_labels],
        axis=-1)
    nd = prev_labelmap.ndim  # spatial rank (per-sample call) or with batch dim
    F = len(foreground_labels)
    keys = jax.random.split(key, 3 * F)
    keys = keys.reshape(F, 3, *keys.shape[1:])  # raw (2,)-uint32 or typed keys

    def _pool(x, radius_choice, is_max):
        outs = [x]
        for r in strel_radii:
            w = 2 * r + 1
            win = (w,) * nd
            pad = [(r, r)] * nd
            if is_max:
                o = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, win,
                                          (1,) * nd, pad)
            else:
                o = jax.lax.reduce_window(x, jnp.inf, jax.lax.min, win,
                                          (1,) * nd, pad)
            outs.append(o)
        stacked = jnp.stack(outs)  # (len+1, ...)
        return stacked[radius_choice]

    out = []
    for f in range(F):
        ch = onehot[..., f]
        k_p, k_op, k_r = keys[f, 0], keys[f, 1], keys[f, 2]
        apply = jax.random.uniform(k_p) < p_binary_op
        r_idx = jax.random.randint(k_r, (), 1, len(strel_radii) + 1)
        dil = _pool(ch, r_idx, True)
        ero = _pool(ch, r_idx, False)
        opened = _pool(_pool(ch, r_idx, False), r_idx, True)
        closed = _pool(_pool(ch, r_idx, True), r_idx, False)
        op_idx = jax.random.randint(k_op, (), 0, 4)
        morphed = jnp.stack([dil, ero, opened, closed])[op_idx]
        out.append(jnp.where(apply, morphed, ch))
    out = jnp.stack(out, axis=-1)
    if p_remove_component > 0:
        out = remove_random_component(
            jax.random.fold_in(key, 0x5eed), out,
            p_per_sample=p_remove_component)
    return out
