"""Segmentation losses (NHWC logits, integer or one-hot targets).

Capability parity with ref: dinounet/training/loss/{dice.py,robust_ce_loss.py,
compound_losses.py,deep_supervision.py}: memory-efficient soft Dice (smooth
1e-5, clipped denominator, batch-dice mode), robust CE with ignore label, TopK
CE, DC+CE / DC+BCE(regions) / DC+topk compounds, deep-supervision weighting.

TPU-native note: the reference's `AllGatherGrad` of tp/fp/fn for batch-dice
under DDP (ref dice.py:36-38,107-110; utilities/ddp_allgather.py:25) is
unnecessary here — under pjit/GSPMD the batch axis is logically global, so
batch-dice sums span all devices and XLA inserts the psum (differentiable by
construction).
"""

from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp


def one_hot_last(target: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """(B, ...) int -> (B, ..., C) float one-hot."""
    return jax.nn.one_hot(target, num_classes, dtype=jnp.float32)


def soft_dice_loss(probs: jnp.ndarray, target: jnp.ndarray, *,
                   batch_dice: bool = False, do_bg: bool = True,
                   smooth: float = 1.0, loss_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Memory-efficient soft Dice (ref dice.py:58-120). probs: (B, ..., C)
    post-nonlin; target: (B, ...) int labels or (B, ..., C) one-hot;
    loss_mask: (B, ..., 1) with 1 = valid."""
    num_classes = probs.shape[-1]
    if target.ndim == probs.ndim:
        y_onehot = target.astype(probs.dtype)
    else:
        y_onehot = one_hot_last(target, num_classes).astype(probs.dtype)
    y_onehot = jax.lax.stop_gradient(y_onehot)

    if not do_bg:
        probs = probs[..., 1:]
        y_onehot = y_onehot[..., 1:]

    axes = tuple(range(1, probs.ndim - 1))  # spatial axes
    if loss_mask is not None:
        intersect = (probs * y_onehot * loss_mask).sum(axes)
        sum_pred = (probs * loss_mask).sum(axes)
        sum_gt = (y_onehot * loss_mask).sum(axes)
    else:
        intersect = (probs * y_onehot).sum(axes)
        sum_pred = probs.sum(axes)
        sum_gt = y_onehot.sum(axes)

    if batch_dice:
        intersect = intersect.sum(0)
        sum_pred = sum_pred.sum(0)
        sum_gt = sum_gt.sum(0)

    dc = (2 * intersect + smooth) / jnp.clip(sum_gt + sum_pred + smooth, 1e-8)
    return -dc.mean()


def _nll_at_labels(logp: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """-logp[..., target] via a one-hot contraction: XLA lowers
    take_along_axis over the minor class axis to a scalar gather that costs
    more than the whole loss (7.2 ms/step measured on dinounet_b); the
    one-hot multiply-sum is a fused elementwise pass over C values/voxel."""
    C = logp.shape[-1]
    onehot = jax.nn.one_hot(target.astype(jnp.int32), C, dtype=logp.dtype)
    return -(logp * onehot).sum(-1)


def robust_cross_entropy(logits: jnp.ndarray, target: jnp.ndarray,
                         loss_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Softmax CE over the last axis; target int labels (ref robust_ce_loss.py:6)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = _nll_at_labels(logp, target)
    if loss_mask is not None:
        m = loss_mask[..., 0] if loss_mask.ndim == nll.ndim + 1 else loss_mask
        return (nll * m).sum() / jnp.clip(m.sum(), 1e-8)
    return nll.mean()


def topk_cross_entropy(logits: jnp.ndarray, target: jnp.ndarray, k: float = 10.0) -> jnp.ndarray:
    """Mean over the top-k% highest per-voxel CE values (ref robust_ce_loss.py:19)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = _nll_at_labels(logp, target)
    flat = nll.reshape(-1)
    n_keep = max(1, int(flat.shape[0] * k / 100))
    topk_vals, _ = jax.lax.top_k(flat, n_keep)
    return topk_vals.mean()


def dc_and_ce_loss(logits: jnp.ndarray, target: jnp.ndarray, *,
                   weight_ce: float = 1.0, weight_dice: float = 1.0,
                   batch_dice: bool = False, smooth: float = 1e-5,
                   do_bg: bool = False, ignore_label: Optional[int] = None) -> jnp.ndarray:
    """ref compound_losses.py:8-56. logits: (B, ..., C); target: (B, ...) int."""
    if ignore_label is not None:
        mask = (target != ignore_label)
        target_dice = jnp.where(mask, target, 0)
        loss_mask = mask[..., None].astype(logits.dtype)
        num_fg = mask.sum()
    else:
        target_dice = target
        loss_mask = None
        num_fg = None

    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    dc = soft_dice_loss(
        probs, target_dice, batch_dice=batch_dice, do_bg=do_bg, smooth=smooth,
        loss_mask=loss_mask,
    ) if weight_dice != 0 else 0.0
    ce = robust_cross_entropy(logits, target_dice, loss_mask) if weight_ce != 0 else 0.0
    if ignore_label is not None and weight_ce != 0:
        ce = jnp.where(num_fg > 0, ce, 0.0)
    return weight_ce * ce + weight_dice * dc


def dc_and_bce_loss(logits: jnp.ndarray, target_onehot: jnp.ndarray, *,
                    weight_ce: float = 1.0, weight_dice: float = 1.0,
                    batch_dice: bool = True, smooth: float = 1e-5,
                    use_ignore_label: bool = False) -> jnp.ndarray:
    """Region-based training: sigmoid + BCE, one-hot region targets
    (ref compound_losses.py:59-100). With use_ignore_label, the LAST channel of
    target_onehot marks ignored voxels."""
    if use_ignore_label:
        mask = (1.0 - target_onehot[..., -1:])
        target_regions = target_onehot[..., :-1]
    else:
        mask = None
        target_regions = target_onehot
    target_regions = jax.lax.stop_gradient(target_regions.astype(jnp.float32))

    logits = logits.astype(jnp.float32)
    probs = jax.nn.sigmoid(logits)
    dc = soft_dice_loss(
        probs, target_regions, batch_dice=batch_dice, do_bg=True, smooth=smooth,
        loss_mask=mask,
    )
    bce = jnp.maximum(logits, 0) - logits * target_regions + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    if mask is not None:
        ce = (bce * mask).sum() / jnp.clip(mask.sum(), 1e-8)
    else:
        ce = bce.mean()
    return weight_ce * ce + weight_dice * dc


def dc_and_topk_loss(logits: jnp.ndarray, target: jnp.ndarray, *, k: float = 10.0,
                     weight_ce: float = 1.0, weight_dice: float = 1.0,
                     batch_dice: bool = False, smooth: float = 1e-5,
                     do_bg: bool = False) -> jnp.ndarray:
    """ref compound_losses.py:102-150 (no-ignore-label path)."""
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    dc = soft_dice_loss(probs, target, batch_dice=batch_dice, do_bg=do_bg, smooth=smooth)
    ce = topk_cross_entropy(logits, target, k)
    return weight_ce * ce + weight_dice * dc


def deep_supervision_weights(num_outputs: int, ddp: bool = False) -> List[float]:
    """1/2^i, lowest set to 0 (1e-6 under data-parallel), normalized to sum 1.

    ref nnUNetTrainer._build_loss:355-389.
    """
    weights = [1 / (2 ** i) for i in range(num_outputs)]
    weights[-1] = 1e-6 if ddp else 0.0
    s = sum(weights)
    return [w / s for w in weights]


def deep_supervision_loss(loss_fn, outputs: Sequence[jnp.ndarray],
                          targets: Sequence[jnp.ndarray],
                          weights: Sequence[float]) -> jnp.ndarray:
    """ref deep_supervision.py:5."""
    total = 0.0
    for w, o, t in zip(weights, outputs, targets):
        if w != 0:
            total = total + w * loss_fn(o, t)
    return total


def get_tp_fp_fn_tn(probs: jnp.ndarray, target: jnp.ndarray, axes=None,
                    mask: Optional[jnp.ndarray] = None):
    """Per-class tp/fp/fn/tn sums (ref dice.py:122-181); used for pseudo-Dice."""
    num_classes = probs.shape[-1]
    if target.ndim == probs.ndim:
        y_onehot = target.astype(probs.dtype)
    else:
        y_onehot = one_hot_last(target, num_classes).astype(probs.dtype)
    if axes is None:
        axes = tuple(range(1, probs.ndim - 1))
    tp = probs * y_onehot
    fp = probs * (1 - y_onehot)
    fn = (1 - probs) * y_onehot
    tn = (1 - probs) * (1 - y_onehot)
    if mask is not None:
        tp, fp, fn, tn = (t * mask for t in (tp, fp, fn, tn))
    if len(axes):
        tp, fp, fn, tn = (t.sum(axes) for t in (tp, fp, fn, tn))
    return tp, fp, fn, tn
