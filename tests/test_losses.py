"""Loss-function unit tests (ref training/loss/*: masking, batch-dice, DS)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dinounet_tpu.training.losses import (
    dc_and_bce_loss,
    dc_and_ce_loss,
    deep_supervision_weights,
    robust_cross_entropy,
    soft_dice_loss,
    topk_cross_entropy,
)


@pytest.fixture()
def data(rng):
    logits = jnp.asarray(rng.standard_normal((2, 8, 8, 3)), jnp.float32)
    seg = jnp.asarray(rng.integers(0, 3, (2, 8, 8)), jnp.int32)
    return logits, seg


class TestIgnoreLabel:
    def test_ignored_voxels_do_not_change_loss(self, rng):
        """Flipping labels only inside the ignore region leaves the loss
        untouched (ref compound_losses.py ignore masking)."""
        logits = jnp.asarray(rng.standard_normal((2, 8, 8, 3)), jnp.float32)
        seg = np.asarray(rng.integers(0, 2, (2, 8, 8)), np.int32)
        ignore = 2
        seg[:, :4] = ignore  # top half ignored
        seg2 = seg.copy()
        seg2[:, 2:4] = 1 - seg2[:, 2:4] % 2  # perturb ONLY ignored voxels... still ignore
        seg2[:, :4] = ignore
        l1 = float(dc_and_ce_loss(logits, jnp.asarray(seg), ignore_label=ignore))
        l2 = float(dc_and_ce_loss(logits, jnp.asarray(seg2), ignore_label=ignore))
        assert l1 == pytest.approx(l2)

    def test_changing_logits_in_ignored_region_is_free(self, rng):
        logits = np.asarray(rng.standard_normal((1, 8, 8, 2)), np.float32)
        seg = np.asarray(rng.integers(0, 2, (1, 8, 8)), np.int32)
        seg[0, :4] = 2  # ignore
        logits2 = logits.copy()
        logits2[0, :4] += 100.0  # wild logits where ignored
        l1 = float(dc_and_ce_loss(jnp.asarray(logits), jnp.asarray(seg), ignore_label=2))
        l2 = float(dc_and_ce_loss(jnp.asarray(logits2), jnp.asarray(seg), ignore_label=2))
        assert l1 == pytest.approx(l2, rel=1e-5)

    def test_gradient_zero_in_ignored_region(self, rng):
        logits = jnp.asarray(rng.standard_normal((1, 8, 8, 2)), jnp.float32)
        seg = np.asarray(rng.integers(0, 2, (1, 8, 8)), np.int32)
        seg[0, :4] = 2
        g = jax.grad(lambda lg: dc_and_ce_loss(lg, jnp.asarray(seg), ignore_label=2))(logits)
        np.testing.assert_allclose(np.asarray(g)[0, :4], 0.0, atol=1e-7)


class TestDiceProperties:
    def test_perfect_prediction_dice(self, data):
        _, seg = data
        probs = jax.nn.one_hot(seg, 3)
        dc = float(soft_dice_loss(probs, seg, do_bg=False, smooth=0.0))
        assert dc == pytest.approx(-1.0, abs=1e-5)

    def test_batch_dice_differs_from_sample_dice(self, rng):
        # a class present in one sample only: batch-dice pools counts
        probs = jnp.asarray(rng.uniform(0, 1, (2, 8, 8, 2)), jnp.float32)
        probs = probs / probs.sum(-1, keepdims=True)
        seg = np.zeros((2, 8, 8), np.int32)
        seg[0, :2, :2] = 1
        a = float(soft_dice_loss(probs, jnp.asarray(seg), batch_dice=False))
        b = float(soft_dice_loss(probs, jnp.asarray(seg), batch_dice=True))
        assert a != pytest.approx(b)

    def test_bce_region_loss_finite_and_masked(self, rng):
        logits = jnp.asarray(rng.standard_normal((2, 8, 8, 2)), jnp.float32)
        target = jnp.asarray(rng.integers(0, 2, (2, 8, 8, 3)), jnp.float32)
        # last channel is the ignore mask
        l = float(dc_and_bce_loss(logits, target, use_ignore_label=True))
        assert np.isfinite(l)


class TestCEVariants:
    def test_robust_ce_matches_manual(self, data):
        logits, seg = data
        ce = float(robust_cross_entropy(logits, seg))
        logp = jax.nn.log_softmax(logits, -1)
        manual = -float(jnp.take_along_axis(logp, seg[..., None], -1).mean())
        assert ce == pytest.approx(manual, rel=1e-6)

    def test_topk_keeps_worst_k_percent(self, data):
        logits, seg = data
        full = float(robust_cross_entropy(logits, seg))
        topk = float(topk_cross_entropy(logits, seg, k=10.0))
        assert topk >= full  # mean of the worst 10% >= overall mean


def test_deep_supervision_weights():
    w = deep_supervision_weights(4)
    assert w[0] == max(w)
    assert w[-1] == 0.0  # lowest resolution zeroed (ref _build_loss:376-386)
    assert sum(w) == pytest.approx(1.0)
