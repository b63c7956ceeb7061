"""Oracle tests for HD95/ASD (and the supporting metric plumbing).

The reference gets HD95/ASD from medpy
(ref dinounet/evaluation/evaluate_predictions.py:85-150):

  hd95(pred, ref) = percentile(hstack(S(pred,ref), S(ref,pred)), 95)   # symmetric
  asd(pred, ref)  = S(pred,ref).mean()                                 # directed

where S(a, b) = distances from a's border voxels to b's border voxels, with
borders extracted as ``mask ^ binary_erosion(mask, connectivity-1 footprint)``
(zero border_value, so voxels on the array edge count as border) and distances
measured on the EDT of b's border complement under the voxel spacing.

dinounet_tpu reimplements this on scipy (evaluation/metrics.py:88-120).  These
tests pin it two ways:

1. Hand-analytic geometry (single voxels, identical masks, concentric /
   translated boxes, anisotropic spacing, 2-D and 3-D) with literal expected
   values derived in the comments.
2. An independent brute-force oracle in this file: border sets via explicit
   neighbor checks, distances via exact pairwise minimisation — no scipy EDT,
   no shared code with the implementation.
"""

import itertools

import numpy as np
import pytest

from dinounet_tpu.evaluation.metrics import (
    compute_surface_distances,
    compute_tp_fp_fn_tn,
)


# ---------------------------------------------------------------------------
# Brute-force oracle (independent of the implementation under test)
# ---------------------------------------------------------------------------

def _border_voxels(mask: np.ndarray):
    """Connectivity-1 border with medpy/scipy zero-padding semantics: a mask
    voxel is border if any face neighbor is outside the mask OR outside the
    array (binary_erosion border_value=0 erodes the array edge)."""
    coords = []
    for idx in zip(*np.nonzero(mask)):
        is_border = False
        for axis in range(mask.ndim):
            for d in (-1, 1):
                nb = list(idx)
                nb[axis] += d
                if nb[axis] < 0 or nb[axis] >= mask.shape[axis]:
                    is_border = True
                    break
                if not mask[tuple(nb)]:
                    is_border = True
                    break
            if is_border:
                break
        if is_border:
            coords.append(idx)
    return np.array(coords, dtype=np.float64)


def _directed_distances(mask_a: np.ndarray, mask_b: np.ndarray, spacing):
    """Exact min distances from each border voxel of a to b's border set."""
    ba = _border_voxels(mask_a) * np.asarray(spacing, dtype=np.float64)
    bb = _border_voxels(mask_b) * np.asarray(spacing, dtype=np.float64)
    diffs = ba[:, None, :] - bb[None, :, :]
    return np.sqrt((diffs ** 2).sum(-1)).min(axis=1)


def _oracle(mask_ref, mask_pred, spacing):
    s_pr = _directed_distances(mask_pred, mask_ref, spacing)
    s_rp = _directed_distances(mask_ref, mask_pred, spacing)
    return {
        "HD95": float(np.percentile(np.hstack((s_pr, s_rp)), 95)),
        "ASD": float(s_pr.mean()),
    }


def _box(shape, lo, hi):
    m = np.zeros(shape, dtype=bool)
    m[tuple(slice(a, b) for a, b in zip(lo, hi))] = True
    return m


# ---------------------------------------------------------------------------
# Hand-analytic cases
# ---------------------------------------------------------------------------

class TestHandAnalytic:
    def test_identical_masks_are_zero(self):
        m = _box((16, 16), (4, 4), (10, 12))
        out = compute_surface_distances(m, m, (1.0, 1.0))
        assert out["HD95"] == 0.0
        assert out["ASD"] == 0.0

    def test_single_voxels_isotropic(self):
        # Single voxels are their own border (erosion empties them).  The only
        # distance in each direction is the Euclidean separation:
        # ref at (2, 3), pred at (5, 7) -> sqrt(3^2 + 4^2) = 5 exactly.
        ref = np.zeros((12, 12), dtype=bool)
        pred = np.zeros((12, 12), dtype=bool)
        ref[2, 3] = True
        pred[5, 7] = True
        out = compute_surface_distances(ref, pred, (1.0, 1.0))
        assert out["HD95"] == pytest.approx(5.0, abs=1e-6)
        assert out["ASD"] == pytest.approx(5.0, abs=1e-6)

    def test_single_voxels_anisotropic(self):
        # spacing (3.0, 1.0): ref (1, 1), pred (3, 5) -> axis deltas (2, 4)
        # -> physical sqrt((2*3)^2 + (4*1)^2) = sqrt(52).
        ref = np.zeros((8, 8), dtype=bool)
        pred = np.zeros((8, 8), dtype=bool)
        ref[1, 1] = True
        pred[3, 5] = True
        expect = np.sqrt(52.0)
        out = compute_surface_distances(ref, pred, (3.0, 1.0))
        assert out["HD95"] == pytest.approx(expect, rel=1e-6)
        assert out["ASD"] == pytest.approx(expect, rel=1e-6)

    def test_single_voxels_anisotropic_3d(self):
        # spacing (5.0, 2.0, 1.0), deltas (1, 2, 2):
        # sqrt(25 + 16 + 4) = sqrt(45).
        ref = np.zeros((6, 8, 8), dtype=bool)
        pred = np.zeros((6, 8, 8), dtype=bool)
        ref[1, 2, 3] = True
        pred[2, 4, 5] = True
        expect = np.sqrt(45.0)
        out = compute_surface_distances(ref, pred, (5.0, 2.0, 1.0))
        assert out["HD95"] == pytest.approx(expect, rel=1e-6)
        assert out["ASD"] == pytest.approx(expect, rel=1e-6)

    def test_translated_row_pair_exact(self):
        # Two parallel single-voxel-thick rows: every voxel of each border is
        # exactly `gap` from the other (vertical neighbor), so ALL distances
        # equal gap*spacing0 and HD95 = ASD = that value with no percentile
        # interpolation ambiguity.  rows at i=2 and i=6, spacing0=1.5 ->
        # distance 4 * 1.5 = 6.0.
        ref = np.zeros((10, 10), dtype=bool)
        pred = np.zeros((10, 10), dtype=bool)
        ref[2, 2:8] = True
        pred[6, 2:8] = True
        out = compute_surface_distances(ref, pred, (1.5, 1.0))
        assert out["HD95"] == pytest.approx(6.0, abs=1e-6)
        assert out["ASD"] == pytest.approx(6.0, abs=1e-6)

    def test_asd_is_directed_pred_to_ref(self):
        # Asymmetric geometry: pred is a single voxel ON ref's border, ref is
        # a 5x5 box.  Every pred-border voxel (the one voxel) is at distance 0
        # from ref's border -> ASD (pred->ref) = 0 exactly, even though
        # ref->pred distances are mostly nonzero (so a symmetric ASD would be
        # > 0, and HD95 is > 0).
        ref = _box((12, 12), (3, 3), (8, 8))
        pred = np.zeros((12, 12), dtype=bool)
        pred[3, 3] = True  # a corner of ref's border
        out = compute_surface_distances(ref, pred, (1.0, 1.0))
        assert out["ASD"] == 0.0
        assert out["HD95"] > 0.0

    def test_hd95_is_percentile_not_max(self):
        # 100-voxel ref row at distance 1 except one far outlier in pred.
        # Symmetric stack = ref->pred (100 values) + pred->ref (101 values).
        # With a single large outlier the 95th percentile must sit at the
        # 1-distance plateau, far below the max.
        ref = np.zeros((40, 104), dtype=bool)
        pred = np.zeros((40, 104), dtype=bool)
        ref[10, 2:102] = True
        pred[11, 2:102] = True  # everything at distance 1
        pred[35, 50] = True     # outlier at distance 24
        out = compute_surface_distances(ref, pred, (1.0, 1.0))
        assert out["HD95"] == pytest.approx(1.0, abs=1e-6)

    @pytest.mark.parametrize("empty", ["ref", "pred", "both"])
    def test_empty_masks_nan(self, empty):
        m = _box((8, 8), (2, 2), (5, 5))
        z = np.zeros((8, 8), dtype=bool)
        ref = z if empty in ("ref", "both") else m
        pred = z if empty in ("pred", "both") else m
        out = compute_surface_distances(ref, pred, (1.0, 1.0))
        assert np.isnan(out["HD95"]) and np.isnan(out["ASD"])

    def test_full_mask_border_is_array_edge(self):
        # A full mask's border under zero-padded erosion is the array edge
        # shell.  ref full, pred = the same edge shell -> identical borders,
        # all distances 0.
        ref = np.ones((9, 9), dtype=bool)
        pred = np.ones((9, 9), dtype=bool)
        pred[1:-1, 1:-1] = False  # explicitly the edge shell
        out = compute_surface_distances(ref, pred, (1.0, 1.0))
        assert out["HD95"] == 0.0
        assert out["ASD"] == 0.0

    def test_spacing_length_adjustment(self):
        # ref :124-137: longer spacing keeps the trailing ndim entries;
        # shorter is right-padded with 1.0.
        ref = np.zeros((8, 8), dtype=bool)
        pred = np.zeros((8, 8), dtype=bool)
        ref[2, 2] = True
        pred[5, 2] = True  # axis-0 delta 3
        # 3-tuple spacing on a 2-D mask: keep (2.0, 1.0) -> distance 6.
        out = compute_surface_distances(ref, pred, (9.0, 2.0, 1.0))
        assert out["HD95"] == pytest.approx(6.0, abs=1e-6)
        # 1-tuple spacing: pad to (2.0, 1.0) -> same.
        out = compute_surface_distances(ref, pred, (2.0,))
        assert out["HD95"] == pytest.approx(6.0, abs=1e-6)


# ---------------------------------------------------------------------------
# Brute-force oracle sweep
# ---------------------------------------------------------------------------

class TestBruteForceOracle:
    @pytest.mark.parametrize("spacing", [(1.0, 1.0), (2.5, 0.7)])
    def test_translated_boxes_2d(self, spacing):
        ref = _box((20, 20), (4, 4), (12, 13))
        pred = _box((20, 20), (6, 7), (14, 16))
        got = compute_surface_distances(ref, pred, spacing)
        want = _oracle(ref, pred, spacing)
        assert got["HD95"] == pytest.approx(want["HD95"], rel=1e-6)
        assert got["ASD"] == pytest.approx(want["ASD"], rel=1e-6)

    @pytest.mark.parametrize("spacing", [(1.0, 1.0, 1.0), (4.0, 1.0, 1.0)])
    def test_nested_boxes_3d_anisotropic(self, spacing):
        ref = _box((12, 14, 14), (2, 2, 2), (10, 12, 12))
        pred = _box((12, 14, 14), (4, 5, 5), (8, 9, 10))
        got = compute_surface_distances(ref, pred, spacing)
        want = _oracle(ref, pred, spacing)
        assert got["HD95"] == pytest.approx(want["HD95"], rel=1e-6)
        assert got["ASD"] == pytest.approx(want["ASD"], rel=1e-6)

    def test_touching_borders(self):
        # Abutting boxes sharing a face: the shared-face borders are 1 voxel
        # apart, not 0 (borders are voxel sets, not geometric faces).
        ref = _box((16, 16), (4, 2), (8, 10))
        pred = _box((16, 16), (8, 2), (12, 10))
        got = compute_surface_distances(ref, pred, (1.0, 1.0))
        want = _oracle(ref, pred, (1.0, 1.0))
        assert got["HD95"] == pytest.approx(want["HD95"], rel=1e-6)
        assert got["ASD"] == pytest.approx(want["ASD"], rel=1e-6)
        assert want["ASD"] >= 1.0  # sanity on the oracle itself

    def test_randomized_blobs(self):
        rng = np.random.RandomState(0)
        for trial in range(4):
            ndim = 2 if trial % 2 == 0 else 3
            shape = (14,) * ndim
            ref = np.zeros(shape, dtype=bool)
            pred = np.zeros(shape, dtype=bool)
            # a few random boxes each, guaranteed non-empty
            for m in (ref, pred):
                for _ in range(2):
                    lo = rng.randint(0, 8, size=ndim)
                    hi = lo + rng.randint(2, 6, size=ndim)
                    hi = np.minimum(hi, shape)
                    m[tuple(slice(a, b) for a, b in zip(lo, hi))] = True
            spacing = tuple(float(s) for s in rng.uniform(0.5, 3.0, size=ndim))
            got = compute_surface_distances(ref, pred, spacing)
            want = _oracle(ref, pred, spacing)
            assert got["HD95"] == pytest.approx(want["HD95"], rel=1e-6), trial
            assert got["ASD"] == pytest.approx(want["ASD"], rel=1e-6), trial


# ---------------------------------------------------------------------------
# Counting-metric plumbing (exact integers; ignore-mask contract of ref :85-95)
# ---------------------------------------------------------------------------

class TestTpFpFnTn:
    def test_exact_counts_with_ignore(self):
        ref = np.array([[1, 1, 0, 0],
                        [1, 0, 0, 0]], dtype=bool)
        pred = np.array([[1, 0, 1, 0],
                         [1, 1, 0, 0]], dtype=bool)
        ignore = np.zeros_like(ref)
        ignore[0, 0] = True  # drop one TP from every count
        tp, fp, fn, tn = compute_tp_fp_fn_tn(ref, pred, None)
        assert (tp, fp, fn, tn) == (2, 2, 1, 3)
        tp, fp, fn, tn = compute_tp_fp_fn_tn(ref, pred, ignore)
        assert (tp, fp, fn, tn) == (1, 2, 1, 3)
