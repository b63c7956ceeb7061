"""Sliding-window assembly tests (SURVEY.md §4c): the batched tile predictor
must reproduce a dense forward when the per-tile function is consistent.

The identity function (logits = input channels) is flip-equivariant, so with
any tile grid, Gaussian weighting, and mirror TTA, the assembled logits must
equal the input exactly (weighted average of agreeing values).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from dinounet_tpu.inference.sliding_window import (
    compute_gaussian,
    compute_steps_for_sliding_window,
    predict_sliding_window_return_logits,
)


def _identity_apply(x):
    return x.astype(jnp.float32)


class TestSteps:
    def test_full_coverage_and_bounds(self):
        steps = compute_steps_for_sliding_window((100, 73), (32, 32), 0.5)
        for dim, (size, patch) in zip(steps, ((100, 32), (73, 32))):
            assert dim[0] == 0
            assert dim[-1] == size - patch
        # neighboring steps overlap (step <= patch)
        for dim in steps:
            diffs = np.diff(dim)
            assert np.all(diffs <= 32)

    def test_exact_fit_single_step(self):
        steps = compute_steps_for_sliding_window((32, 32), (32, 32), 0.5)
        assert steps == [[0], [0]]


class TestGaussian:
    def test_shape_peak_positive(self):
        g = compute_gaussian((16, 24))
        assert g.shape == (16, 24)
        assert g.max() == pytest.approx(10.0, rel=1e-2)
        assert g.min() > 0

    def test_3d(self):
        g = compute_gaussian((8, 16, 16))
        assert g.shape == (8, 16, 16)
        assert np.unravel_index(g.argmax(), g.shape) == (4, 8, 8)


class TestAssembly2D:
    def test_identity_roundtrip(self, rng):
        data = rng.standard_normal((3, 2, 70, 90)).astype(np.float32)
        out = predict_sliding_window_return_logits(
            _identity_apply, data, (32, 32), num_classes=3,
            tile_step_size=0.5, mirror_axes=None, tile_batch=4)
        np.testing.assert_allclose(out, data, rtol=1e-4, atol=1e-4)

    def test_identity_with_tta(self, rng):
        data = rng.standard_normal((2, 1, 48, 40)).astype(np.float32)
        out = predict_sliding_window_return_logits(
            _identity_apply, data, (32, 32), num_classes=2,
            tile_step_size=0.5, mirror_axes=(0, 1), tile_batch=3)
        np.testing.assert_allclose(out, data, rtol=1e-4, atol=1e-4)

    def test_no_gaussian_uniform_average(self, rng):
        data = rng.standard_normal((1, 1, 60, 60)).astype(np.float32)
        out = predict_sliding_window_return_logits(
            _identity_apply, data, (32, 32), num_classes=1,
            tile_step_size=0.5, use_gaussian=False, tile_batch=2)
        np.testing.assert_allclose(out, data, rtol=1e-4, atol=1e-4)

    def test_pad_and_revert_small_volume(self, rng):
        # volume smaller than the patch: padded up, then cropped back
        data = rng.standard_normal((1, 1, 20, 25)).astype(np.float32)
        out = predict_sliding_window_return_logits(
            _identity_apply, data, (32, 32), num_classes=1, tile_batch=1)
        assert out.shape == data.shape
        np.testing.assert_allclose(out, data, rtol=1e-4, atol=1e-4)


class TestAssembly3D:
    def test_identity_roundtrip(self, rng):
        data = rng.standard_normal((2, 20, 36, 28)).astype(np.float32)
        out = predict_sliding_window_return_logits(
            _identity_apply, data, (16, 16, 16), num_classes=2,
            tile_step_size=0.5, mirror_axes=None, tile_batch=4)
        assert out.shape == data.shape
        np.testing.assert_allclose(out, data, rtol=1e-4, atol=1e-4)

    def test_identity_with_tta_3d(self, rng):
        data = rng.standard_normal((1, 18, 20, 22)).astype(np.float32)
        out = predict_sliding_window_return_logits(
            _identity_apply, data, (16, 16, 16), num_classes=1,
            tile_step_size=0.5, mirror_axes=(0, 1, 2), tile_batch=2)
        np.testing.assert_allclose(out, data, rtol=1e-4, atol=1e-4)


def test_mesh_sharded_assembly_matches_single_device(rng):
    """Multi-chip inference: tile batches sharded over an 8-way data axis must
    reproduce the single-device result exactly."""
    import jax

    from dinounet_tpu.parallel import make_mesh

    mesh = make_mesh(n_model=1, devices=jax.devices("cpu")[:8])
    data = rng.standard_normal((2, 2, 70, 90)).astype(np.float32)
    single = predict_sliding_window_return_logits(
        _identity_apply, data, (32, 32), num_classes=2, tile_batch=8)
    with mesh:
        sharded = predict_sliding_window_return_logits(
            _identity_apply, data, (32, 32), num_classes=2, tile_batch=8,
            mesh=mesh)
    np.testing.assert_allclose(sharded, single, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(sharded, data, rtol=1e-4, atol=1e-4)


class TestWithTarget:
    """`*_with_target` variants (ref predict_from_raw_data.py:554-569,623-776):
    the target volume is sliced and mirror-flipped alongside the image. With
    net(x, t) = x * t (flip-equivariant), assembly must return data * mask."""

    def test_masked_identity_roundtrip(self, rng):
        from dinounet_tpu.inference.sliding_window import (
            predict_sliding_window_return_logits_with_target,
        )

        data = rng.standard_normal((2, 1, 70, 90)).astype(np.float32)
        mask = (rng.random((1, 1, 70, 90)) > 0.5).astype(np.float32)
        out = predict_sliding_window_return_logits_with_target(
            lambda x, t: (x * t).astype(jnp.float32), data, mask,
            (32, 32), num_classes=2, tile_step_size=0.5, tile_batch=4)
        np.testing.assert_allclose(out, data * mask, rtol=1e-4, atol=1e-4)

    def test_with_target_tta_3d(self, rng):
        from dinounet_tpu.inference.sliding_window import (
            predict_sliding_window_return_logits_with_target,
        )

        data = rng.standard_normal((1, 20, 28, 24)).astype(np.float32)
        mask = (rng.random((1, 20, 28, 24)) > 0.3).astype(np.float32)
        out = predict_sliding_window_return_logits_with_target(
            lambda x, t: (x * t).astype(jnp.float32), data, mask,
            (16, 16, 16), num_classes=1, tile_step_size=0.5,
            mirror_axes=(0, 1, 2), tile_batch=2)
        np.testing.assert_allclose(out, data * mask, rtol=1e-4, atol=1e-4)


class TestShapeBucketing:
    """Padded volume shapes are bucketed to half-patch multiples so distinct
    case shapes share one compiled tile predictor (each distinct shape would
    otherwise cost a full XLA compile)."""

    def test_same_bucket_same_padded_shape(self):
        from dinounet_tpu.inference.sliding_window import (
            prepare_sliding_window_volume,
        )

        shapes = []
        for Y, X in ((530, 600), (560, 620), (512, 513)):
            data = np.zeros((1, 1, Y, X), np.float32)
            vol, offs, revert = prepare_sliding_window_volume(data, (128, 128))
            shapes.append((vol.shape, offs.shape))
            # revert window recovers the original extent
            assert [hi - lo for lo, hi in revert] == [1, Y, X]
        # 530x600 and 560x620 both pad to (576, 640); 512x513 differs
        assert shapes[0] == shapes[1]
        assert shapes[2] != shapes[0]

    def test_bucketed_output_matches_identity(self):
        from dinounet_tpu.inference.sliding_window import (
            predict_sliding_window_return_logits,
        )

        rng = np.random.default_rng(0)
        data = rng.standard_normal((1, 1, 150, 201)).astype(np.float32)
        out = predict_sliding_window_return_logits(
            lambda x: x, data, (64, 64), num_classes=1, tile_batch=4)
        np.testing.assert_allclose(out, data, rtol=1e-4, atol=1e-4)

    def test_z_bucketing_2d_net_on_3d_volume(self):
        from dinounet_tpu.inference.sliding_window import (
            predict_sliding_window_return_logits,
            prepare_sliding_window_volume,
        )

        data = np.random.default_rng(1).standard_normal(
            (1, 5, 70, 70)).astype(np.float32)
        vol, _, revert = prepare_sliding_window_volume(data, (64, 64))
        assert vol.shape[0] == 8  # z padded to a multiple of 8
        out = predict_sliding_window_return_logits(
            lambda x: x, data, (64, 64), num_classes=1, tile_batch=4)
        assert out.shape == (1, 5, 70, 70)
        np.testing.assert_allclose(out, data, rtol=1e-4, atol=1e-4)


class TestHostAccumulationFallback:
    """Memory escape hatch (ref predict_from_raw_data.py:709-718): when the
    fp32 accumulators exceed the device budget, tiles are predicted on device
    but accumulated host-side — results must be identical to the device path."""

    def test_budget_trips_host_path_2d(self, rng, monkeypatch):
        monkeypatch.setenv("DINOUNET_TPU_SW_ACCUM_BUDGET_BYTES", "0")
        data = rng.standard_normal((2, 2, 70, 90)).astype(np.float32)
        out = predict_sliding_window_return_logits(
            _identity_apply, data, (32, 32), num_classes=2,
            tile_step_size=0.5, mirror_axes=(0, 1), tile_batch=4)
        np.testing.assert_allclose(out, data, rtol=1e-4, atol=1e-4)

    def test_budget_trips_host_path_3d(self, rng, monkeypatch):
        monkeypatch.setenv("DINOUNET_TPU_SW_ACCUM_BUDGET_BYTES", "0")
        data = rng.standard_normal((1, 40, 40, 40)).astype(np.float32)
        out = predict_sliding_window_return_logits(
            _identity_apply, data, (16, 16, 16), num_classes=1,
            tile_step_size=0.5, tile_batch=2)
        np.testing.assert_allclose(out, data, rtol=1e-4, atol=1e-4)

    def test_host_path_matches_device_path(self, rng, monkeypatch):
        # non-equivariant network (per-class affine of channel mean) so the
        # comparison is not trivially identity
        def net(x):
            m = jnp.mean(x, axis=-1, keepdims=True)
            return jnp.concatenate([m, 2.0 * m + 1.0], axis=-1)

        data = rng.standard_normal((3, 1, 60, 75)).astype(np.float32)
        dev = predict_sliding_window_return_logits(
            net, data, (32, 32), num_classes=2, tile_batch=3)
        monkeypatch.setenv("DINOUNET_TPU_SW_ACCUM_BUDGET_BYTES", "0")
        host = predict_sliding_window_return_logits(
            net, data, (32, 32), num_classes=2, tile_batch=3)
        np.testing.assert_allclose(host, dev, rtol=1e-4, atol=1e-4)

    def test_predictor_fold_loop_host_path(self, rng, monkeypatch):
        # the prebuilt-predictor path carries its apply_fn for the fallback
        from dinounet_tpu.inference.sliding_window import make_tile_predictor

        predictor = make_tile_predictor(
            lambda v, x: x * v["scale"], (32, 32), num_classes=1, tile_batch=2)
        data = rng.standard_normal((1, 1, 50, 50)).astype(np.float32)
        variables = {"scale": jnp.float32(3.0)}
        dev = predict_sliding_window_return_logits(
            None, data, (32, 32), num_classes=1, predictor=predictor,
            variables=variables)
        monkeypatch.setenv("DINOUNET_TPU_SW_ACCUM_BUDGET_BYTES", "0")
        host = predict_sliding_window_return_logits(
            None, data, (32, 32), num_classes=1, predictor=predictor,
            variables=variables, tile_batch=2)
        np.testing.assert_allclose(host, dev, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(host, 3.0 * data, rtol=1e-4, atol=1e-4)
