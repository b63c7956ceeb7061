"""predict_from_list_of_npy_arrays / predict_from_data_iterator (ref
predict_from_raw_data.py:291-427): in-memory batch prediction through the
preprocessing iterator, without files on disk."""

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from dinounet_tpu.inference.predictor import nnUNetPredictor
from dinounet_tpu.utilities.plans_handler import PlansManager

PLANS = {
    "dataset_name": "Dataset999_Fake",
    "plans_name": "plans",
    "transpose_forward": [0, 1, 2],
    "transpose_backward": [0, 1, 2],
    "foreground_intensity_properties_per_channel": {
        "0": {"mean": 0.0, "std": 1.0, "percentile_00_5": -2.0,
              "percentile_99_5": 2.0, "median": 0.0, "min": -4.0, "max": 4.0}},
    "configurations": {"2d": {
        "preprocessor_name": "DefaultPreprocessor",
        "patch_size": [32, 32], "batch_size": 2, "spacing": [1.0, 1.0],
        "normalization_schemes": ["ZScoreNormalization"],
        "use_mask_for_norm": [False],
        "resampling_fn_data": "resample_data_or_seg_to_shape",
        "resampling_fn_seg": "resample_data_or_seg_to_shape",
        "resampling_fn_probabilities": "resample_data_or_seg_to_shape",
        "resampling_fn_data_kwargs": {
            "is_seg": False, "order": 3, "order_z": 0,
            "force_separate_z": None},
        "resampling_fn_seg_kwargs": {
            "is_seg": True, "order": 1, "order_z": 0,
            "force_separate_z": None},
        "resampling_fn_probabilities_kwargs": {
            "is_seg": False, "order": 1, "order_z": 0,
            "force_separate_z": None},
    }},
}
DATASET_JSON = {"labels": {"background": 0, "fg": 1}, "file_ending": ".png",
                "channel_names": {"0": "img"}}


class ThresholdNet(nn.Module):
    """fg logit = input (z-scored), bg logit = -input: segments x > mean."""

    @nn.compact
    def __call__(self, x, train=False):
        w = self.param("w", nn.initializers.ones, (1,), jnp.float32)
        y = (x * w).astype(jnp.float32)
        return jnp.concatenate([-y, y], axis=-1)


def test_predict_from_list_of_npy_arrays(rng):
    pm = PlansManager(PLANS)
    p = nnUNetPredictor(use_mirroring=False)
    p.manual_initialization(ThresholdNet(), pm, pm.get_configuration("2d"),
                            [{"params": {"w": jnp.ones((1,), jnp.float32)}}],
                            DATASET_JSON, "nnUNetTrainer", None)

    images, props = [], []
    for i in range(3):
        img = rng.standard_normal((1, 1, 40, 36)).astype(np.float32)
        images.append(img)
        props.append({"spacing": [999.0, 1.0, 1.0]})

    segs = p.predict_from_list_of_npy_arrays(
        images, None, props, None, num_processes=2)
    assert len(segs) == 3
    for img, seg in zip(images, segs):
        assert seg.shape == img.shape[1:]
        # z-score normalization preserves the sign structure around the mean
        z = (img[0] - img[0].mean()) / (img[0].std() + 1e-8)
        np.testing.assert_array_equal(np.asarray(seg), (z > 0).astype(seg.dtype))


def test_fold_ensemble_host_accumulation_matches_device(rng, monkeypatch):
    """The predictor's memory-escape-hatch fold loop (one shared accumulator
    pair, weights scattered once) must match the on-device fold averaging."""
    pm = PlansManager(PLANS)

    def make_predictor():
        p = nnUNetPredictor(use_mirroring=False)
        p.manual_initialization(
            ThresholdNet(), pm, pm.get_configuration("2d"),
            [{"params": {"w": jnp.ones((1,), jnp.float32)}},
             {"params": {"w": 3.0 * jnp.ones((1,), jnp.float32)}}],
            DATASET_JSON, "nnUNetTrainer", None)
        return p

    data = rng.standard_normal((1, 1, 50, 70)).astype(np.float32)
    dev = make_predictor().predict_logits_from_preprocessed_data(data)
    monkeypatch.setenv("DINOUNET_TPU_SW_ACCUM_BUDGET_BYTES", "0")
    host = make_predictor().predict_logits_from_preprocessed_data(data)
    np.testing.assert_allclose(np.asarray(host, np.float32),
                               np.asarray(dev, np.float32),
                               rtol=1e-3, atol=1e-3)
