"""Predictor-level `*_with_target` path (ref predict_from_raw_data.py:728-776):
a network taking (image, mask) driven through manual_initialization +
predict_sliding_window_return_logits_with_target, with mirror TTA."""

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from dinounet_tpu.inference.predictor import nnUNetPredictor
from dinounet_tpu.utilities.plans_handler import PlansManager

PLANS = {
    "dataset_name": "Dataset999_Fake",
    "plans_name": "plans",
    "configurations": {"2d": {
        "patch_size": [32, 32], "batch_size": 2, "spacing": [1.0, 1.0],
        "normalization_schemes": ["ZScoreNormalization"],
        "use_mask_for_norm": [False],
        "resampling_fn_data": "resample_data_or_seg_to_shape",
        "resampling_fn_seg": "resample_data_or_seg_to_shape",
        "resampling_fn_probabilities": "resample_data_or_seg_to_shape",
        "resampling_fn_data_kwargs": {}, "resampling_fn_seg_kwargs": {},
        "resampling_fn_probabilities_kwargs": {},
    }},
}
DATASET_JSON = {"labels": {"background": 0, "fg": 1}, "file_ending": ".png",
                "channel_names": {"0": "img"}}


class MaskedNet(nn.Module):
    """Flip-equivariant two-input net: logits = (x * mask, -(x * mask))."""

    @nn.compact
    def __call__(self, x, t, train=False):
        w = self.param("w", nn.initializers.ones, (1,), jnp.float32)
        y = (x * t * w).astype(jnp.float32)
        return jnp.concatenate([y, -y], axis=-1)


def test_predictor_with_target(rng):
    pm = PlansManager(PLANS)
    x = rng.standard_normal((1, 1, 48, 40)).astype(np.float32)
    mask = (rng.random((1, 1, 48, 40)) > 0.5).astype(np.float32)
    variables = {"params": {"w": jnp.ones((1,), jnp.float32)}}

    p = nnUNetPredictor(use_mirroring=True)
    p.manual_initialization(MaskedNet(), pm, pm.get_configuration("2d"),
                            [variables], DATASET_JSON, "nnUNetTrainer", (0, 1))
    out = p.predict_sliding_window_return_logits_with_target(x, mask)
    assert out.shape == (2, 1, 48, 40)
    np.testing.assert_allclose(out[0], x[0] * mask[0], atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(out[1], -(x[0] * mask[0]), atol=1e-5, rtol=1e-5)
