"""Golden/behavioral tests for fingerprint -> plan -> preprocess on synthetic data.

These are pure deterministic host-side functions; the reference ships no tests
for them (SURVEY.md §4), so these golden tests define the contract.
"""

import os
import pickle

import numpy as np
import pytest

from dinounet_tpu.planning.fingerprint import DatasetFingerprintExtractor
from dinounet_tpu.planning.planner import ExperimentPlanner, compute_unet_feature_map_size
from dinounet_tpu.planning.topology import get_pool_and_conv_props
from dinounet_tpu.planning.verify import verify_dataset_integrity
from dinounet_tpu.preprocessing.preprocessor import DefaultPreprocessor
from dinounet_tpu.preprocessing.resampling import resize_nd, resample_data_or_seg_to_shape
from dinounet_tpu.utilities.json_export import load_json
from dinounet_tpu.utilities.plans_handler import PlansManager

from helpers import make_nifti_dataset, make_png_dataset


@pytest.fixture()
def nnunet_env(tmp_path, monkeypatch):
    raw = tmp_path / "raw"
    pre = tmp_path / "preprocessed"
    res = tmp_path / "results"
    for p in (raw, pre, res):
        p.mkdir()
    monkeypatch.setenv("nnUNet_raw", str(raw))
    monkeypatch.setenv("nnUNet_preprocessed", str(pre))
    monkeypatch.setenv("nnUNet_results", str(res))
    return tmp_path


class TestTopology:
    def test_isotropic_2d(self):
        npool, pools, kernels, patch, div = get_pool_and_conv_props(
            (1.0, 1.0), (512, 512), 4, 999999
        )
        assert patch == (512, 512)
        assert pools[0] == (1, 1)
        assert all(k == (3, 3) for k in kernels)

    def test_force_stages(self):
        # max_numpool = 3 -> 4 stages
        npool, pools, kernels, patch, div = get_pool_and_conv_props(
            (1.0, 1.0), (512, 512), 4, 3
        )
        assert len(pools) == 4
        assert npool == [3, 3]
        assert tuple(div) == (8, 8)

    def test_anisotropic_pooling(self):
        npool, pools, kernels, patch, div = get_pool_and_conv_props(
            (5.0, 1.0, 1.0), (16, 256, 256), 4, 999999
        )
        # the coarse axis is pooled less
        assert npool[0] < npool[1]


class TestResampling:
    def test_identity(self, rng):
        x = rng.standard_normal((8, 9)).astype(np.float32)
        np.testing.assert_allclose(resize_nd(x, (8, 9), 3), x, atol=1e-6)

    def test_constant_preserved(self):
        x = np.full((6, 6), 3.7)
        out = resize_nd(x, (13, 11), 3)
        np.testing.assert_allclose(out, 3.7, atol=1e-6)

    def test_linear_matches_torch(self, rng):
        """Cross-check order-1 resize against torch's align_corners=False bilinear."""
        import torch
        import torch.nn.functional as F

        x = rng.standard_normal((16, 20)).astype(np.float32)
        out = resize_nd(x, (9, 13), order=1)
        ref = F.interpolate(
            torch.from_numpy(x)[None, None], size=(9, 13), mode="bilinear",
            align_corners=False,
        )[0, 0].numpy()
        # interior matches exactly; edges differ only via clamp behavior, same here
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_seg_resampling_labels_preserved(self, rng):
        seg = rng.integers(0, 4, (1, 10, 12, 14)).astype(np.int8)
        out = resample_data_or_seg_to_shape(
            seg, (15, 18, 21), (1, 1, 1), (0.7, 0.7, 0.7), is_seg=True, order=1
        )
        assert out.shape == (1, 15, 18, 21)
        assert set(np.unique(out)).issubset(set(np.unique(seg)))

    def test_separate_z_path(self, rng):
        data = rng.standard_normal((1, 5, 24, 24)).astype(np.float32)
        out = resample_data_or_seg_to_shape(
            data, (10, 48, 48), (5.0, 1.0, 1.0), (2.5, 0.5, 0.5),
            is_seg=False, order=3, order_z=0, force_separate_z=None,
        )
        assert out.shape == (1, 10, 48, 48)


class TestVRAMModel:
    def test_feature_map_accounting(self):
        # 4-stage 2d net at 512x512: hand-computable closed form
        est = compute_unet_feature_map_size(
            (512, 512), (32, 64, 128, 256),
            ((1, 1), (2, 2), (2, 2), (2, 2)), (2, 2, 2, 2), (2, 2, 2), 3,
        )
        sizes = [512 * 512, 256 * 256, 128 * 128, 64 * 64]
        feats = [32, 64, 128, 256]
        enc = sum(2 * f * s for f, s in zip(feats, sizes))
        dec = sum(2 * feats[e] * sizes[e] + feats[e] * sizes[e] for e in (2, 1, 0))
        dec += 3 * sizes[0]  # final seg head only (no deep supervision)
        assert est == enc + dec


class TestEndToEndPlanning:
    def test_png_pipeline_forced_shape(self, nnunet_env):
        make_png_dataset(str(nnunet_env / "raw"))
        verify_dataset_integrity(str(nnunet_env / "raw" / "Dataset501_Toy2d"))

        fp = DatasetFingerprintExtractor(501, num_processes=1).run()
        assert "spacings" in fp and "foreground_intensity_properties_per_channel" in fp

        planner = ExperimentPlanner(
            501, force_target_shape=[512, 512], force_n_stages=4
        )
        plans = planner.plan_experiment()
        cfg = plans["configurations"]["2d"]
        assert cfg["patch_size"] == [512, 512]
        arch = cfg["architecture"]["arch_kwargs"]
        assert arch["n_stages"] == 4
        assert list(arch["features_per_stage"]) == [32, 64, 128, 256]
        assert cfg["batch_size"] >= 2
        assert cfg["batch_dice"] is True
        assert plans["image_reader_writer"] == "NaturalImage2DIO"

        DefaultPreprocessor(verbose=False).run(501, "2d", "nnUNetPlans", num_processes=1)
        out_dir = nnunet_env / "preprocessed" / "Dataset501_Toy2d" / "nnUNetPlans_2d"
        npzs = sorted(p for p in os.listdir(out_dir) if p.endswith(".npz"))
        assert len(npzs) == 6
        arr = np.load(out_dir / npzs[0])
        assert arr["data"].ndim == 4 and arr["seg"].ndim == 4
        assert arr["data"].shape[1] == 1  # 2d stored as (c, 1, X, Y)
        assert arr["data"].shape[2:] == (512, 512)
        with open(out_dir / (npzs[0][:-4] + ".pkl"), "rb") as f:
            props = pickle.load(f)
        assert "class_locations" in props
        assert set(props["class_locations"].keys()) == {1, 2}
        assert "shape_before_cropping" in props and "bbox_used_for_cropping" in props

    def test_nifti_pipeline_3d(self, nnunet_env):
        make_nifti_dataset(str(nnunet_env / "raw"))
        verify_dataset_integrity(str(nnunet_env / "raw" / "Dataset502_Toy3d"))
        DatasetFingerprintExtractor(502, num_processes=1).run()
        plans = ExperimentPlanner(502).plan_experiment()
        assert "3d_fullres" in plans["configurations"]
        assert "2d" in plans["configurations"]
        pm = PlansManager(plans)
        cm = pm.get_configuration("3d_fullres")
        assert len(cm.patch_size) == 3
        DefaultPreprocessor(verbose=False).run(502, "3d_fullres", "nnUNetPlans", num_processes=1)
        out_dir = nnunet_env / "preprocessed" / "Dataset502_Toy3d" / "nnUNetPlans_3d_fullres"
        assert len([p for p in os.listdir(out_dir) if p.endswith(".npz")]) == 4

    def test_plans_inheritance(self, nnunet_env):
        make_nifti_dataset(str(nnunet_env / "raw"))
        DatasetFingerprintExtractor(502, num_processes=1).run()
        plans = ExperimentPlanner(502).plan_experiment()
        plans["configurations"]["custom"] = {"inherits_from": "2d", "batch_size": 99}
        pm = PlansManager(plans)
        cm = pm.get_configuration("custom")
        assert cm.batch_size == 99
        assert cm.patch_size == pm.get_configuration("2d").patch_size


def test_move_plans_between_datasets(tmp_path, monkeypatch):
    """move_plans_between_datasets rewrites dataset_name, data_identifier,
    plans_name and the probed reader/writer (ref plans_for_pretraining/
    move_plans_between_datasets.py:14-87)."""
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from helpers import make_png_dataset

    for sub in ("raw", "preprocessed", "results"):
        os.makedirs(tmp_path / sub, exist_ok=True)
    monkeypatch.setenv("nnUNet_raw", str(tmp_path / "raw"))
    monkeypatch.setenv("nnUNet_preprocessed", str(tmp_path / "preprocessed"))
    monkeypatch.setenv("nnUNet_results", str(tmp_path / "results"))
    make_png_dataset(str(tmp_path / "raw"), "Dataset511_Src", n_cases=2,
                     size=(40, 36))
    make_png_dataset(str(tmp_path / "raw"), "Dataset512_Tgt", n_cases=2,
                     size=(40, 36))

    from dinounet_tpu.planning.fingerprint import DatasetFingerprintExtractor
    from dinounet_tpu.planning.move_plans_between_datasets import (
        move_plans_between_datasets,
    )
    from dinounet_tpu.planning.planner import ExperimentPlanner
    from dinounet_tpu.utilities.json_export import load_json

    DatasetFingerprintExtractor(511, 1, verbose=False).run()
    ExperimentPlanner(511).plan_experiment()

    out = move_plans_between_datasets(511, 512, "nnUNetPlans", "movedPlans")
    moved = load_json(out)
    assert moved["dataset_name"] == "Dataset512_Tgt"
    assert moved["plans_name"] == "movedPlans"
    assert moved["image_reader_writer"] == "NaturalImage2DIO"
    for c, cfg in moved["configurations"].items():
        if "data_identifier" in cfg:
            assert cfg["data_identifier"].startswith("movedPlans")
