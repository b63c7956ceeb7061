"""Public preprocessing-iterator API (ref inference/data_iterators.py:17-230)."""

import numpy as np
import pytest

from dinounet_tpu.inference.data_iterators import (
    _WorkerFailed,
    preprocessing_iterator_fromfiles,
    preprocessing_iterator_fromnpy,
)
from dinounet_tpu.utilities.plans_handler import PlansManager
from tests.test_predictor_npy_arrays import DATASET_JSON, PLANS


@pytest.fixture()
def managers():
    plans = dict(PLANS)
    plans["image_reader_writer"] = "NaturalImage2DIO"
    pm = PlansManager(plans)
    return pm, pm.get_configuration("2d")


def _props():
    return {"spacing": [999.0, 1.0, 1.0]}


class TestFromNpy:
    def test_yields_in_order_with_properties(self, managers, rng):
        pm, cm = managers
        images = [rng.standard_normal((1, 1, 40 + i, 40)).astype(np.float32)
                  for i in range(4)]
        props = [_props() for _ in images]
        items = list(preprocessing_iterator_fromnpy(
            images, None, props, ["a", "b", "c", "d"], pm, DATASET_JSON, cm,
            num_processes=2))
        assert [it["ofile"] for it in items] == ["a", "b", "c", "d"]
        for it in items:
            assert it["data"].dtype == np.float32
            assert it["data"].ndim == 4
            assert "shape_before_cropping" in it["data_properties"]

    def test_prev_stage_seg_appended_as_onehot(self, managers, rng):
        pm, cm = managers
        img = rng.standard_normal((1, 1, 32, 32)).astype(np.float32)
        seg_prev = rng.integers(0, 2, (1, 1, 32, 32)).astype(np.int8)
        (item,) = list(preprocessing_iterator_fromnpy(
            [img], [seg_prev], [_props()], None, pm, DATASET_JSON, cm))
        # 1 image channel + 1 foreground label one-hot channel
        assert item["data"].shape[0] == 2
        assert set(np.unique(item["data"][1])) <= {0.0, 1.0}

    def test_worker_failure_raises(self, managers):
        pm, cm = managers
        bad = [np.zeros((1,), np.float32)]  # wrong rank -> preprocessor raises
        with pytest.raises(_WorkerFailed):
            list(preprocessing_iterator_fromnpy(
                bad, None, [_props()], None, pm, DATASET_JSON, cm))

    def test_empty_input(self, managers):
        pm, cm = managers
        assert list(preprocessing_iterator_fromnpy(
            [], None, [], None, pm, DATASET_JSON, cm)) == []


class TestFromFiles:
    def test_reads_and_preprocesses_files(self, managers, tmp_path, rng):
        from PIL import Image

        pm, cm = managers
        lists = []
        for i in range(3):
            f = tmp_path / f"case_{i}_0000.png"
            Image.fromarray(
                rng.integers(0, 255, (40, 44)).astype(np.uint8)).save(str(f))
            lists.append([str(f)])
        items = list(preprocessing_iterator_fromfiles(
            lists, None, [f"o{i}" for i in range(3)], pm, DATASET_JSON, cm,
            num_processes=2))
        assert [it["ofile"] for it in items] == ["o0", "o1", "o2"]
        for it in items:
            assert it["data"].shape[0] == 1
