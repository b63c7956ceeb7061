"""New-style merged nnUNetDataLoader (training/data_loader.py) over the
Numpy dataset backend — capability parity with ref
dinounet/training/dataloading/data_loader.py:19-221."""

import os

import numpy as np
import pytest

from dinounet_tpu.training.data_loader import crop_and_pad_nd, nnUNetDataLoader
from dinounet_tpu.training.nnunet_dataset import nnUNetDatasetNumpy


class _Labels:
    all_labels = [1, 2]
    has_ignore_label = False


class _LabelsIgnore:
    all_labels = [1]
    has_ignore_label = True


def _make_folder(tmp_path, n_cases=3, shape=(1, 1, 24, 24), with_ignore=False):
    rng = np.random.default_rng(0)
    for i in range(n_cases):
        data = rng.normal(size=shape).astype(np.float32)
        seg = rng.integers(0, 3, size=shape).astype(np.int8)
        fg1 = np.argwhere(seg[0] == 1)
        fg2 = np.argwhere(seg[0] == 2)
        locs = {
            1: np.hstack([np.zeros((len(fg1), 1), int), fg1])[:100],
            2: np.hstack([np.zeros((len(fg2), 1), int), fg2])[:100],
        }
        if with_ignore:
            ann = np.argwhere(seg[0] >= 0)
            locs[(-1, 1)] = np.hstack([np.zeros((len(ann), 1), int), ann])[:100]
        props = {"class_locations": locs, "spacing": [999, 1.0, 1.0]}
        nnUNetDatasetNumpy.save_case(
            data, seg, props, os.path.join(tmp_path, f"case_{i:03d}"))
    return nnUNetDatasetNumpy(str(tmp_path))


def test_crop_and_pad_nd():
    a = np.arange(16, dtype=np.float32).reshape(1, 4, 4)
    out = crop_and_pad_nd(a, [[-1, 3], [2, 6]], pad_value=-7)
    assert out.shape == (1, 4, 4)
    assert (out[0, 0] == -7).all()          # padded row above
    assert (out[0, :, -2:] == -7).all()     # padded cols right
    assert out[0, 1, 0] == a[0, 0, 2]


def test_2d_batch_shapes_and_dtypes(tmp_path):
    ds = _make_folder(tmp_path)
    dl = nnUNetDataLoader(ds, batch_size=4, patch_size=(16, 16),
                          final_patch_size=(16, 16), label_manager=_Labels(),
                          oversample_foreground_percent=0.33, seed=0)
    batch = next(dl)
    assert batch["data"].shape == (4, 1, 16, 16)
    assert batch["target"].shape == (4, 1, 16, 16)
    assert batch["data"].dtype == np.float32
    assert batch["target"].dtype == np.int16
    assert len(batch["keys"]) == 4
    assert all(k in ds.keys() for k in batch["keys"])


def test_oversampling_forces_foreground(tmp_path):
    """The last round(bs*0.33) samples must contain the selected class —
    with a patch centered on a sampled voxel of that class."""
    ds = _make_folder(tmp_path)
    dl = nnUNetDataLoader(ds, batch_size=3, patch_size=(8, 8),
                          final_patch_size=(8, 8), label_manager=_Labels(),
                          oversample_foreground_percent=0.33, seed=1)
    assert [dl.get_do_oversample(i) for i in range(3)] == [False, False, True]
    for _ in range(5):
        batch = next(dl)
        assert (batch["target"][-1] > 0).any()


def test_ignore_label_samples_annotated_key(tmp_path):
    ds = _make_folder(tmp_path, with_ignore=True)
    dl = nnUNetDataLoader(ds, batch_size=2, patch_size=(8, 8),
                          final_patch_size=(8, 8),
                          label_manager=_LabelsIgnore(), seed=2)
    assert dl.annotated_classes_key == (-1, 1)
    batch = next(dl)  # non-forced samples go through the annotated key path
    assert batch["data"].shape == (2, 1, 8, 8)


def test_patch_larger_than_image_pads(tmp_path):
    ds = _make_folder(tmp_path, shape=(1, 1, 10, 10))
    dl = nnUNetDataLoader(ds, batch_size=2, patch_size=(16, 16),
                          final_patch_size=(16, 16), label_manager=_Labels(),
                          seed=3)
    batch = next(dl)
    assert batch["data"].shape == (2, 1, 16, 16)
    assert (batch["target"] == -1).any()  # seg pad value


def test_3d_with_prev_stage(tmp_path):
    d_main = tmp_path / "main"
    d_prev = tmp_path / "prev"
    d_main.mkdir()
    d_prev.mkdir()
    rng = np.random.default_rng(0)
    data = rng.normal(size=(1, 12, 12, 12)).astype(np.float32)
    seg = rng.integers(0, 2, size=(1, 12, 12, 12)).astype(np.int8)
    fg = np.argwhere(seg[0] == 1)
    props = {"class_locations": {1: np.hstack(
        [np.zeros((len(fg), 1), int), fg])[:50]}}
    nnUNetDatasetNumpy.save_case(data, seg, props,
                                 os.path.join(str(d_main), "case_000"))
    # exported prev-stage segs are channel-less (x, y, z) — ref export format
    nnUNetDatasetNumpy.save_seg(seg[0], os.path.join(str(d_prev), "case_000"))
    ds = nnUNetDatasetNumpy(str(d_main),
                            folder_with_segs_from_previous_stage=str(d_prev))
    dl = nnUNetDataLoader(ds, batch_size=2, patch_size=(8, 8, 8),
                          final_patch_size=(8, 8, 8), label_manager=_Labels(),
                          seed=4)
    batch = next(dl)
    assert batch["data"].shape == (2, 1, 8, 8, 8)
    assert batch["target"].shape == (2, 2, 8, 8, 8)  # seg + prev-stage


def test_transforms_hook(tmp_path):
    ds = _make_folder(tmp_path)
    calls = []

    def tf(data, seg):
        calls.append(data.shape)
        return data * 2.0, seg

    dl = nnUNetDataLoader(ds, batch_size=2, patch_size=(8, 8),
                          final_patch_size=(8, 8), label_manager=_Labels(),
                          transforms=tf, seed=5)
    next(dl)
    assert calls == [(2, 1, 8, 8)]


def test_blosc2_backend_batches_match_numpy(tmp_path):
    """The loader must produce byte-identical batches whichever backend
    stores the cases (the Blosc2 one reads patches lazily per-block)."""
    from dinounet_tpu.training.nnunet_dataset import nnUNetDatasetBlosc2

    d_np, d_b2 = tmp_path / "np", tmp_path / "b2"
    d_np.mkdir(), d_b2.mkdir()
    rng = np.random.default_rng(11)
    for i in range(2):
        data = rng.normal(size=(1, 1, 24, 24)).astype(np.float32)
        seg = rng.integers(0, 3, size=(1, 1, 24, 24)).astype(np.int8)
        fg = np.argwhere(seg[0] == 1)
        locs = {1: np.hstack([np.zeros((len(fg), 1), int), fg])[:100]}
        props = {"class_locations": locs, "spacing": [999, 1.0, 1.0]}
        for cls, folder in ((nnUNetDatasetNumpy, d_np), (nnUNetDatasetBlosc2, d_b2)):
            cls.save_case(data, seg, props, os.path.join(str(folder), f"case_{i}"))

    batches = {}
    for cls, folder in ((nnUNetDatasetNumpy, d_np), (nnUNetDatasetBlosc2, d_b2)):
        dl = nnUNetDataLoader(cls(str(folder)), batch_size=4, patch_size=(16, 16),
                              final_patch_size=(16, 16), label_manager=_Labels(),
                              oversample_foreground_percent=0.33, seed=0)
        batches[cls.__name__] = next(dl)

    a, b = batches["nnUNetDatasetNumpy"], batches["nnUNetDatasetBlosc2"]
    assert list(a["keys"]) == list(b["keys"])
    np.testing.assert_array_equal(a["data"], b["data"])
    np.testing.assert_array_equal(a["target"], b["target"])
