"""New-style dataset backends (ref dinounet/training/dataloading/nnunet_dataset.py:122-418)."""

import os

import numpy as np
import pytest

from dinounet_tpu.training.nnunet_dataset import (
    comp_blosc2_params,
    file_ending_dataset_mapping,
    infer_dataset_class,
    nnUNetDatasetBlosc2,
    nnUNetDatasetNumpy,
)


def _make_case(rng, shape=(2, 1, 8, 9)):
    data = rng.standard_normal(shape).astype(np.float32)
    seg = rng.integers(0, 3, (1,) + shape[1:]).astype(np.int8)
    props = {"spacing": [999.0, 1.0, 1.0], "class_locations": {}}
    return data, seg, props


class TestNumpyBackend:
    def test_round_trip_and_identifiers(self, tmp_path):
        rng = np.random.default_rng(0)
        folder = str(tmp_path)
        cases = {}
        for name in ("caseB", "caseA"):
            data, seg, props = _make_case(rng)
            nnUNetDatasetNumpy.save_case(data, seg, props,
                                         os.path.join(folder, name))
            cases[name] = (data, seg, props)

        assert nnUNetDatasetNumpy.get_identifiers(folder) == ["caseA", "caseB"]
        ds = nnUNetDatasetNumpy(folder)
        assert ds.keys() == ["caseA", "caseB"] and len(ds) == 2

        data, seg, seg_prev, props = ds["caseA"]
        np.testing.assert_array_equal(data, cases["caseA"][0])
        np.testing.assert_array_equal(seg, cases["caseA"][1])
        assert seg_prev is None
        assert props["spacing"] == cases["caseA"][2]["spacing"]

    def test_unpack_then_memmap(self, tmp_path):
        rng = np.random.default_rng(1)
        folder = str(tmp_path)
        data, seg, props = _make_case(rng)
        nnUNetDatasetNumpy.save_case(data, seg, props, os.path.join(folder, "c"))
        nnUNetDatasetNumpy.unpack_dataset(folder)
        assert os.path.isfile(os.path.join(folder, "c.npy"))

        loaded, seg_l, _, _ = nnUNetDatasetNumpy(folder).load_case("c")
        assert isinstance(loaded, np.memmap)
        np.testing.assert_array_equal(np.asarray(loaded), data)
        np.testing.assert_array_equal(np.asarray(seg_l), seg)

    def test_previous_stage_seg(self, tmp_path):
        rng = np.random.default_rng(2)
        cur, prev = tmp_path / "cur", tmp_path / "prev"
        cur.mkdir(), prev.mkdir()
        data, seg, props = _make_case(rng)
        nnUNetDatasetNumpy.save_case(data, seg, props, str(cur / "c"))
        prev_seg = rng.integers(0, 2, seg.shape).astype(np.int8)
        nnUNetDatasetNumpy.save_seg(prev_seg, str(prev / "c"))

        _, _, seg_prev, _ = nnUNetDatasetNumpy(
            str(cur), folder_with_segs_from_previous_stage=str(prev)).load_case("c")
        np.testing.assert_array_equal(seg_prev, prev_seg)


class TestInferDatasetClass:
    def test_npz_folder(self, tmp_path):
        rng = np.random.default_rng(3)
        data, seg, props = _make_case(rng)
        nnUNetDatasetNumpy.save_case(data, seg, props, str(tmp_path / "c"))
        assert infer_dataset_class(str(tmp_path)) is nnUNetDatasetNumpy

    def test_sidecars_ignored(self, tmp_path):
        rng = np.random.default_rng(4)
        data, seg, props = _make_case(rng)
        nnUNetDatasetNumpy.save_case(data, seg, props, str(tmp_path / "c"))
        np.save(str(tmp_path / "c.npy"), data)  # unpacked memmap must not confuse it
        assert infer_dataset_class(str(tmp_path)) is nnUNetDatasetNumpy

    def test_b2nd_folder_maps_to_blosc2(self, tmp_path):
        (tmp_path / "c.b2nd").write_bytes(b"")
        (tmp_path / "c.pkl").write_bytes(b"")
        assert infer_dataset_class(str(tmp_path)) is nnUNetDatasetBlosc2

    def test_mixed_endings_raise(self, tmp_path):
        (tmp_path / "a.npz").write_bytes(b"")
        (tmp_path / "b.b2nd").write_bytes(b"")
        with pytest.raises(RuntimeError, match="cannot infer"):
            infer_dataset_class(str(tmp_path))

    def test_mapping_table(self):
        assert file_ending_dataset_mapping["npz"] is nnUNetDatasetNumpy
        assert file_ending_dataset_mapping["b2nd"] is nnUNetDatasetBlosc2


class TestBlosc2Backend:
    """Runs on python-blosc2 when installed, else on the in-tree pure-Python
    engine (dinounet_tpu/compression) — exercised either way."""

    def test_round_trip_and_lazy_patch_read(self, tmp_path):
        rng = np.random.default_rng(5)
        folder = str(tmp_path)
        data, seg, props = _make_case(rng, shape=(2, 12, 40, 48))
        blocks, chunks = comp_blosc2_params(data.shape, (16, 16), data.itemsize)
        nnUNetDatasetBlosc2.save_case(data, seg, props,
                                      os.path.join(folder, "c"),
                                      chunks=chunks, blocks=blocks)
        assert nnUNetDatasetBlosc2.get_identifiers(folder) == ["c"]

        ds = nnUNetDatasetBlosc2(folder)
        loaded, seg_l, seg_prev, props_l = ds.load_case("c")
        assert seg_prev is None
        assert props_l["spacing"] == props["spacing"]
        np.testing.assert_array_equal(np.asarray(loaded[...]), data)
        np.testing.assert_array_equal(np.asarray(seg_l[...]), seg)
        # the loader's access pattern: one patch bbox per case, lazily
        patch = loaded[:, 2:9, 5:21, 30:46]
        np.testing.assert_array_equal(patch, data[:, 2:9, 5:21, 30:46])

    def test_previous_stage_seg_and_save_seg(self, tmp_path):
        rng = np.random.default_rng(6)
        cur, prev = tmp_path / "cur", tmp_path / "prev"
        cur.mkdir(), prev.mkdir()
        data, seg, props = _make_case(rng)
        nnUNetDatasetBlosc2.save_case(data, seg, props, str(cur / "c"))
        prev_seg = rng.integers(0, 2, seg.shape).astype(np.int8)
        nnUNetDatasetBlosc2.save_seg(prev_seg, str(prev / "c"))

        _, _, seg_prev, _ = nnUNetDatasetBlosc2(
            str(cur), folder_with_segs_from_previous_stage=str(prev)
        ).load_case("c")
        np.testing.assert_array_equal(np.asarray(seg_prev[...]), prev_seg)

    def test_default_codec_is_zstd_clevel8(self, tmp_path):
        # the reference preprocesses with ZSTD clevel 8 (ref
        # nnunet_dataset.py:278-282); our save_case must match so
        # cross-implementation reads stay cheap
        rng = np.random.default_rng(7)
        data, seg, props = _make_case(rng, shape=(1, 4, 32, 32))
        nnUNetDatasetBlosc2.save_case(data, seg, props, str(tmp_path / "c"))
        raw = (tmp_path / "c.b2nd").read_bytes()
        assert raw[2:10] == b"b2frame\x00"


class TestCompBlosc2Params:
    @pytest.mark.parametrize("image_size,patch", [
        ((1, 1, 512, 512), (512, 512)),
        ((4, 128, 128, 128), (96, 96, 96)),
        ((2, 33, 207, 64), (28, 160, 56)),
        ((1, 1, 9, 9), (4, 4)),
    ])
    def test_budgets_and_bounds(self, image_size, patch):
        blocks, chunks = comp_blosc2_params(image_size, patch)
        assert len(blocks) == len(chunks) == 4
        # block fits the L1 budget and the image; chunk tiles the block within the image
        assert np.prod(blocks) * 4 <= 32768 * 0.8
        for b, c, i in zip(blocks, chunks, image_size):
            assert 1 <= b <= max(i, 1)
            assert b <= c <= i or c == i
        # chunks hold whole blocks along grown axes (or are image-clamped)
        for a in range(1, 4):
            assert chunks[a] == image_size[a] or chunks[a] % blocks[a] == 0

    def test_2d_patch_never_grows_z(self):
        blocks, chunks = comp_blosc2_params((1, 64, 512, 512), (256, 256))
        assert blocks[1] == 1 and chunks[1] == 1
