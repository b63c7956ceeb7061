"""New-style dataset backends (ref nnunet_dataset.py:122-418)."""

import numpy as np
import pytest

from dinounet_tpu.training.dataset_backends import (
    comp_blosc2_params,
    infer_dataset_class,
    nnUNetDatasetBlosc2,
    nnUNetDatasetNumpy,
)


@pytest.fixture()
def numpy_folder(tmp_path, rng):
    folder = tmp_path / "pp"
    folder.mkdir()
    for case in ("case_a", "case_b"):
        data = rng.standard_normal((2, 4, 8, 8)).astype(np.float32)
        seg = rng.integers(0, 3, (1, 4, 8, 8)).astype(np.int8)
        nnUNetDatasetNumpy.save_case(
            data, seg, {"spacing": [1, 1, 1], "case": case},
            str(folder / case))
    return str(folder)


class TestNumpyBackend:
    def test_identifiers_and_roundtrip(self, numpy_folder):
        ds = nnUNetDatasetNumpy(numpy_folder)
        assert ds.identifiers == ["case_a", "case_b"]
        data, seg, seg_prev, props = ds["case_a"]
        assert data.shape == (2, 4, 8, 8)
        assert seg.shape == (1, 4, 8, 8)
        assert seg_prev is None
        assert props["case"] == "case_a"

    def test_unpacked_memmap_preferred(self, numpy_folder):
        nnUNetDatasetNumpy.unpack_dataset(numpy_folder)
        ds = nnUNetDatasetNumpy(numpy_folder)
        data, seg, _, _ = ds.load_case("case_b")
        assert isinstance(data, np.memmap)
        assert isinstance(seg, np.memmap)

    def test_prev_stage_seg(self, numpy_folder, tmp_path, rng):
        prev = tmp_path / "prev"
        prev.mkdir()
        for case in ("case_a", "case_b"):
            np.savez_compressed(str(prev / f"{case}.npz"),
                                seg=rng.integers(0, 2, (1, 4, 8, 8)).astype(np.int8))
        ds = nnUNetDatasetNumpy(numpy_folder,
                                folder_with_segs_from_previous_stage=str(prev))
        _, _, seg_prev, _ = ds.load_case("case_a")
        assert seg_prev is not None and seg_prev.shape == (1, 4, 8, 8)


class TestInferDatasetClass:
    def test_npz_folder(self, numpy_folder):
        assert infer_dataset_class(numpy_folder) is nnUNetDatasetNumpy

    def test_mixed_folder_raises(self, numpy_folder, tmp_path):
        open(numpy_folder + "/rogue.b2nd", "wb").close()
        with pytest.raises(RuntimeError, match="cannot infer"):
            infer_dataset_class(numpy_folder)


class TestBlosc2Gate:
    def test_blosc2_backend_errors_clearly_when_missing(self, numpy_folder):
        try:
            import blosc2  # noqa: F401

            pytest.skip("blosc2 installed; gate not exercised")
        except ImportError:
            pass
        with pytest.raises(ImportError, match="blosc2"):
            nnUNetDatasetBlosc2(numpy_folder)


class TestCompBlosc2Params:
    def test_block_fits_l1_chunk_fits_l3(self):
        blocks, chunks = comp_blosc2_params(
            (2, 1, 512, 512), (256, 256), bytes_per_pixel=4)
        assert blocks[0] == 2 and chunks[0] == 2
        assert np.prod(blocks) * 4 <= 32768 * 0.8 + 1
        # chunks never exceed the image
        for ch, im in zip(chunks[1:], (1, 512, 512)):
            assert ch <= im

    def test_3d_patch(self):
        blocks, chunks = comp_blosc2_params(
            (1, 128, 128, 128), (64, 64, 64), bytes_per_pixel=4)
        assert len(blocks) == 4 and len(chunks) == 4
        assert np.prod(blocks) * 4 <= 32768 * 0.8 + 1
        # chunk stays within ~1.5x of the patch on average
        assert np.mean(np.array(chunks[1:]) / np.array([64, 64, 64])) <= 1.6

    def test_small_image_clipped(self):
        blocks, chunks = comp_blosc2_params((1, 1, 16, 16), (32, 32))
        assert blocks[2] <= 16 and blocks[3] <= 16
        assert chunks[2] <= 16 and chunks[3] <= 16
