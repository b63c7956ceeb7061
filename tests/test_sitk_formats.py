"""NRRD / MetaImage reader-writer tests.

Mirrors the NIfTI round-trip/spacing/direction tests for the formats the
reference's SimpleITKIO reads (ref: dinounet/imageio/simpleitk_reader_writer
.py:23-27). Includes the preprocessing-equivalence check: a .nrrd dataset
must preprocess identically to its .nii.gz twin.
"""

import numpy as np
import pytest

from dinounet_tpu.imageio.nifti import NiftiIO, write_nifti
from dinounet_tpu.imageio.sitk_formats import (
    SimpleITKIO,
    SitkFormatsIO,
    read_mha,
    read_nrrd,
    write_mha,
    write_nrrd,
)


def _vol(rng, shape=(5, 7, 9)):
    return (rng.normal(size=shape) * 100).astype(np.float32)


class TestNrrdRoundTrip:
    def test_raw_and_gzip_roundtrip(self, tmp_path, rng):
        arr = _vol(rng)
        for comp in (False, True):
            p = str(tmp_path / f"a_{comp}.nrrd")
            write_nrrd(p, arr, (1.5, 2.0, 2.5), (1.0, -2.0, 3.0),
                       compressed=comp)
            back, header = read_nrrd(p)
            np.testing.assert_array_equal(back, arr)

    def test_io_properties_and_spacing_order(self, tmp_path, rng):
        # spacing is (x, y, z) on disk; nnU-Net properties use (z, y, x)
        arr = _vol(rng, (4, 6, 8))  # (z, y, x)
        p = str(tmp_path / "a.nrrd")
        write_nrrd(p, arr, (1.5, 2.0, 2.5), (10.0, 20.0, 30.0))
        data, props = SitkFormatsIO().read_images((p,))
        assert data.shape == (1, 4, 6, 8)
        np.testing.assert_allclose(props["spacing"], [2.5, 2.0, 1.5])
        np.testing.assert_allclose(props["sitk_stuff"]["spacing"],
                                   (1.5, 2.0, 2.5))
        np.testing.assert_allclose(props["sitk_stuff"]["origin"],
                                   (10.0, 20.0, 30.0))
        np.testing.assert_allclose(
            np.asarray(props["sitk_stuff"]["direction"]).reshape(3, 3),
            np.eye(3))

    def test_direction_preserved(self, tmp_path, rng):
        arr = _vol(rng)
        # flip x axis, swap y/z: a legal direction-cosine matrix
        d = np.array([[-1, 0, 0], [0, 0, 1], [0, 1, 0]], np.float64)
        p = str(tmp_path / "a.nrrd")
        write_nrrd(p, arr, (1.0, 2.0, 3.0), (0, 0, 0), d.ravel())
        _, props = SitkFormatsIO().read_images((p,))
        np.testing.assert_allclose(
            np.asarray(props["sitk_stuff"]["direction"]).reshape(3, 3), d)
        # spacing stays positive regardless of cosine signs
        np.testing.assert_allclose(props["sitk_stuff"]["spacing"],
                                   (1.0, 2.0, 3.0))

    def test_int_dtypes(self, tmp_path, rng):
        for dt in (np.uint8, np.int16, np.uint16, np.int32):
            arr = rng.integers(0, 200, size=(3, 4, 5)).astype(dt)
            p = str(tmp_path / f"a_{np.dtype(dt).name}.nrrd")
            write_nrrd(p, arr, (1, 1, 1))
            back, _ = read_nrrd(p)
            assert back.dtype.newbyteorder("=") == np.dtype(dt)
            np.testing.assert_array_equal(back, arr)

    def test_seg_roundtrip(self, tmp_path, rng):
        seg = rng.integers(0, 4, size=(4, 6, 8)).astype(np.uint8)
        src = str(tmp_path / "seg.nrrd")
        write_nrrd(src, seg, (1.0, 1.5, 2.0), (5, 6, 7))
        io = SitkFormatsIO()
        data, props = io.read_seg(src)
        out = str(tmp_path / "seg_out.nrrd")
        io.write_seg(data[0].astype(np.uint8), out, props)
        back, props2 = io.read_seg(out)
        np.testing.assert_array_equal(back[0], seg)
        np.testing.assert_allclose(props2["spacing"], props["spacing"])


class TestMhaRoundTrip:
    def test_raw_and_compressed_roundtrip(self, tmp_path, rng):
        arr = _vol(rng)
        for comp in (False, True):
            p = str(tmp_path / f"a_{comp}.mha")
            write_mha(p, arr, (0.5, 0.75, 1.25), (-1, -2, -3),
                      compressed=comp)
            back, header = read_mha(p)
            np.testing.assert_array_equal(back, arr)
            np.testing.assert_allclose(header["spacing"], (0.5, 0.75, 1.25))

    def test_io_properties(self, tmp_path, rng):
        arr = _vol(rng, (4, 6, 8))
        p = str(tmp_path / "a.mha")
        d = np.array([[0, 1, 0], [1, 0, 0], [0, 0, -1]], np.float64)
        write_mha(p, arr, (1.0, 2.0, 4.0), (9, 8, 7), d.ravel())
        data, props = SitkFormatsIO().read_images((p,))
        assert data.shape == (1, 4, 6, 8)
        np.testing.assert_allclose(props["spacing"], [4.0, 2.0, 1.0])
        np.testing.assert_allclose(
            np.asarray(props["sitk_stuff"]["direction"]).reshape(3, 3), d)

    def test_seg_roundtrip(self, tmp_path, rng):
        seg = rng.integers(0, 3, size=(4, 6, 8)).astype(np.uint8)
        src = str(tmp_path / "seg.mha")
        write_mha(src, seg, (1.0, 1.0, 2.0))
        io = SitkFormatsIO()
        data, props = io.read_seg(src)
        out = str(tmp_path / "seg_out.mha")
        io.write_seg(data[0].astype(np.uint8), out, props)
        back, _ = io.read_seg(out)
        np.testing.assert_array_equal(back[0], seg)


class TestTwoD:
    def test_2d_nrrd_dummy_spacing(self, tmp_path, rng):
        arr = _vol(rng, (6, 8))
        p = str(tmp_path / "a.nrrd")
        write_nrrd(p, arr, (1.5, 2.0))
        data, props = SitkFormatsIO().read_images((p,))
        assert data.shape == (1, 1, 6, 8)
        assert props["spacing"][0] > 900  # 999 * max_spacing convention
        np.testing.assert_allclose(props["spacing"][1:], [2.0, 1.5])


class TestSimpleITKIODispatch:
    def test_covers_reference_ending_set(self):
        for e in (".nii.gz", ".nrrd", ".mha"):
            assert e in SimpleITKIO.supported_file_endings

    def test_nifti_delegation_matches_niftiio(self, tmp_path, rng):
        arr = _vol(rng)
        p = str(tmp_path / "a.nii.gz")
        write_nifti(p, arr, (1.0, 2.0, 3.0))
        a1, p1 = SimpleITKIO().read_images((p,))
        a2, p2 = NiftiIO().read_images((p,))
        np.testing.assert_array_equal(a1, a2)
        np.testing.assert_allclose(p1["spacing"], p2["spacing"])

    def test_registry_resolution(self):
        from dinounet_tpu.imageio.reader_writer_registry import (
            determine_reader_writer_from_file_ending,
        )

        assert determine_reader_writer_from_file_ending(".nrrd") \
            is SitkFormatsIO
        assert determine_reader_writer_from_file_ending(".mha") \
            is SitkFormatsIO


class TestPreprocessEquivalence:
    """A .nrrd dataset preprocesses identically to its .nii.gz twin
    (VERDICT r2 item 8's done-criterion)."""

    @pytest.mark.parametrize("ext", [".nrrd", ".mha"])
    def test_preprocessed_case_matches_nifti_twin(self, tmp_path, rng, ext):
        from dinounet_tpu.imageio.reader_writer_registry import (
            determine_reader_writer_from_file_ending,
        )
        from dinounet_tpu.preprocessing.preprocessor import (
            DefaultPreprocessor,
        )

        img = (rng.normal(size=(6, 24, 24)) * 50 + 100).astype(np.float32)
        seg = (img > 120).astype(np.uint8)
        spacing_xyz = (1.0, 1.5, 2.0)

        paths = {}
        for e, writer in ((".nii.gz", write_nifti), (ext, {
                ".nrrd": write_nrrd, ".mha": write_mha}[ext])):
            ip = str(tmp_path / f"img{e}")
            sp = str(tmp_path / f"seg{e}")
            writer(ip, img, spacing_xyz)
            writer(sp, seg, spacing_xyz)
            paths[e] = (ip, sp)

        plans = {
            "dataset_name": "Dataset000_t", "plans_name": "p",
            "original_median_spacing_after_transp": [2.0, 1.5, 1.0],
            "image_reader_writer": "SimpleITKIO",
            "transpose_forward": [0, 1, 2], "transpose_backward": [0, 1, 2],
            "configurations": {"3d_fullres": {
                "data_identifier": "p_3d",
                "preprocessor_name": "DefaultPreprocessor",
                "batch_size": 2, "patch_size": [4, 16, 16],
                "spacing": [2.0, 1.5, 1.0],
                "median_image_size_in_voxels": [6, 24, 24],
                "normalization_schemes": ["ZScoreNormalization"],
                "use_mask_for_norm": [False],
                "resampling_fn_data": "resample_data_or_seg_to_shape",
                "resampling_fn_data_kwargs": {
                    "is_seg": False, "order": 3, "order_z": 0,
                    "force_separate_z": None},
                "resampling_fn_seg": "resample_data_or_seg_to_shape",
                "resampling_fn_seg_kwargs": {
                    "is_seg": True, "order": 1, "order_z": 0,
                    "force_separate_z": None},
                "resampling_fn_probabilities":
                    "resample_data_or_seg_to_shape",
                "resampling_fn_probabilities_kwargs": {
                    "is_seg": False, "order": 1, "order_z": 0,
                    "force_separate_z": None},
            }},
            "foreground_intensity_properties_per_channel": {
                "0": {"mean": 100.0, "std": 50.0, "median": 100.0,
                      "min": 0.0, "max": 250.0, "percentile_00_5": 1.0,
                      "percentile_99_5": 240.0}},
            "label_manager": "LabelManager",
        }
        dataset_json = {
            "channel_names": {"0": "ch"}, "labels": {"background": 0,
                                                     "fg": 1},
            "numTraining": 1, "file_ending": ".nii.gz",
        }

        from dinounet_tpu.utilities.plans_handler import PlansManager

        del determine_reader_writer_from_file_ending  # resolved via plans
        results = {}
        for e, (ip, sp) in paths.items():
            # the plans' "SimpleITKIO" resolves to the dispatcher, which
            # covers every extension of this test — exactly the reference
            # flow for .nrrd/.mha datasets
            pm = PlansManager(dict(plans))
            cm = pm.get_configuration("3d_fullres")
            pp = DefaultPreprocessor(verbose=False)
            data, pseg, props = pp.run_case(
                [ip], sp, pm, cm, dict(dataset_json, file_ending=e))
            results[e] = (np.asarray(data), np.asarray(pseg))

        d_nii, s_nii = results[".nii.gz"]
        d_alt, s_alt = results[ext]
        np.testing.assert_allclose(d_alt, d_nii, rtol=1e-6, atol=1e-6)
        np.testing.assert_array_equal(s_alt, s_nii)
