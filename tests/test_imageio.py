"""NIfTI I/O: endianness + orientation handling.

Capability targets: ref dinounet/imageio/nibabel_reader_writer.py:100-160
(reorient-to-RAS reader) and simpleitk_reader_writer.py:22-90 (direction-aware
geometry). A volume stored with flipped/permuted voxel axes must read to the
same canonical array + spacing as its RAS twin, and segmentations written back
must overlay the source voxel-for-voxel.
"""

import gzip
import struct

import numpy as np
import pytest

from dinounet_tpu.imageio.nifti import (
    NiftiIO,
    read_nifti,
    reorient_from_canonical,
    write_nifti,
)

_HDR = 348


def _write_raw_nifti(fname, arr_zyx, sform_rows, en="<", dtype=np.float32):
    """Write a NIfTI-1 file with an explicit sform, in either byte order."""
    arr = np.ascontiguousarray(arr_zyx.astype(dtype))
    shape_f = arr.shape[::-1]
    hdr = bytearray(_HDR)
    struct.pack_into(en + "i", hdr, 0, _HDR)
    dim = [3] + [int(s) for s in shape_f] + [1] * (7 - 3)
    struct.pack_into(en + "8h", hdr, 40, *dim)
    code = {np.dtype(np.float32): 16, np.dtype(np.uint8): 2,
            np.dtype(np.int16): 4}[np.dtype(dtype)]
    struct.pack_into(en + "h", hdr, 70, code)
    struct.pack_into(en + "h", hdr, 72, np.dtype(dtype).itemsize * 8)
    spac = [float(np.linalg.norm([r[j] for r in sform_rows])) for j in range(3)]
    struct.pack_into(en + "8f", hdr, 76, 1.0, *spac, 1.0, 1.0, 1.0, 1.0)
    struct.pack_into(en + "f", hdr, 108, 352.0)
    struct.pack_into(en + "f", hdr, 112, 1.0)
    struct.pack_into(en + "f", hdr, 116, 0.0)
    struct.pack_into(en + "h", hdr, 254, 1)  # sform_code
    for i, row in enumerate(sform_rows):
        struct.pack_into(en + "4f", hdr, 280 + 16 * i, *row)
    hdr[344:348] = b"n+1\x00"
    data = arr
    if en == ">":
        data = data.astype(data.dtype.newbyteorder(">"))
    with gzip.open(fname, "wb") as f:
        f.write(bytes(hdr))
        f.write(b"\x00" * 4)
        f.write(data.tobytes())


def _ras_rows(sx, sy, sz):
    return ([sx, 0, 0, 0], [0, sy, 0, 0], [0, 0, sz, 0])


class TestEndianness:
    def test_big_endian_reads_same_as_little(self, tmp_path, rng):
        arr = rng.standard_normal((4, 5, 6)).astype(np.float32)
        le = str(tmp_path / "le.nii.gz")
        be = str(tmp_path / "be.nii.gz")
        _write_raw_nifti(le, arr, _ras_rows(1.0, 2.0, 3.0), en="<")
        _write_raw_nifti(be, arr, _ras_rows(1.0, 2.0, 3.0), en=">")
        a_le, p_le = NiftiIO().read_images((le,))
        a_be, p_be = NiftiIO().read_images((be,))
        np.testing.assert_array_equal(a_le, a_be)
        assert p_le["spacing"] == pytest.approx(p_be["spacing"])

    def test_big_endian_seg_roundtrip(self, tmp_path, rng):
        seg = rng.integers(0, 3, (3, 4, 5)).astype(np.uint8)
        be = str(tmp_path / "be.nii.gz")
        _write_raw_nifti(be, seg, _ras_rows(1.0, 1.0, 1.0), en=">", dtype=np.uint8)
        io = NiftiIO()
        arr, props = io.read_seg(be)
        np.testing.assert_array_equal(arr[0], seg)
        out = str(tmp_path / "out.nii.gz")
        io.write_seg(arr[0].astype(np.uint8), out, props)
        # written in the template's (big-endian) byte order, reads back equal
        back, _ = io.read_seg(out)
        np.testing.assert_array_equal(back[0], seg)


class TestReorientation:
    @pytest.mark.parametrize("perm_f,signs", [
        ((0, 1, 2), (-1, -1, 1)),   # LPS (flips only)
        ((1, 0, 2), (1, 1, 1)),     # x/y axes swapped
        ((2, 0, 1), (-1, 1, -1)),   # full permutation + flips
    ])
    def test_non_ras_reads_like_ras_twin(self, tmp_path, rng, perm_f, signs):
        # canonical content with distinct per-axis spacing
        canon = rng.standard_normal((4, 5, 6)).astype(np.float32)  # (z, y, x)
        spacing_world = (1.0, 2.0, 3.0)  # (sx, sy, sz)

        ras = str(tmp_path / "ras.nii.gz")
        _write_raw_nifti(ras, canon, _ras_rows(*spacing_world))

        # store the same world content in a permuted/flipped voxel order with
        # the matching sform: disk voxel axis j points along world axis w
        # (where perm_f[w] = j) with sign signs[j]
        disk = reorient_from_canonical(canon, perm_f, signs)
        world_of = [0, 0, 0]
        for w, j in enumerate(perm_f):
            world_of[j] = w
        rows = [[0.0, 0.0, 0.0, 0.0] for _ in range(3)]
        for j in range(3):
            w = world_of[j]
            rows[w][j] = signs[j] * spacing_world[w]
        alt = str(tmp_path / "alt.nii.gz")
        _write_raw_nifti(alt, disk, rows)

        a_ras, p_ras = NiftiIO().read_images((ras,))
        a_alt, p_alt = NiftiIO().read_images((alt,))
        np.testing.assert_array_equal(a_ras, a_alt)
        assert p_alt["spacing"] == pytest.approx(p_ras["spacing"])
        # spacing is (z, y, x) = (sz, sy, sx)
        assert p_ras["spacing"] == pytest.approx([3.0, 2.0, 1.0])

    def test_seg_written_back_in_source_orientation(self, tmp_path, rng):
        canon_img = rng.standard_normal((4, 5, 6)).astype(np.float32)
        perm_f, signs = (1, 2, 0), (-1, 1, -1)
        disk = reorient_from_canonical(canon_img, perm_f, signs)
        world_of = [0, 0, 0]
        for w, j in enumerate(perm_f):
            world_of[j] = w
        rows = [[0.0, 0.0, 0.0, 0.0] for _ in range(3)]
        for j in range(3):
            rows[world_of[j]][j] = signs[j] * 1.0
        src = str(tmp_path / "src.nii.gz")
        _write_raw_nifti(src, disk, rows)

        io = NiftiIO()
        img, props = io.read_images((src,))
        # segment in canonical space (threshold), write back
        seg_canon = (img[0] > 0).astype(np.uint8)
        out = str(tmp_path / "seg.nii.gz")
        io.write_seg(seg_canon, out, props)

        # raw disk array of the written seg must overlay the raw disk image
        raw_seg, hdr_seg = read_nifti(out)
        np.testing.assert_array_equal(raw_seg, (disk > 0).astype(np.uint8))
        # and its sform must equal the source's (geometry preserved verbatim)
        np.testing.assert_allclose(
            hdr_seg["affine"], read_nifti(src)[1]["affine"], atol=1e-6)

    def test_identity_orientation_unchanged(self, tmp_path, rng):
        # writer-created files (positive diagonal sform) must read unchanged
        arr = rng.standard_normal((3, 4, 5)).astype(np.float32)
        f = str(tmp_path / "x.nii.gz")
        write_nifti(f, arr, (1.0, 1.5, 2.0))
        got, props = NiftiIO().read_images((f,))
        np.testing.assert_allclose(got[0], arr, rtol=1e-6)
        assert props["spacing"] == pytest.approx([2.0, 1.5, 1.0])


_HDR2 = 540


def _write_raw_nifti2(fname, arr_zyx, sform_rows, en="<", dtype=np.float32):
    """Write a NIfTI-2 (540-byte header) file with an explicit sform."""
    arr = np.ascontiguousarray(arr_zyx.astype(dtype))
    shape_f = arr.shape[::-1]
    hdr = bytearray(_HDR2)
    struct.pack_into(en + "i", hdr, 0, _HDR2)
    hdr[4:12] = b"n+2\x00\r\n\x1a\n"
    code = {np.dtype(np.float32): 16, np.dtype(np.uint8): 2,
            np.dtype(np.int16): 4}[np.dtype(dtype)]
    struct.pack_into(en + "h", hdr, 12, code)
    struct.pack_into(en + "h", hdr, 14, np.dtype(dtype).itemsize * 8)
    dim = [3] + [int(s) for s in shape_f] + [1] * (7 - 3)
    struct.pack_into(en + "8q", hdr, 16, *dim)
    spac = [float(np.linalg.norm([r[j] for r in sform_rows])) for j in range(3)]
    struct.pack_into(en + "8d", hdr, 104, 1.0, *spac, 1.0, 1.0, 1.0, 1.0)
    struct.pack_into(en + "q", hdr, 168, 544)  # vox_offset
    struct.pack_into(en + "d", hdr, 176, 1.0)  # scl_slope
    struct.pack_into(en + "d", hdr, 184, 0.0)  # scl_inter
    struct.pack_into(en + "i", hdr, 348, 1)  # sform_code
    for i, (off) in enumerate((400, 432, 464)):
        struct.pack_into(en + "4d", hdr, off, *sform_rows[i])
    data = arr
    if en == ">":
        data = data.astype(data.dtype.newbyteorder(">"))
    with gzip.open(fname, "wb") as f:
        f.write(bytes(hdr))
        f.write(b"\x00" * 4)
        f.write(data.tobytes())


class TestNifti2:
    """NIfTI-2 (540-byte header) parity with NIfTI-1 — capability target:
    the reference's nibabel reader transparently loads NIfTI-2
    (ref dinounet/imageio/nibabel_reader_writer.py:24-98)."""

    def test_reads_same_as_nifti1_twin(self, tmp_path, rng):
        arr = rng.standard_normal((4, 5, 6)).astype(np.float32)
        f1 = str(tmp_path / "v1.nii.gz")
        f2 = str(tmp_path / "v2.nii.gz")
        _write_raw_nifti(f1, arr, _ras_rows(1.0, 2.0, 3.0))
        _write_raw_nifti2(f2, arr, _ras_rows(1.0, 2.0, 3.0))
        a1, p1 = NiftiIO().read_images((f1,))
        a2, p2 = NiftiIO().read_images((f2,))
        np.testing.assert_array_equal(a1, a2)
        assert p2["spacing"] == pytest.approx(p1["spacing"])

    @pytest.mark.parametrize("en", ["<", ">"])
    def test_both_byte_orders(self, tmp_path, rng, en):
        arr = rng.standard_normal((3, 4, 5)).astype(np.float32)
        f = str(tmp_path / "v2.nii.gz")
        _write_raw_nifti2(f, arr, _ras_rows(1.0, 1.5, 2.0), en=en)
        got, hdr = read_nifti(f)
        assert hdr["version"] == 2
        assert hdr["endianness"] == en
        np.testing.assert_allclose(got, arr, rtol=1e-6)

    def test_seg_roundtrip_stays_nifti2(self, tmp_path, rng):
        seg = rng.integers(0, 3, (3, 4, 5)).astype(np.uint8)
        src = str(tmp_path / "src.nii.gz")
        _write_raw_nifti2(src, seg, _ras_rows(1.0, 1.0, 1.0), en=">",
                          dtype=np.uint8)
        io = NiftiIO()
        arr, props = io.read_seg(src)
        np.testing.assert_array_equal(arr[0], seg)
        out = str(tmp_path / "out.nii.gz")
        io.write_seg(arr[0].astype(np.uint8), out, props)
        back, hdr = read_nifti(out)
        # written in the template's format: NIfTI-2, big-endian
        assert hdr["version"] == 2
        assert hdr["endianness"] == ">"
        np.testing.assert_array_equal(back, seg)

    def test_non_ras_nifti2_reorients(self, tmp_path, rng):
        canon = rng.standard_normal((4, 5, 6)).astype(np.float32)
        perm_f, signs = (1, 0, 2), (-1, 1, 1)
        disk = reorient_from_canonical(canon, perm_f, signs)
        world_of = [0, 0, 0]
        for w, j in enumerate(perm_f):
            world_of[j] = w
        spacing_world = (1.0, 2.0, 3.0)
        rows = [[0.0, 0.0, 0.0, 0.0] for _ in range(3)]
        for j in range(3):
            w = world_of[j]
            rows[w][j] = signs[j] * spacing_world[w]
        f = str(tmp_path / "alt.nii.gz")
        _write_raw_nifti2(f, disk, rows)
        got, props = NiftiIO().read_images((f,))
        np.testing.assert_array_equal(got[0], canon)
        assert props["spacing"] == pytest.approx([3.0, 2.0, 1.0])
        # and write-back restores disk order with the source affine
        out = str(tmp_path / "seg.nii.gz")
        NiftiIO().write_seg((got[0] > 0).astype(np.uint8), out, props)
        raw_seg, hdr_seg = read_nifti(out)
        assert hdr_seg["version"] == 2
        np.testing.assert_array_equal(raw_seg, (disk > 0).astype(np.uint8))
        np.testing.assert_allclose(
            hdr_seg["affine"], read_nifti(f)[1]["affine"], atol=1e-6)


class TestQform:
    @staticmethod
    def _write_qform_file(fname, arr, pixdims, qfac, quat=(0.0, 0.0, 0.0)):
        hdr = bytearray(_HDR)
        struct.pack_into("<i", hdr, 0, _HDR)
        shape_f = arr.shape[::-1]
        struct.pack_into("<8h", hdr, 40, 3, *shape_f, 1, 1, 1, 1)
        struct.pack_into("<h", hdr, 70, 16)
        struct.pack_into("<h", hdr, 72, 32)
        struct.pack_into("<8f", hdr, 76, qfac, *pixdims, 1.0, 1.0, 1.0, 1.0)
        struct.pack_into("<f", hdr, 108, 352.0)
        struct.pack_into("<f", hdr, 112, 1.0)
        struct.pack_into("<h", hdr, 252, 1)  # qform_code, no sform
        struct.pack_into("<3f", hdr, 256, *quat)
        hdr[344:348] = b"n+1\x00"
        with gzip.open(fname, "wb") as f:
            f.write(bytes(hdr))
            f.write(b"\x00" * 4)
            f.write(np.ascontiguousarray(arr.astype(np.float32)).tobytes())

    def test_qfac_negative_roundtrip_preserves_affine(self, tmp_path, rng):
        """qform-only source with qfac=-1 (flipped k axis, e.g. FSL LAS):
        the written seg must keep the source affine — including qfac."""
        img = rng.standard_normal((4, 5, 6)).astype(np.float32)
        src = str(tmp_path / "las.nii.gz")
        self._write_qform_file(src, img, (1.0, 2.0, 3.0), qfac=-1.0)

        io = NiftiIO()
        data, props = io.read_images((src,))
        assert props["spacing"] == pytest.approx([3.0, 2.0, 1.0])
        # canonicalization must have flipped the k (z) axis
        perm_f, signs = props["nifti_orientation"]
        assert signs[2] == -1

        out = str(tmp_path / "seg.nii.gz")
        io.write_seg((data[0] > 0).astype(np.uint8), out, props)
        src_affine = read_nifti(src)[1]["affine"]
        seg_affine = read_nifti(out)[1]["affine"]
        np.testing.assert_allclose(seg_affine, src_affine, atol=1e-5)
        # and the voxel data overlays the source disk-order image
        raw_seg = read_nifti(out)[0]
        np.testing.assert_array_equal(raw_seg, (img > 0).astype(np.uint8))

    def test_qform_only_identity_rotation(self, tmp_path, rng):
        # qform with unit quaternion (no rotation) = RAS; spacing from pixdim
        arr = rng.standard_normal((3, 4, 5)).astype(np.float32)
        fname = str(tmp_path / "q.nii.gz")
        hdr = bytearray(_HDR)
        struct.pack_into("<i", hdr, 0, _HDR)
        struct.pack_into("<8h", hdr, 40, 3, 5, 4, 3, 1, 1, 1, 1)
        struct.pack_into("<h", hdr, 70, 16)
        struct.pack_into("<h", hdr, 72, 32)
        struct.pack_into("<8f", hdr, 76, 1.0, 1.0, 2.0, 3.0, 1.0, 1.0, 1.0, 1.0)
        struct.pack_into("<f", hdr, 108, 352.0)
        struct.pack_into("<f", hdr, 112, 1.0)
        struct.pack_into("<h", hdr, 252, 1)  # qform_code, no sform
        struct.pack_into("<3f", hdr, 256, 0.0, 0.0, 0.0)  # b=c=d=0
        hdr[344:348] = b"n+1\x00"
        with gzip.open(fname, "wb") as f:
            f.write(bytes(hdr))
            f.write(b"\x00" * 4)
            f.write(arr.tobytes())
        got, props = NiftiIO().read_images((fname,))
        np.testing.assert_allclose(got[0], arr, rtol=1e-6)
        assert props["spacing"] == pytest.approx([3.0, 2.0, 1.0])
