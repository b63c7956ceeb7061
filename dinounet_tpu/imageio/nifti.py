"""Self-contained NIfTI-1 reader/writer (no nibabel/SimpleITK in this image).

Covers the capability of ref: dinounet/imageio/simpleitk_reader_writer.py:22 and
nibabel_reader_writer.py:24 for .nii/.nii.gz: header parsing (dim, datatype,
pixdim, scl slope/intercept, vox_offset), array returned in (c, z, y, x) axis
order with spacing aligned to those axes (the nnU-Net convention — array axes
and spacing entries correspond), and round-trip writing that preserves the
original header geometry (qform/sform) by stashing the raw header bytes in the
properties dict.
"""

import gzip
import struct
from typing import List, Tuple, Union

import numpy as np

from dinounet_tpu.imageio.base import BaseReaderWriter

_DTYPES = {
    2: np.uint8, 4: np.int16, 8: np.int32, 16: np.float32, 64: np.float64,
    256: np.int8, 512: np.uint16, 768: np.uint32, 1024: np.int64, 1280: np.uint64,
}
_DTYPE_CODES = {np.dtype(v): k for k, v in _DTYPES.items()}

_HDR_SIZE = 348


def _open(fname: str, mode: str = "rb"):
    if fname.endswith(".gz"):
        return gzip.open(fname, mode)
    return open(fname, mode)


def read_nifti(fname: str) -> Tuple[np.ndarray, dict]:
    """Returns (array with axes as stored on disk reversed to C-order (z, y, x),
    header dict incl. raw bytes)."""
    with _open(fname) as f:
        raw = f.read()
    hdr = raw[:_HDR_SIZE]
    sizeof_hdr = struct.unpack_from("<i", hdr, 0)[0]
    if sizeof_hdr != _HDR_SIZE:
        raise RuntimeError(f"{fname}: not a little-endian NIfTI-1 file (sizeof_hdr={sizeof_hdr})")
    dim = struct.unpack_from("<8h", hdr, 40)
    ndim = dim[0]
    shape_f = dim[1 : 1 + ndim]  # Fortran-order shape (x, y, z, [t])
    datatype = struct.unpack_from("<h", hdr, 70)[0]
    pixdim = struct.unpack_from("<8f", hdr, 76)
    vox_offset = int(struct.unpack_from("<f", hdr, 108)[0])
    scl_slope = struct.unpack_from("<f", hdr, 112)[0]
    scl_inter = struct.unpack_from("<f", hdr, 116)[0]
    magic = hdr[344:348]
    if magic[:3] not in (b"n+1", b"ni1"):
        raise RuntimeError(f"{fname}: bad NIfTI magic {magic!r}")
    if datatype not in _DTYPES:
        raise RuntimeError(f"{fname}: unsupported NIfTI datatype {datatype}")
    dtype = np.dtype(_DTYPES[datatype])

    count = int(np.prod(shape_f))
    data = np.frombuffer(raw, dtype=dtype, count=count, offset=vox_offset)
    # Fortran-ordered on disk; reshape with reversed axes to get C-order (…z, y, x)
    arr = data.reshape(shape_f[::-1])
    if scl_slope not in (0.0, 1.0) or scl_inter != 0.0:
        slope = scl_slope if scl_slope != 0.0 else 1.0
        arr = arr * slope + scl_inter

    header = {
        "raw_header": hdr,
        "shape_fortran": tuple(int(s) for s in shape_f),
        "pixdim": tuple(float(p) for p in pixdim),
        "datatype": datatype,
    }
    return arr, header


def _build_header(shape_f, spacing_xyz, dtype: np.dtype, template: bytes = None) -> bytes:
    """Minimal valid NIfTI-1 header; reuses geometry from `template` if given."""
    hdr = bytearray(template) if template is not None else bytearray(_HDR_SIZE)
    if template is None:
        struct.pack_into("<i", hdr, 0, _HDR_SIZE)
        hdr[38] = ord("r")  # dim_info irrelevant; regular
        # sform: identity scaled by spacing
        struct.pack_into("<h", hdr, 254, 1)  # sform_code = 1
        srows = (
            [float(spacing_xyz[0]), 0, 0, 0],
            [0, float(spacing_xyz[1]), 0, 0],
            [0, 0, float(spacing_xyz[2]), 0],
        )
        for i, row in enumerate(srows):
            struct.pack_into("<4f", hdr, 280 + 16 * i, *row)
        hdr[344:348] = b"n+1\x00"
    ndim = len(shape_f)
    dim = [ndim] + [int(s) for s in shape_f] + [1] * (7 - ndim)
    struct.pack_into("<8h", hdr, 40, *dim)
    code = _DTYPE_CODES[np.dtype(dtype)]
    struct.pack_into("<h", hdr, 70, code)
    struct.pack_into("<h", hdr, 72, np.dtype(dtype).itemsize * 8)
    pixdim = [1.0] + [float(s) for s in spacing_xyz] + [1.0] * (7 - ndim)
    struct.pack_into("<8f", hdr, 76, *pixdim[:8])
    struct.pack_into("<f", hdr, 108, 352.0)  # vox_offset
    struct.pack_into("<f", hdr, 112, 1.0)  # scl_slope
    struct.pack_into("<f", hdr, 116, 0.0)  # scl_inter
    return bytes(hdr)


def write_nifti(fname: str, arr: np.ndarray, spacing_xyz, template_header: bytes = None):
    """arr is C-ordered (…, z, y, x); stored Fortran-ordered (x fastest)."""
    shape_f = arr.shape[::-1]
    hdr = _build_header(shape_f, spacing_xyz, arr.dtype, template_header)
    with _open(fname, "wb") as f:
        f.write(hdr)
        f.write(b"\x00" * 4)  # extension flag
        f.write(np.ascontiguousarray(arr).tobytes())


class NiftiIO(BaseReaderWriter):
    """nnU-Net-convention NIfTI IO (see module docstring)."""

    supported_file_endings = [".nii.gz", ".nii"]

    def read_images(self, image_fnames: Union[List[str], Tuple[str, ...]]) -> Tuple[np.ndarray, dict]:
        images, spacings, headers = [], [], []
        for f in image_fnames:
            arr, hdr = read_nifti(f)
            pixdim = hdr["pixdim"]
            ndim_file = len(hdr["shape_fortran"])
            if arr.ndim == 2:
                sp = (max(pixdim[1:3]) * 999.0, float(pixdim[2]), float(pixdim[1]))
                images.append(arr[None, None])
            elif arr.ndim == 3:
                sp = (float(pixdim[3]), float(pixdim[2]), float(pixdim[1]))
                images.append(arr[None])
            elif arr.ndim == 4:
                sp = (float(pixdim[3]), float(pixdim[2]), float(pixdim[1]))
                images.append(np.moveaxis(arr, 0, 0))  # (t, z, y, x) = channels first
            else:
                raise RuntimeError(f"Unexpected ndim {arr.ndim} in {f}")
            spacings.append(tuple(abs(s) for s in sp))
            headers.append(hdr)

        if not self._check_all_same([i.shape for i in images]):
            raise RuntimeError(f"Input images have mismatched shapes: {[i.shape for i in images]}")
        if not self._check_all_same(spacings):
            raise RuntimeError(f"Input images have mismatched spacings: {spacings}")

        stacked = np.vstack(images).astype(np.float32)
        props = {
            "spacing": list(spacings[0]),
            "nifti_header": headers[0]["raw_header"],
        }
        return stacked, props

    def read_seg(self, seg_fname: str) -> Tuple[np.ndarray, dict]:
        return self.read_images((seg_fname,))

    def write_seg(self, seg: np.ndarray, output_fname: str, properties: dict) -> None:
        assert seg.ndim == 3, "segmentation must be 3d; provide 2d as shape (1, x, y)"
        spacing = properties["spacing"]
        spacing_xyz = [float(spacing[2]), float(spacing[1]), float(spacing[0])]
        template = properties.get("nifti_header")
        arr = seg
        if template is not None:
            # write with the source's dimensionality (2d sources were read as (1,x,y))
            tpl_ndim = struct.unpack_from("<8h", template, 40)[0]
            if tpl_ndim == 2:
                arr = seg[0]
                spacing_xyz = spacing_xyz[:2]
        write_nifti(
            output_fname, arr.astype(np.uint8 if seg.max() < 255 else np.uint16),
            spacing_xyz, template_header=template,
        )
