"""Self-contained NIfTI-1 reader/writer (no nibabel/SimpleITK in this image).

Covers the capability of ref: dinounet/imageio/simpleitk_reader_writer.py:22 and
nibabel_reader_writer.py:24,100 for .nii/.nii.gz: header parsing (dim, datatype,
pixdim, scl slope/intercept, vox_offset, qform/sform) in either byte order,
**reorientation to the closest canonical (RAS) axis order** — the capability of
the reference's NibabelIOWithReorient (ref nibabel_reader_writer.py:100-160),
so mixed-orientation datasets land in one consistent (z, y, x) frame with
correctly-assigned per-axis spacing — and round-trip writing that restores the
original orientation and header geometry (the written segmentation overlays the
source image voxel-for-voxel, like the reference's write path which saves with
the original affine).

Array contract (nnU-Net convention, ref base_reader_writer.py:22-106):
(c, z, y, x) with spacing aligned to (z, y, x).
"""

import gzip
import struct
from typing import List, Optional, Tuple, Union

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


def _header_endianness(hdr: bytes, fname: str = "<bytes>") -> str:
    """Detect '<' (little) or '>' (big) from sizeof_hdr."""
    if struct.unpack_from("<i", hdr, 0)[0] == _HDR_SIZE:
        return "<"
    if struct.unpack_from(">i", hdr, 0)[0] == _HDR_SIZE:
        return ">"
    raise RuntimeError(
        f"{fname}: not a NIfTI-1 file (sizeof_hdr != 348 in either byte order)")


def _parse_affine(hdr: bytes, en: str) -> np.ndarray:
    """Voxel-index (i,j,k) -> world RAS (x,y,z) 4x4 affine from sform (code>0),
    else qform (quaternion), else the pixdim diagonal (NIfTI-1 §3 fallback)."""
    pixdim = struct.unpack_from(en + "8f", hdr, 76)
    qform_code = struct.unpack_from(en + "h", hdr, 252)[0]
    sform_code = struct.unpack_from(en + "h", hdr, 254)[0]
    if sform_code > 0:
        A = np.eye(4)
        for i, off in enumerate((280, 296, 312)):
            A[i, :] = struct.unpack_from(en + "4f", hdr, off)
        return A
    if qform_code > 0:
        b, c, d = struct.unpack_from(en + "3f", hdr, 256)
        ox, oy, oz = struct.unpack_from(en + "3f", hdr, 268)
        a2 = 1.0 - (b * b + c * c + d * d)
        a = np.sqrt(max(a2, 0.0))
        R = np.array([
            [a * a + b * b - c * c - d * d, 2 * (b * c - a * d), 2 * (b * d + a * c)],
            [2 * (b * c + a * d), a * a + c * c - b * b - d * d, 2 * (c * d - a * b)],
            [2 * (b * d - a * c), 2 * (c * d + a * b), a * a + d * d - b * b - c * c],
        ])
        qfac = -1.0 if pixdim[0] < 0 else 1.0
        scales = np.array([abs(pixdim[1]), abs(pixdim[2]), qfac * abs(pixdim[3])])
        A = np.eye(4)
        A[:3, :3] = R * scales[None, :]
        A[:3, 3] = (ox, oy, oz)
        return A
    A = np.eye(4)
    for j in range(3):
        A[j, j] = abs(pixdim[1 + j]) or 1.0
    return A


def _closest_canonical_ops(affine: np.ndarray):
    """Greedy io_orientation (as in nibabel): for each voxel axis j, the
    dominant world axis and its sign. Returns (perm_f, signs, spacing_f) where
    perm_f[w] = voxel axis whose direction is world axis w, signs[j] = +-1 for
    voxel axis j, and spacing_f[j] = voxel size along voxel axis j."""
    R = affine[:3, :3].astype(np.float64)
    spacing_f = np.linalg.norm(R, axis=0)
    Q = R.copy()
    world_of = [0, 1, 2]
    sign_of = [1, 1, 1]
    for _ in range(3):
        w, j = np.unravel_index(np.argmax(np.abs(Q)), Q.shape)
        world_of[j] = int(w)
        sign_of[j] = 1 if Q[w, j] >= 0 else -1
        Q[w, :] = 0.0
        Q[:, j] = 0.0
    perm_f = [0, 1, 2]
    for j, w in enumerate(world_of):
        perm_f[w] = j
    return tuple(perm_f), tuple(sign_of), spacing_f


def reorient_to_canonical(arr: np.ndarray, perm_f, signs) -> np.ndarray:
    """Reorder an (..., z, y, x) array so its voxel axes align with RAS
    (+x rightward ... stored as the usual reversed (z, y, x) C order)."""
    lead = arr.ndim - 3
    ax = list(range(lead)) + [lead + 2, lead + 1, lead + 0]
    a = arr.transpose(ax)  # fortran spatial order (..., i, j, k)
    for j in range(3):
        if signs[j] < 0:
            a = np.flip(a, axis=lead + j)
    a = a.transpose(list(range(lead)) + [lead + p for p in perm_f])
    return a.transpose(ax)


def reorient_from_canonical(arr: np.ndarray, perm_f, signs) -> np.ndarray:
    """Inverse of reorient_to_canonical."""
    lead = arr.ndim - 3
    ax = list(range(lead)) + [lead + 2, lead + 1, lead + 0]
    a = arr.transpose(ax)
    inv = [0, 0, 0]
    for w, p in enumerate(perm_f):
        inv[p] = w
    a = a.transpose(list(range(lead)) + [lead + inv[j] for j in range(3)])
    for j in range(3):
        if signs[j] < 0:
            a = np.flip(a, axis=lead + j)
    return a.transpose(ax)


def read_nifti(fname: str) -> Tuple[np.ndarray, dict]:
    """Returns (array with axes as stored on disk reversed to C-order (z, y, x),
    header dict incl. raw bytes, endianness, and the parsed affine). Handles
    both little- and big-endian files; data is returned in native byte order."""
    with _open(fname) as f:
        raw = f.read()
    hdr = raw[:_HDR_SIZE]
    en = _header_endianness(hdr, fname)
    dim = struct.unpack_from(en + "8h", hdr, 40)
    ndim = dim[0]
    shape_f = dim[1: 1 + ndim]  # Fortran-order shape (x, y, z, [t])
    datatype = struct.unpack_from(en + "h", hdr, 70)[0]
    pixdim = struct.unpack_from(en + "8f", hdr, 76)
    vox_offset = int(struct.unpack_from(en + "f", hdr, 108)[0])
    scl_slope = struct.unpack_from(en + "f", hdr, 112)[0]
    scl_inter = struct.unpack_from(en + "f", hdr, 116)[0]
    magic = hdr[344:348]
    if magic[:3] not in (b"n+1", b"ni1"):
        raise RuntimeError(f"{fname}: bad NIfTI magic {magic!r}")
    if datatype not in _DTYPES:
        raise RuntimeError(f"{fname}: unsupported NIfTI datatype {datatype}")
    dtype = np.dtype(_DTYPES[datatype]).newbyteorder(en)

    count = int(np.prod(shape_f))
    data = np.frombuffer(raw, dtype=dtype, count=count, offset=vox_offset)
    if en == ">":
        data = data.astype(data.dtype.newbyteorder("="))
    # Fortran-ordered on disk; reshape with reversed axes to get C-order (…z, y, x)
    arr = data.reshape(shape_f[::-1])
    if np.isfinite(scl_slope) and np.isfinite(scl_inter) and (
            scl_slope not in (0.0, 1.0) or scl_inter != 0.0):
        slope = scl_slope if scl_slope != 0.0 else 1.0
        arr = arr * slope + scl_inter

    header = {
        "raw_header": hdr,
        "endianness": en,
        "shape_fortran": tuple(int(s) for s in shape_f),
        "pixdim": tuple(float(p) for p in pixdim),
        "datatype": datatype,
        "affine": _parse_affine(hdr, en),
    }
    return arr, header


def _build_header(shape_f, spacing_xyz, dtype: np.dtype,
                  template: Optional[bytes] = None) -> bytes:
    """Minimal valid NIfTI-1 header; reuses geometry (qform/sform, byte order)
    from `template` if given."""
    en = _header_endianness(template) if template is not None else "<"
    hdr = bytearray(template) if template is not None else bytearray(_HDR_SIZE)
    if template is None:
        struct.pack_into(en + "i", hdr, 0, _HDR_SIZE)
        hdr[38] = ord("r")  # dim_info irrelevant; regular
        # sform: identity scaled by spacing
        struct.pack_into(en + "h", hdr, 254, 1)  # sform_code = 1
        srows = (
            [float(spacing_xyz[0]), 0, 0, 0],
            [0, float(spacing_xyz[1]), 0, 0],
            [0, 0, float(spacing_xyz[2]) if len(spacing_xyz) > 2 else 1.0, 0],
        )
        for i, row in enumerate(srows):
            struct.pack_into(en + "4f", hdr, 280 + 16 * i, *row)
        hdr[344:348] = b"n+1\x00"
    ndim = len(shape_f)
    dim = [ndim] + [int(s) for s in shape_f] + [1] * (7 - ndim)
    struct.pack_into(en + "8h", hdr, 40, *dim)
    code = _DTYPE_CODES[np.dtype(dtype)]
    struct.pack_into(en + "h", hdr, 70, code)
    struct.pack_into(en + "h", hdr, 72, np.dtype(dtype).itemsize * 8)
    # preserve the template's qfac (pixdim[0]): a qform-only source with
    # qfac=-1 keeps its k-axis handedness — overwriting with +1 would flip
    # the quaternion-derived affine's third column
    qfac = 1.0
    if template is not None:
        tpl_qfac = struct.unpack_from(en + "f", template, 76)[0]
        if tpl_qfac < 0:
            qfac = -1.0
    pixdim = [qfac] + [float(s) for s in spacing_xyz] + [1.0] * (7 - len(spacing_xyz))
    struct.pack_into(en + "8f", hdr, 76, *pixdim[:8])
    struct.pack_into(en + "f", hdr, 108, 352.0)  # vox_offset
    struct.pack_into(en + "f", hdr, 112, 1.0)  # scl_slope
    struct.pack_into(en + "f", hdr, 116, 0.0)  # scl_inter
    return bytes(hdr)


def write_nifti(fname: str, arr: np.ndarray, spacing_xyz,
                template_header: Optional[bytes] = None):
    """arr is C-ordered (…, z, y, x); stored Fortran-ordered (x fastest).
    With a template header the data is written in the template's byte order."""
    shape_f = arr.shape[::-1]
    hdr = _build_header(shape_f, spacing_xyz, arr.dtype, template_header)
    en = _header_endianness(hdr)
    out = np.ascontiguousarray(arr)
    if en == ">":
        out = out.astype(out.dtype.newbyteorder(">"))
    with _open(fname, "wb") as f:
        f.write(hdr)
        f.write(b"\x00" * 4)  # extension flag
        f.write(out.tobytes())


class NiftiIO(BaseReaderWriter):
    """nnU-Net-convention NIfTI IO with reorient-to-closest-canonical (see
    module docstring). Set class attr `reorient=False` for raw disk order."""

    supported_file_endings = [".nii.gz", ".nii"]
    reorient = True

    def read_images(self, image_fnames: Union[List[str], Tuple[str, ...]]) -> Tuple[np.ndarray, dict]:
        images, spacings, headers = [], [], []
        orientations = []
        for f in image_fnames:
            arr, hdr = read_nifti(f)
            pixdim = hdr["pixdim"]
            perm_f, signs = (0, 1, 2), (1, 1, 1)
            if arr.ndim == 2:
                sp = (max(abs(pixdim[1]), abs(pixdim[2])) * 999.0,
                      float(abs(pixdim[2])), float(abs(pixdim[1])))
                images.append(arr[None, None])
            elif arr.ndim in (3, 4):
                a = arr if arr.ndim == 4 else arr[None]
                if self.reorient:
                    perm_f, signs, spacing_f = _closest_canonical_ops(hdr["affine"])
                    a = reorient_to_canonical(a, perm_f, signs)
                    # canonical voxel axis w has the size of voxel axis perm_f[w];
                    # spacing listed (z, y, x) = world (S, A, R)
                    sp = (float(spacing_f[perm_f[2]]),
                          float(spacing_f[perm_f[1]]),
                          float(spacing_f[perm_f[0]]))
                else:
                    sp = (float(abs(pixdim[3])), float(abs(pixdim[2])),
                          float(abs(pixdim[1])))
                images.append(a)
            else:
                raise RuntimeError(f"Unexpected ndim {arr.ndim} in {f}")
            spacings.append(tuple(abs(s) for s in sp))
            headers.append(hdr)
            orientations.append((perm_f, signs))

        if not self._check_all_same([i.shape for i in images]):
            raise RuntimeError(f"Input images have mismatched shapes: {[i.shape for i in images]}")
        if not self._check_all_same_spacing(spacings):
            raise RuntimeError(f"Input images have mismatched spacings: {spacings}")
        if not self._check_all_same(orientations):
            raise RuntimeError(
                f"Input channels have mismatched orientations: {orientations}")

        stacked = np.vstack(images).astype(np.float32)
        props = {
            "spacing": list(spacings[0]),
            "nifti_header": headers[0]["raw_header"],
            "nifti_orientation": orientations[0],
        }
        return stacked, props

    def _check_all_same_spacing(self, spacings, tol=1e-4):
        ref = spacings[0]
        return all(len(s) == len(ref) and
                   all(abs(a - b) <= tol * max(1.0, abs(b)) for a, b in zip(s, ref))
                   for s in spacings)

    def read_seg(self, seg_fname: str) -> Tuple[np.ndarray, dict]:
        return self.read_images((seg_fname,))

    def write_seg(self, seg: np.ndarray, output_fname: str, properties: dict) -> None:
        assert seg.ndim == 3, "segmentation must be 3d; provide 2d as shape (1, x, y)"
        spacing = properties["spacing"]
        spacing_xyz = [float(spacing[2]), float(spacing[1]), float(spacing[0])]
        template = properties.get("nifti_header")
        arr = seg
        perm_f, signs = properties.get("nifti_orientation", ((0, 1, 2), (1, 1, 1)))
        tpl_ndim = None
        if template is not None:
            en = _header_endianness(template)
            tpl_ndim = struct.unpack_from(en + "8h", template, 40)[0]
        if tpl_ndim == 2:
            # 2d sources were read as (1, x, y); orientation n/a
            arr = seg[0]
            spacing_xyz = spacing_xyz[:2]
        elif any(s < 0 for s in signs) or tuple(perm_f) != (0, 1, 2):
            # restore the source voxel order so the template's qform/sform
            # (kept verbatim) still describes the written array
            arr = reorient_from_canonical(arr, perm_f, signs)
            if template is not None:
                pixdim = struct.unpack_from(en + "8f", template, 76)
                spacing_xyz = [abs(pixdim[1]), abs(pixdim[2]), abs(pixdim[3])]
        write_nifti(
            output_fname, np.ascontiguousarray(
                arr.astype(np.uint8 if seg.max() < 255 else np.uint16)),
            spacing_xyz, template_header=template,
        )
