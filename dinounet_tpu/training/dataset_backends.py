"""New-style preprocessed-dataset storage backends.

Capability parity with the reference's newer dataset classes
(ref: dinounet/training/dataloading/nnunet_dataset.py:122-418 —
nnUNetBaseDataset / nnUNetDatasetNumpy / nnUNetDatasetBlosc2 +
comp_blosc2_params + infer_dataset_class). The reference trainer still uses
the legacy class (our `dataloading.nnUNetDataset`); these backends are the
forward-looking storage interface: per-case (data, seg, seg_prev, properties)
from either .npz/.npy or blosc2 .b2nd containers.

TPU deployment note: these are host-side storage formats feeding the device
prefetch pipeline; the chunk/block sizing in `comp_blosc2_params` targets the
host CPU caches doing the decompress-and-crop, not the accelerator. blosc2 is
optional (not in every image) — the Blosc2 backend raises a clear error at
construction when the library is missing.
"""

import math
import os
import pickle
from abc import ABC, abstractmethod
from typing import List, Optional, Tuple, Union

import numpy as np

try:
    import blosc2  # optional
except ImportError:  # pragma: no cover - absent from this image
    blosc2 = None


def _load_pickle(path: str):
    with open(path, "rb") as f:
        return pickle.load(f)


def _write_pickle(obj, path: str):
    with open(path, "wb") as f:
        pickle.dump(obj, f)


class nnUNetBaseDataset(ABC):
    """Interface: identifier -> (data, seg, seg_prev, properties).

    ref: nnunet_dataset.py:122-163."""

    def __init__(self, folder: str, identifiers: Optional[List[str]] = None,
                 folder_with_segs_from_previous_stage: Optional[str] = None):
        if identifiers is None:
            identifiers = self.get_identifiers(folder)
        self.identifiers = sorted(identifiers)
        self.source_folder = folder
        self.folder_with_segs_from_previous_stage = folder_with_segs_from_previous_stage

    def __getitem__(self, identifier: str):
        return self.load_case(identifier)

    def __len__(self):
        return len(self.identifiers)

    @abstractmethod
    def load_case(self, identifier: str) -> Tuple[np.ndarray, np.ndarray,
                                                  Optional[np.ndarray], dict]:
        ...

    @staticmethod
    @abstractmethod
    def save_case(data: np.ndarray, seg: np.ndarray, properties: dict,
                  output_filename_truncated: str) -> None:
        ...

    @staticmethod
    @abstractmethod
    def get_identifiers(folder: str) -> List[str]:
        ...

    @staticmethod
    def unpack_dataset(folder: str, overwrite_existing: bool = False,
                       num_processes: int = 8, verify: bool = True) -> None:
        """Optional eager decompression; no-op by default."""


class nnUNetDatasetNumpy(nnUNetBaseDataset):
    """npz (compressed) / npy (unpacked memmap) backend.

    ref: nnunet_dataset.py:166-223."""

    def load_case(self, identifier: str):
        folder = self.source_folder

        def load(stem, key, fld):
            npy = os.path.join(fld, stem + ".npy")
            if os.path.isfile(npy):
                return np.load(npy, mmap_mode="r")
            return np.load(os.path.join(fld, identifier + ".npz"))[key]

        data = load(identifier, "data", folder)
        seg = load(identifier + "_seg", "seg", folder)
        seg_prev = None
        if self.folder_with_segs_from_previous_stage is not None:
            fld = self.folder_with_segs_from_previous_stage
            npy = os.path.join(fld, identifier + ".npy")
            if os.path.isfile(npy):
                seg_prev = np.load(npy, mmap_mode="r")
            else:
                seg_prev = np.load(os.path.join(fld, identifier + ".npz"))["seg"]
        properties = _load_pickle(os.path.join(folder, identifier + ".pkl"))
        return data, seg, seg_prev, properties

    @staticmethod
    def save_case(data, seg, properties, output_filename_truncated):
        np.savez_compressed(output_filename_truncated + ".npz", data=data, seg=seg)
        _write_pickle(properties, output_filename_truncated + ".pkl")

    @staticmethod
    def save_seg(seg, output_filename_truncated):
        np.savez_compressed(output_filename_truncated + ".npz", seg=seg)

    @staticmethod
    def get_identifiers(folder: str) -> List[str]:
        return [f[:-4] for f in os.listdir(folder) if f.endswith(".npz")]

    @staticmethod
    def unpack_dataset(folder: str, overwrite_existing: bool = False,
                       num_processes: int = 8, verify: bool = True) -> None:
        from dinounet_tpu.training.dataloading import unpack_dataset

        unpack_dataset(folder, True, overwrite_existing, num_processes)


class nnUNetDatasetBlosc2(nnUNetBaseDataset):
    """blosc2 .b2nd backend: chunked, compressed, mmap-read containers whose
    chunk/block layout is tuned for patch reads (ref: nnunet_dataset.py:226-316).

    Requires the optional `blosc2` package."""

    def __init__(self, folder, identifiers=None,
                 folder_with_segs_from_previous_stage=None):
        if blosc2 is None:
            raise ImportError(
                "nnUNetDatasetBlosc2 needs the 'blosc2' package, which is not "
                "installed in this environment; use nnUNetDatasetNumpy")
        super().__init__(folder, identifiers, folder_with_segs_from_previous_stage)
        blosc2.set_nthreads(1)

    def load_case(self, identifier: str):
        kw = {} if os.name == "nt" else {"mmap_mode": "r"}
        dparams = {"nthreads": 1}
        data = blosc2.open(
            urlpath=os.path.join(self.source_folder, identifier + ".b2nd"),
            mode="r", dparams=dparams, **kw)
        seg = blosc2.open(
            urlpath=os.path.join(self.source_folder, identifier + "_seg.b2nd"),
            mode="r", dparams=dparams, **kw)
        seg_prev = None
        if self.folder_with_segs_from_previous_stage is not None:
            seg_prev = blosc2.open(
                urlpath=os.path.join(self.folder_with_segs_from_previous_stage,
                                     identifier + ".b2nd"),
                mode="r", dparams=dparams, **kw)
        properties = _load_pickle(
            os.path.join(self.source_folder, identifier + ".pkl"))
        return data, seg, seg_prev, properties

    @staticmethod
    def save_case(data, seg, properties, output_filename_truncated,
                  chunks=None, blocks=None, chunks_seg=None, blocks_seg=None,
                  clevel: int = 8, codec=None):
        if blosc2 is None:
            raise ImportError("blosc2 not installed")
        if chunks_seg is None:
            chunks_seg = chunks
        if blocks_seg is None:
            blocks_seg = blocks
        cparams = {"codec": codec or blosc2.Codec.ZSTD, "clevel": clevel}
        blosc2.asarray(np.ascontiguousarray(data),
                       urlpath=output_filename_truncated + ".b2nd",
                       chunks=chunks, blocks=blocks, cparams=cparams)
        blosc2.asarray(np.ascontiguousarray(seg),
                       urlpath=output_filename_truncated + "_seg.b2nd",
                       chunks=chunks_seg, blocks=blocks_seg, cparams=cparams)
        _write_pickle(properties, output_filename_truncated + ".pkl")

    @staticmethod
    def save_seg(seg, output_filename_truncated, chunks_seg=None, blocks_seg=None):
        if blosc2 is None:
            raise ImportError("blosc2 not installed")
        blosc2.asarray(seg, urlpath=output_filename_truncated + ".b2nd",
                       chunks=chunks_seg, blocks=blocks_seg)

    @staticmethod
    def get_identifiers(folder: str) -> List[str]:
        return [f[:-5] for f in os.listdir(folder)
                if f.endswith(".b2nd") and not f.endswith("_seg.b2nd")]


def comp_blosc2_params(
        image_size: Tuple[int, ...],
        patch_size: Tuple[int, ...],
        bytes_per_pixel: int = 4,
        l1_cache_size_per_core_in_bytes: int = 32768,
        l3_cache_size_per_core_in_bytes: int = 1441792,
        safety_factor: float = 0.8) -> Tuple[Tuple[int, ...], Tuple[int, ...]]:
    """Recommend (blocks, chunks) for blosc2 containers read patch-wise.

    Same contract as ref nnunet_dataset.py:312-403: blocks sized to fit the
    per-core L1 cache (decompression unit), chunks grown toward the L3 budget
    but kept near the patch footprint so a random patch read touches few
    chunks. image_size is (c, x, y, z) (use x=1 for 2-D data); patch_size is
    spatial-only.

    Own formulation (not a port): start from the per-axis power-of-two cover
    of the patch, halve the axis most oversized relative to the patch until
    the block fits L1, then grow chunk axes toward the patch footprint under
    the L3 budget.
    """
    c = image_size[0]
    spatial_img = np.asarray(image_size[1:], dtype=np.int64)
    patch = np.asarray(
        ([1] + list(patch_size)) if len(patch_size) == 2 else list(patch_size),
        dtype=np.int64)

    # block: power-of-two cover of the patch, clipped to the image
    block = np.array([1 << max(0, math.ceil(math.log2(int(p)))) for p in patch],
                     dtype=np.int64)
    block = np.minimum(block, spatial_img)

    def nbytes(arr):
        return int(c * np.prod(arr) * bytes_per_pixel)

    l1 = l1_cache_size_per_core_in_bytes * safety_factor
    while nbytes(block) > l1:
        # halve the axis most oversized relative to the patch (ties -> largest)
        ratios = block / np.maximum(patch, 1)
        order = np.argsort(-ratios)
        ax = next((a for a in order if block[a] > 1), None)
        if ax is None:
            break
        block[ax] = max(1, 1 << (int(block[ax]) - 1).bit_length() - 1)

    # chunk: grow from the block toward the patch footprint within L3
    chunk = block.copy()
    l3 = l3_cache_size_per_core_in_bytes * safety_factor
    target = np.minimum(np.maximum(patch, block), spatial_img)
    while nbytes(chunk) < l3:
        grow = [a for a in range(len(chunk))
                if chunk[a] < spatial_img[a] and patch[a] > 1]
        if not grow:
            break
        # grow the axis furthest below its target footprint first
        ax = min(grow, key=lambda a: chunk[a] / max(int(target[a]), 1))
        nxt = min(int(chunk[ax] + block[ax]), int(spatial_img[ax]))
        if nxt == chunk[ax]:
            break
        chunk[ax] = nxt
        # don't balloon far past the patch: mean oversize cap (ref :395-398)
        if np.mean(chunk / np.maximum(patch, 1)) > 1.5:
            chunk[ax] -= block[ax]
            break
    chunk = np.minimum(chunk, spatial_img)

    return ((c, *[int(v) for v in block]), (c, *[int(v) for v in chunk]))


file_ending_dataset_mapping = {
    "npz": nnUNetDatasetNumpy,
    "b2nd": nnUNetDatasetBlosc2,
}


def infer_dataset_class(folder: str):
    """Pick the dataset backend from the (single) file ending present in a
    preprocessed folder (ref: nnunet_dataset.py:411-418)."""
    endings = {f.rsplit(".", 1)[-1] for f in os.listdir(folder)
               if os.path.isfile(os.path.join(folder, f)) and "." in f}
    endings -= {"pkl", "npy"}
    if len(endings) != 1:
        raise RuntimeError(
            f"Found {sorted(endings)} file endings in {folder}; cannot infer "
            "the dataset backend")
    return file_ending_dataset_mapping[endings.pop()]
