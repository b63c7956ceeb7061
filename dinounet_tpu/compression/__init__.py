"""Pure-Python Blosc2 NDim (.b2nd) storage engine.

Backs the nnUNetDatasetBlosc2 dataset backend (training/nnunet_dataset.py)
when the python-blosc2 package is not installed — the situation in this
image. The reference stores preprocessed cases as .b2nd containers
(ref dinounet/training/dataloading/nnunet_dataset.py:225-310, ZSTD clevel 8);
this package reads and writes that container format with zstandard (always
present here) providing the codec.

Layering:
  * blosc1_chunk — the Blosc chunk codec (header + block streams). Written in
    the Blosc1 chunk format, which Blosc2 reads natively; validated
    byte-level against this image's libblosc.so.1 oracle
    (tests/test_b2nd.py::TestChunkOracle).
  * b2nd — the contiguous-frame (cframe) container + b2nd metalayer: a
    lazy-slicing reader (block-granular partial decompression) and a writer.
  * blosc2_shim — a python-blosc2-compatible module surface (open/asarray/
    Codec/Filter/set_nthreads) so nnUNetDatasetBlosc2 runs unchanged.
"""

from dinounet_tpu.compression.b2nd import B2NDArray, open_b2nd, save_b2nd  # noqa: F401
