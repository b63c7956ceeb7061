"""Pure-Python Blosc2 NDim engine (dinounet_tpu/compression).

The chunk codec is byte-validated both directions against this image's
libblosc.so.1 (v1.21.3) — the same C code real blosc2 containers are built
on — and the container layer is validated by round-trip plus, wherever a
python-blosc2 happens to be importable, by cross-library read/write
(ref container semantics: dinounet/training/dataloading/nnunet_dataset.py:225-310).
"""

import ctypes
import ctypes.util
import struct

import numpy as np
import pytest

from dinounet_tpu.compression import blosc1_chunk, blosc2_shim
from dinounet_tpu.compression import minimsgpack as mp
from dinounet_tpu.compression.b2nd import B2NDArray, open_b2nd, save_b2nd


def _load_libblosc():
    path = ctypes.util.find_library("blosc") or "libblosc.so.1"
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.blosc_init()
    lib.blosc_set_nthreads(1)
    return lib


_LIBBLOSC = _load_libblosc()

try:
    import blosc2 as real_blosc2  # noqa: F401
except ImportError:
    real_blosc2 = None


def _cases(rng):
    return [
        ((rng.standard_normal(1000) * 10).astype(np.float32), "f32"),
        ((rng.standard_normal(333) * 100).astype(np.int16), "i16"),
        (rng.integers(0, 4, 5000).astype(np.uint8), "u8"),
        ((rng.standard_normal(129)).astype(np.float64), "f64"),
        (np.zeros(777, np.float32), "zeros"),
    ]


@pytest.mark.skipif(_LIBBLOSC is None, reason="libblosc.so.1 not present")
class TestChunkOracle:
    """Byte-level cross-validation against the C blosc library."""

    def test_our_chunks_decompress_with_libblosc(self):
        rng = np.random.default_rng(0)
        for arr, name in _cases(rng):
            data = arr.tobytes()
            chunk = blosc1_chunk.compress_chunk(
                data, arr.itemsize, blocksize=4096, clevel=8,
                shuffle=True, codec="zstd")
            out = ctypes.create_string_buffer(len(data))
            n = _LIBBLOSC.blosc_decompress(bytes(chunk), out, len(data))
            assert n == len(data), name
            assert out.raw == data, name

    def test_libblosc_chunks_decompress_with_ours(self):
        rng = np.random.default_rng(1)
        _LIBBLOSC.blosc_set_compressor(b"zstd")
        for arr, name in _cases(rng):
            data = arr.tobytes()
            comp = ctypes.create_string_buffer(len(data) + 16)
            n = _LIBBLOSC.blosc_compress(8, 1, arr.itemsize, len(data),
                                         data, comp, len(data) + 16)
            assert n > 0, name
            assert blosc1_chunk.decompress_chunk(comp.raw[:n]) == data, name

    def test_libblosc_zlib_and_unshuffled(self):
        rng = np.random.default_rng(2)
        _LIBBLOSC.blosc_set_compressor(b"zlib")
        data = (rng.standard_normal(512) * 3).astype(np.float32).tobytes()
        comp = ctypes.create_string_buffer(len(data) + 16)
        n = _LIBBLOSC.blosc_compress(6, 0, 4, len(data), data, comp,
                                     len(data) + 16)
        assert n > 0
        assert blosc1_chunk.decompress_chunk(comp.raw[:n]) == data
        _LIBBLOSC.blosc_set_compressor(b"zstd")

    def test_libblosc_memcpy_chunk(self):
        # clevel 0 stores raw with the MEMCPYED flag
        data = np.arange(100, dtype=np.float32).tobytes()
        comp = ctypes.create_string_buffer(len(data) + 16)
        n = _LIBBLOSC.blosc_compress(0, 1, 4, len(data), data, comp,
                                     len(data) + 16)
        assert n == len(data) + 16
        assert blosc1_chunk.decompress_chunk(comp.raw[:n]) == data

    def test_split_codec_chunks_decode(self):
        # blosclz/lz4 split blocks into typesize streams; ours must either
        # decode the layout (stream walking) or fail loudly on the codec —
        # never return wrong bytes
        _LIBBLOSC.blosc_set_compressor(b"blosclz")
        data = np.arange(4096, dtype=np.int32).tobytes()
        comp = ctypes.create_string_buffer(len(data) + 16)
        n = _LIBBLOSC.blosc_compress(9, 1, 4, len(data), data, comp,
                                     len(data) + 16)
        assert n > 0
        with pytest.raises(ValueError, match="codec"):
            blosc1_chunk.decompress_chunk(comp.raw[:n])
        _LIBBLOSC.blosc_set_compressor(b"zstd")


class TestChunkCodec:
    @pytest.mark.parametrize("codec", ["zstd", "zlib"])
    @pytest.mark.parametrize("shuffle", [True, False])
    def test_round_trip(self, codec, shuffle):
        rng = np.random.default_rng(3)
        for arr, name in _cases(rng):
            data = arr.tobytes()
            chunk = blosc1_chunk.compress_chunk(
                data, arr.itemsize, blocksize=1000, clevel=5,
                shuffle=shuffle, codec=codec)
            assert blosc1_chunk.decompress_chunk(chunk) == data, (codec, name)

    def test_incompressible_streams_stored_raw(self):
        rng = np.random.default_rng(4)
        data = rng.bytes(10000)  # random bytes don't compress
        chunk = blosc1_chunk.compress_chunk(data, 1, blocksize=2048)
        assert blosc1_chunk.decompress_chunk(chunk) == data
        assert len(chunk) <= len(data) + blosc1_chunk.MAX_OVERHEAD + 4 * 5 + 4 * 5

    def test_short_last_block(self):
        data = np.arange(1001, dtype=np.uint8).astype(np.uint8).tobytes()
        chunk = blosc1_chunk.compress_chunk(data, 1, blocksize=256)
        assert blosc1_chunk.decompress_chunk(chunk) == data

    def test_decompress_block_matches_full(self):
        rng = np.random.default_rng(5)
        data = (rng.standard_normal(4000) * 7).astype(np.float32).tobytes()
        blocksize = 1024
        chunk = blosc1_chunk.compress_chunk(data, 4, blocksize=blocksize)
        nblocks = (len(data) + blocksize - 1) // blocksize
        got = b"".join(blosc1_chunk.decompress_block(chunk, i)
                       for i in range(nblocks))
        assert got == data

    def test_blocksize_realigned_to_typesize(self):
        data = np.arange(100, dtype=np.float64).tobytes()
        chunk = blosc1_chunk.compress_chunk(data, 8, blocksize=100)  # 100 % 8 != 0
        assert blosc1_chunk.decompress_chunk(chunk) == data

    def test_expected_nbytes_mismatch_raises(self):
        chunk = blosc1_chunk.compress_chunk(b"abcd" * 10, 1, blocksize=40)
        with pytest.raises(ValueError, match="nbytes"):
            blosc1_chunk.decompress_chunk(chunk, expected_nbytes=7)

    def test_blosc2_special_zero_chunk(self):
        # hand-crafted blosc2 32-byte-header special-values chunk (the form
        # b2nd writes for all-zero chunks): decoder must emit zeros
        nbytes, typesize = 4096, 4
        header = struct.pack("<BBBBiii", 2, 1, 4 << 5, typesize,
                             nbytes, 1024, 32)
        chunk = header + bytes(15) + bytes([2 << 4])  # special=2 (zeros) at byte 31
        assert blosc1_chunk.decompress_chunk(chunk) == bytes(nbytes)

    def test_bad_typesize_rejected(self):
        with pytest.raises(ValueError, match="typesize"):
            blosc1_chunk.compress_chunk(b"x" * 600, 300, blocksize=600)


class TestMsgpack:
    def test_round_trip_values(self):
        values = [None, True, False, 0, 5, 127, 128, -1, -32, -33,
                  2 ** 31 - 1, -(2 ** 31), 2 ** 40, "b2nd", "x" * 40,
                  b"\x00\x01", b"y" * 300, [1, "two", [3]], {"a": 1, "b": [2]},
                  mp.Ext(7, bytes(16))]
        for v in values:
            got, end = mp.unpack_from(mp.pack(v))
            assert got == v, v
            assert end == len(mp.pack(v))

    def test_fixed_width_ints_round_trip_and_are_fixed(self):
        for width in (1, 2, 4, 8):
            b = mp.pack_fixed_int(3, width)
            assert len(b) == 1 + width
            got, _ = mp.unpack_from(b)
            assert got == 3

    def test_uint_markers_decode(self):
        for marker, fmt, v in [(0xCC, ">B", 200), (0xCD, ">H", 60000),
                               (0xCE, ">I", 2 ** 31 + 5), (0xCF, ">Q", 2 ** 63)]:
            buf = bytes([marker]) + struct.pack(fmt, v)
            got, _ = mp.unpack_from(buf)
            assert got == v


class TestB2NDContainer:
    @pytest.mark.parametrize("dtype,shape,chunks,blocks", [
        (np.float32, (2, 37, 53, 41), (1, 16, 32, 32), (1, 8, 16, 16)),
        (np.int8, (1, 64, 64), None, None),
        (np.uint16, (100,), (7,), (3,)),
        (np.float64, (5, 5), (5, 5), (5, 5)),
        (np.int32, (13, 17), (4, 9), (4, 5)),
    ])
    def test_round_trip_and_lazy_slices(self, tmp_path, dtype, shape,
                                        chunks, blocks):
        rng = np.random.default_rng(6)
        a = (rng.standard_normal(shape) * 50).astype(dtype)
        path = str(tmp_path / "x.b2nd")
        save_b2nd(a, path, chunks=chunks, blocks=blocks)
        b = open_b2nd(path)
        assert b.shape == a.shape and b.dtype == a.dtype
        np.testing.assert_array_equal(b[...], a)
        for _ in range(20):
            key = tuple(slice(int(rng.integers(0, s)),
                              int(rng.integers(1, s + 1))) for s in shape)
            np.testing.assert_array_equal(b[key], a[key])
        b.close()

    def test_integer_indexing_squeezes(self, tmp_path):
        a = np.arange(2 * 6 * 7, dtype=np.float32).reshape(2, 6, 7)
        path = str(tmp_path / "x.b2nd")
        save_b2nd(a, path, chunks=(1, 4, 4), blocks=(1, 2, 2))
        b = open_b2nd(path)
        np.testing.assert_array_equal(b[1], a[1])
        np.testing.assert_array_equal(b[0, 2:5], a[0, 2:5])
        np.testing.assert_array_equal(b[-1, 3, 2:4], a[-1, 3, 2:4])
        assert b[1, 2, 3] == a[1, 2, 3]
        b.close()

    def test_partial_leading_key_and_len(self, tmp_path):
        a = np.arange(60, dtype=np.int16).reshape(3, 4, 5)
        path = str(tmp_path / "x.b2nd")
        save_b2nd(a, path)
        b = open_b2nd(path)
        assert len(b) == 3
        np.testing.assert_array_equal(b[1:3], a[1:3])
        np.testing.assert_array_equal(b[:, 1:3], a[:, 1:3])
        b.close()

    def test_step_and_fancy_indexing_rejected(self, tmp_path):
        a = np.zeros((4, 4), np.float32)
        path = str(tmp_path / "x.b2nd")
        save_b2nd(a, path)
        b = open_b2nd(path)
        with pytest.raises(IndexError, match="step 1"):
            b[::2]
        with pytest.raises(IndexError):
            b[[0, 1]]
        with pytest.raises(IndexError, match="too many"):
            b[0, 0, 0]
        b.close()

    def test_non_b2nd_file_rejected(self, tmp_path):
        path = tmp_path / "x.b2nd"
        path.write_bytes(b"\x90" + b"not a frame" + bytes(100))
        with pytest.raises(ValueError, match="magic"):
            open_b2nd(str(path))

    def test_header_fixed_offsets(self, tmp_path):
        """The writer's header must honor the cframe spec's fixed offsets —
        that is what makes it readable by c-blosc2 (asserted structurally;
        execution cross-check in TestRealBlosc2Interop where available)."""
        a = np.arange(1000, dtype=np.float32).reshape(10, 100)
        path = str(tmp_path / "x.b2nd")
        save_b2nd(a, path, chunks=(4, 64), blocks=(2, 32))
        raw = open(path, "rb").read()
        assert raw[2:10] == b"b2frame\x00"
        header_len = struct.unpack_from(">i", raw, 11)[0]
        frame_len = struct.unpack_from(">q", raw, 16)[0]
        assert frame_len == len(raw)
        assert struct.unpack_from(">q", raw, 30)[0] >= a.nbytes  # padded nbytes
        assert struct.unpack_from(">i", raw, 48)[0] == 4  # typesize
        assert struct.unpack_from(">i", raw, 53)[0] == 2 * 32 * 4  # blocksize
        assert header_len < len(raw)

    def test_all_zero_array(self, tmp_path):
        a = np.zeros((3, 50, 50), np.float32)
        path = str(tmp_path / "x.b2nd")
        save_b2nd(a, path, chunks=(1, 32, 32), blocks=(1, 16, 16))
        b = open_b2nd(path)
        np.testing.assert_array_equal(b[...], a)
        b.close()


class TestShim:
    def test_asarray_open_round_trip(self, tmp_path):
        rng = np.random.default_rng(7)
        a = (rng.standard_normal((2, 30, 40)) * 5).astype(np.float32)
        path = str(tmp_path / "x.b2nd")
        out = blosc2_shim.asarray(
            a, urlpath=path, chunks=(1, 16, 16), blocks=(1, 8, 8),
            cparams={"codec": blosc2_shim.Codec.ZSTD, "clevel": 8})
        assert isinstance(out, B2NDArray)
        b = blosc2_shim.open(urlpath=path, mode="r",
                             dparams={"nthreads": 1}, mmap_mode="r")
        np.testing.assert_array_equal(b[...], a)
        np.testing.assert_array_equal(b[:, 3:19, 7:33], a[:, 3:19, 7:33])
        b.close()

    def test_unavailable_codec_rejected(self, tmp_path):
        with pytest.raises(ValueError, match="codec"):
            blosc2_shim.asarray(np.zeros(4), urlpath=str(tmp_path / "x.b2nd"),
                                cparams={"codec": blosc2_shim.Codec.LZ4})

    def test_enum_values_match_python_blosc2(self):
        # the constants code passes through (Codec.ZSTD etc.) must hold the
        # same integer values as python-blosc2's
        assert blosc2_shim.Codec.ZSTD == 5
        assert blosc2_shim.Codec.ZLIB == 4
        assert blosc2_shim.Filter.SHUFFLE == 1
        assert blosc2_shim.set_nthreads(8) == 1

    def test_write_requires_urlpath(self):
        with pytest.raises(NotImplementedError):
            blosc2_shim.asarray(np.zeros(4))
        with pytest.raises(NotImplementedError):
            blosc2_shim.open("x.b2nd", mode="w")


@pytest.mark.skipif(real_blosc2 is None,
                    reason="python-blosc2 not installed in this image")
class TestRealBlosc2Interop:
    """Activates wherever the real package exists: full cross-library IO."""

    def test_ours_reads_real_blosc2_files(self, tmp_path):
        rng = np.random.default_rng(8)
        a = (rng.standard_normal((2, 33, 47)) * 9).astype(np.float32)
        path = str(tmp_path / "real.b2nd")
        real_blosc2.asarray(a, urlpath=path, chunks=(1, 16, 32),
                            blocks=(1, 8, 16),
                            cparams={"codec": real_blosc2.Codec.ZSTD,
                                     "clevel": 8})
        b = open_b2nd(path)
        np.testing.assert_array_equal(b[...], a)
        b.close()

    def test_real_blosc2_reads_our_files(self, tmp_path):
        rng = np.random.default_rng(9)
        a = (rng.standard_normal((2, 33, 47)) * 9).astype(np.float32)
        path = str(tmp_path / "ours.b2nd")
        save_b2nd(a, path, chunks=(1, 16, 32), blocks=(1, 8, 16))
        b = real_blosc2.open(urlpath=path, mode="r")
        np.testing.assert_array_equal(b[...], a)
