"""Native-layout (HWBC) decoder conv kernels (ops/conv_hwbc_pallas.py):
interpret-mode parity vs lax.conv, the InstanceNorm prologue/stat helpers,
and the UNetDecoder integration (shared checkpoints, train path untouched).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _rand(rng, shape, dtype=jnp.bfloat16, scale=1.0):
    return jnp.asarray(rng.normal(size=shape) * scale, dtype)


class TestKernel:
    @pytest.mark.parametrize("shape,co", [((16, 128, 8, 16), 8),
                                          ((10, 256, 8, 24), 12),
                                          ((6, 128, 16, 8), 8)])
    def test_raw_conv_matches_reference(self, rng, shape, co):
        from dinounet_tpu.ops.conv_hwbc_pallas import (
            conv3x3_hwbc, conv3x3_hwbc_reference)

        H, W, B, Ci = shape
        x = _rand(rng, shape)
        w = _rand(rng, (3, 3, Ci, co), jnp.float32, 0.1)
        b = _rand(rng, (co,), jnp.float32, 0.1)
        y, ssum, ssq = conv3x3_hwbc(x, w, b, interpret=True)
        yr, sr, qr = conv3x3_hwbc_reference(x, w, b)
        np.testing.assert_allclose(np.asarray(y, np.float32),
                                   np.asarray(yr, np.float32),
                                   atol=0.02, rtol=0.02)
        np.testing.assert_allclose(np.asarray(ssum), np.asarray(sr),
                                   rtol=1e-3, atol=0.05)
        np.testing.assert_allclose(np.asarray(ssq), np.asarray(qr),
                                   rtol=1e-3, atol=0.05)

    def test_two_input_prologue_matches_reference(self, rng):
        """conv0's concat-free two-operand form + the InstanceNorm-apply +
        leaky input prologue (ConvNormAct order)."""
        from dinounet_tpu.ops.conv_hwbc_pallas import (
            conv3x3_hwbc, conv3x3_hwbc_reference)

        H, W, B, Ci, Co = 16, 128, 8, 16, 8
        x = _rand(rng, (H, W, B, Ci))
        x2 = _rand(rng, (H, W, B, Ci))
        w = _rand(rng, (3, 3, 2 * Ci, Co), jnp.float32, 0.1)
        b = _rand(rng, (Co,), jnp.float32, 0.1)
        s = _rand(rng, (B, 2 * Ci), jnp.float32, 0.3) + 1.0
        t = _rand(rng, (B, 2 * Ci), jnp.float32, 0.2)
        y, ssum, _ = conv3x3_hwbc(x, w, b, x2=x2, prologue=(s, t),
                                  interpret=True)
        yr, sr, _ = conv3x3_hwbc_reference(x, w, b, x2=x2, prologue=(s, t))
        np.testing.assert_allclose(np.asarray(y, np.float32),
                                   np.asarray(yr, np.float32),
                                   atol=0.03, rtol=0.03)
        np.testing.assert_allclose(np.asarray(ssum), np.asarray(sr),
                                   rtol=2e-3, atol=0.05)

    def test_norm_prologue_params_match_instance_norm(self, rng):
        from dinounet_tpu.ops.conv_hwbc_pallas import (
            instance_norm_prologue_params)

        B, C, n = 4, 8, 64
        y = np.asarray(_rand(rng, (n, B, C), jnp.float32))
        g = np.asarray(_rand(rng, (C,), jnp.float32, 0.2)) + 1.0
        be = np.asarray(_rand(rng, (C,), jnp.float32, 0.1))
        ssum = jnp.asarray(y.sum(0))
        ssq = jnp.asarray((y * y).sum(0))
        sc, sh = instance_norm_prologue_params(ssum, ssq, n, jnp.asarray(g),
                                               jnp.asarray(be))
        got = y * np.asarray(sc)[None] + np.asarray(sh)[None]
        mean = y.mean(0)
        var = y.var(0)
        want = (y - mean[None]) / np.sqrt(var + 1e-5)[None] * g + be
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_supported(self):
        from dinounet_tpu.ops.conv_hwbc_pallas import hwbc_supported

        assert hwbc_supported((8, 128, 128, 128))
        assert hwbc_supported((8, 256, 256, 64))
        # W=512 compiles only under the tighter Rh=1 budget (round-4 probes)
        assert hwbc_supported((8, 512, 512, 32))
        from dinounet_tpu.ops.conv_hwbc_pallas import _pick_rh
        assert _pick_rh(512, 512, 8, 32) == 1
        assert _pick_rh(256, 256, 8, 64) == 2
        assert _pick_rh(128, 128, 8, 128) == 2
        assert not hwbc_supported((8, 512, 96, 32))   # W not a lane multiple
        assert not hwbc_supported((6, 256, 256, 32))  # B not a sublane mult
        assert not hwbc_supported((8, 512, 512))      # rank


class TestExport:
    def test_tpu_export_both_forms(self):
        """BlockSpec/Mosaic-serialization legality without a device (the
        same gate as tests/test_tpu_export.py) at the largest SUPPORTED
        stage shape (the 512-wide stage-2 map is rejected by
        hwbc_supported — W=512 crashes the real Mosaic compile, a failure
        class export cannot see)."""
        from dinounet_tpu.ops.conv_hwbc_pallas import conv3x3_hwbc

        S = jax.ShapeDtypeStruct
        x = S((256, 256, 8, 32), jnp.bfloat16)
        b = S((32,), jnp.float32)
        jax.export.export(
            jax.jit(lambda x, x2, w, b, s, t: conv3x3_hwbc(
                x, w, b, x2=x2, prologue=(s, t))),
            platforms=["tpu"],
        )(x, x, S((3, 3, 64, 32), jnp.float32), b,
          S((8, 64), jnp.float32), S((8, 64), jnp.float32))
        jax.export.export(
            jax.jit(lambda x, w, b: conv3x3_hwbc(x, w, b)),
            platforms=["tpu"],
        )(x, S((3, 3, 32, 32), jnp.float32), b)


class TestDecoderIntegration:
    def _setup(self, rng):
        from dinounet_tpu.models.decoder import UNetDecoder

        dec = UNetDecoder(
            encoder_channels=[8, 16, 32],
            encoder_strides=[(2, 2), (2, 2), (2, 2)],
            encoder_kernel_sizes=[(3, 3), (3, 3), (3, 3)],
            num_classes=3, n_conv_per_stage=[2, 2], deep_supervision=True)
        skips = [_rand(rng, (8, 8, 256, 8)), _rand(rng, (8, 4, 128, 16)),
                 _rand(rng, (8, 2, 64, 32))]
        return dec, skips

    def test_hwbc_matches_plain(self, rng, monkeypatch):
        monkeypatch.setenv("DINOUNET_TPU_DECODER_TAIL", "jax")
        dec, skips = self._setup(rng)

        monkeypatch.setenv("DINOUNET_TPU_DECODER_HWBC", "jax")
        v = dec.init(jax.random.PRNGKey(0), skips)
        ref = dec.apply(v, skips)
        ref_train = dec.apply(v, skips, train=True)

        monkeypatch.setenv("DINOUNET_TPU_DECODER_HWBC", "interpret")
        v2 = dec.init(jax.random.PRNGKey(0), skips)
        import jax.tree_util as jtu
        p1 = {jtu.keystr(k): a.shape for k, a in jtu.tree_leaves_with_path(v)}
        p2 = {jtu.keystr(k): a.shape for k, a in jtu.tree_leaves_with_path(v2)}
        assert p1 == p2

        got = dec.apply(v, skips)
        for a, b in zip(ref, got):
            np.testing.assert_allclose(np.asarray(b, np.float32),
                                       np.asarray(a, np.float32),
                                       atol=0.06, rtol=0.05)
        # training always keeps the plain flax graph
        got_train = dec.apply(v, skips, train=True)
        for a, b in zip(ref_train, got_train):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_ineligible_shapes_fall_back(self, rng, monkeypatch):
        """W not a lane multiple -> the plain path runs even with the knob
        on (bitwise identical to knob-off)."""
        from dinounet_tpu.models.decoder import UNetDecoder

        monkeypatch.setenv("DINOUNET_TPU_DECODER_TAIL", "jax")
        dec = UNetDecoder(
            encoder_channels=[8, 16],
            encoder_strides=[(2, 2), (2, 2)],
            encoder_kernel_sizes=[(3, 3), (3, 3)],
            num_classes=2, n_conv_per_stage=[2], deep_supervision=False)
        skips = [_rand(rng, (2, 16, 48, 8)), _rand(rng, (2, 8, 24, 16))]
        monkeypatch.setenv("DINOUNET_TPU_DECODER_HWBC", "jax")
        v = dec.init(jax.random.PRNGKey(0), skips)
        ref = dec.apply(v, skips)
        monkeypatch.setenv("DINOUNET_TPU_DECODER_HWBC", "interpret")
        got = dec.apply(v, skips)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
