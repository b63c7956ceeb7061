"""Fused high-res decoder tail kernels (ops/decoder_tail_pallas.py) in
interpreter mode on CPU: kernel parity vs the pure-jnp reference, and the
UNetDecoder integration vs the plain flax path (shared checkpoints)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _rand(rng, shape, dtype=jnp.bfloat16, scale=1.0):
    return jnp.asarray(rng.normal(size=shape) * scale, dtype)


class TestKernels:
    @pytest.mark.parametrize("shape,cout", [((2, 16, 32, 128), 8),
                                            ((1, 8, 24, 256), 16)])
    def test_conv3x3_matches_lax_conv(self, rng, shape, cout):
        from dinounet_tpu.ops.decoder_tail_pallas import conv3x3_cm

        B, Cin, H, W = shape
        x = _rand(rng, shape)
        w = _rand(rng, (3, 3, Cin, cout), jnp.float32, 0.1)
        b = _rand(rng, (cout,), jnp.float32, 0.1)
        y, ssum, ssq = conv3x3_cm(x, w, b, interpret=True)

        ref = jax.lax.conv_general_dilated(
            jnp.transpose(x, (0, 2, 3, 1)), w.astype(x.dtype), (1, 1),
            ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32) + b
        ref = jnp.transpose(ref, (0, 3, 1, 2)).astype(x.dtype)
        np.testing.assert_allclose(np.asarray(y, np.float32),
                                   np.asarray(ref, np.float32),
                                   atol=0.02, rtol=0.02)
        yf = np.asarray(y, np.float32)
        np.testing.assert_allclose(np.asarray(ssum), yf.sum((2, 3)),
                                   rtol=1e-3, atol=1e-2)
        np.testing.assert_allclose(np.asarray(ssq), (yf * yf).sum((2, 3)),
                                   rtol=1e-3, atol=1e-2)

    def test_conv3x3_prologue(self, rng):
        """The fused leaky(x*s + t) input prologue must match applying it
        explicitly before a raw conv."""
        from dinounet_tpu.ops.decoder_tail_pallas import conv3x3_cm

        B, Cin, H, W, cout = 1, 8, 16, 128, 8
        x = _rand(rng, (B, Cin, H, W))
        w = _rand(rng, (3, 3, Cin, cout), jnp.float32, 0.1)
        b = jnp.zeros((cout,), jnp.float32)
        s = jnp.asarray(rng.normal(size=(B, Cin)) * 0.2 + 1, jnp.float32)
        t = jnp.asarray(rng.normal(size=(B, Cin)) * 0.1, jnp.float32)

        got, _, _ = conv3x3_cm(x, w, b, prologue=(s, t), leaky_slope=0.01,
                               interpret=True)
        xf = x.astype(jnp.float32) * s[:, :, None, None] + t[:, :, None, None]
        xp = jnp.where(xf >= 0, xf, xf * 0.01).astype(x.dtype)
        want, _, _ = conv3x3_cm(xp, w, b, interpret=True)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want, np.float32),
                                   atol=0.03, rtol=0.02)

    def test_full_tail_matches_reference(self, rng):
        from dinounet_tpu.ops.decoder_tail_pallas import (
            decoder_tail_cm, decoder_tail_reference)

        B, Cin, H, W, C, K = 2, 16, 32, 128, 8, 3
        x = _rand(rng, (B, Cin, H, W))
        args = (
            _rand(rng, (3, 3, Cin, C), jnp.float32, 0.1),
            _rand(rng, (C,), jnp.float32, 0.1),
            _rand(rng, (C,), jnp.float32, 0.2) + 1.0,
            _rand(rng, (C,), jnp.float32, 0.1),
            _rand(rng, (3, 3, C, C), jnp.float32, 0.1),
            _rand(rng, (C,), jnp.float32, 0.1),
            _rand(rng, (C,), jnp.float32, 0.2) + 1.0,
            _rand(rng, (C,), jnp.float32, 0.1),
            _rand(rng, (C, K), jnp.float32, 0.1),
            _rand(rng, (K,), jnp.float32, 0.1),
        )
        got = decoder_tail_cm(x, *args, interpret=True)
        want = decoder_tail_reference(x, *args)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=0.06, rtol=0.03)

    def test_transpconv2x2_matches_flax(self, rng):
        from dinounet_tpu.models.layers import TransposedConv
        from dinounet_tpu.ops.decoder_tail_pallas import transpconv2x2_cm

        B, Cin, H, W, Cout = 2, 16, 32, 128, 8
        x = _rand(rng, (B, H, W, Cin))
        mod = TransposedConv(Cout, (2, 2))
        v = mod.init(jax.random.PRNGKey(0), x)
        ref = mod.apply(v, x)  # (B, 2H, 2W, Cout)

        k = v["params"]["transpconv"]["kernel"].astype(jnp.float32)
        b = v["params"]["transpconv"]["bias"].astype(jnp.float32)
        got = transpconv2x2_cm(jnp.transpose(x, (0, 3, 1, 2)), k, b,
                               interpret=True)
        got = jnp.transpose(got, (0, 2, 3, 1))
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref, np.float32),
                                   atol=0.02, rtol=0.02)

    def test_tail_supported(self):
        from dinounet_tpu.ops.decoder_tail_pallas import tail_supported

        assert tail_supported((8, 64, 512, 512))
        assert tail_supported((8, 64, 128, 128))
        assert not tail_supported((8, 64, 100, 512))  # H has no 8k divisor
        assert not tail_supported((8, 64, 512, 96))   # W not a lane multiple


class TestLearnableUpsampleCM:
    def test_cm_matches_plain(self, rng, monkeypatch):
        """The channel-major doubling path must match the flax transpconv
        chain (shared weights across doublings) with an identical tree."""
        from dinounet_tpu.models.layers import LearnableUpsample

        x = _rand(rng, (2, 32, 32, 8))
        mod = LearnableUpsample()

        monkeypatch.setenv("DINOUNET_TPU_DECODER_TAIL", "jax")
        v1 = mod.init(jax.random.PRNGKey(0), x, (128, 128))
        ref = mod.apply(v1, x, (128, 128))

        monkeypatch.setenv("DINOUNET_TPU_DECODER_TAIL", "interpret")
        v2 = mod.init(jax.random.PRNGKey(0), x, (128, 128))
        import jax.tree_util as jtu
        p1 = {jtu.keystr(k): a.shape for k, a in jtu.tree_leaves_with_path(v1)}
        p2 = {jtu.keystr(k): a.shape for k, a in jtu.tree_leaves_with_path(v2)}
        assert p1 == p2

        got = mod.apply(v1, x, (128, 128))
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref, np.float32),
                                   atol=0.05, rtol=0.03)

    def test_train_uses_plain_path(self, rng, monkeypatch):
        from dinounet_tpu.models.layers import LearnableUpsample

        x = _rand(rng, (1, 16, 16, 8))
        mod = LearnableUpsample()
        monkeypatch.setenv("DINOUNET_TPU_DECODER_TAIL", "jax")
        v = mod.init(jax.random.PRNGKey(0), x, (32, 32))
        ref = mod.apply(v, x, (32, 32), train=True)
        monkeypatch.setenv("DINOUNET_TPU_DECODER_TAIL", "interpret")
        got = mod.apply(v, x, (32, 32), train=True)
        np.testing.assert_array_equal(np.asarray(got, np.float32),
                                      np.asarray(ref, np.float32))


class TestDecoderIntegration:
    def _decoder(self, deep_supervision=False):
        from dinounet_tpu.models.decoder import UNetDecoder

        return UNetDecoder(
            encoder_channels=[8, 16, 32],
            encoder_strides=[(2, 2), (2, 2), (2, 2)],
            encoder_kernel_sizes=[(3, 3), (3, 3), (3, 3)],
            num_classes=3,
            n_conv_per_stage=[2, 2],
            deep_supervision=deep_supervision,
        )

    def _skips(self, rng):
        return [
            _rand(rng, (2, 128, 128, 8)),
            _rand(rng, (2, 64, 64, 16)),
            _rand(rng, (2, 32, 32, 32)),
        ]

    def test_fused_matches_plain(self, rng, monkeypatch):
        dec = self._decoder()
        skips = self._skips(rng)

        monkeypatch.setenv("DINOUNET_TPU_DECODER_TAIL", "jax")
        v1 = dec.init(jax.random.PRNGKey(0), skips)
        ref = dec.apply(v1, skips)

        monkeypatch.setenv("DINOUNET_TPU_DECODER_TAIL", "interpret")
        v2 = dec.init(jax.random.PRNGKey(0), skips)
        import jax.tree_util as jtu
        p1 = {jtu.keystr(k): (a.shape, np.asarray(a, np.float32).sum())
              for k, a in jtu.tree_leaves_with_path(v1)}
        p2 = {jtu.keystr(k): (a.shape, np.asarray(a, np.float32).sum())
              for k, a in jtu.tree_leaves_with_path(v2)}
        assert p1 == p2  # identical trees AND identical init values

        got = dec.apply(v1, skips)
        assert got.dtype == ref.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=0.08, rtol=0.04)

    def test_deep_supervision_heads_unchanged(self, rng, monkeypatch):
        """With DS on, only the top head goes through the fused tail; the
        lower-resolution heads are bit-identical to the plain path."""
        dec = self._decoder(deep_supervision=True)
        skips = self._skips(rng)

        monkeypatch.setenv("DINOUNET_TPU_DECODER_TAIL", "jax")
        v = dec.init(jax.random.PRNGKey(0), skips)
        ref = dec.apply(v, skips)

        monkeypatch.setenv("DINOUNET_TPU_DECODER_TAIL", "interpret")
        got = dec.apply(v, skips)
        assert len(got) == len(ref) == 2
        for r, g in zip(ref[1:], got[1:]):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(r))
        np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                                   atol=0.08, rtol=0.04)

    def test_full_chain_matches_plain(self, rng, monkeypatch):
        """When every stage is eligible (all skips >= 128 lanes) the whole
        decoder runs channel-major; outputs must match the plain path, with
        identical param trees, in both DS modes."""
        from dinounet_tpu.models.decoder import UNetDecoder

        for ds in (False, True):
            dec = UNetDecoder(
                encoder_channels=[8, 16, 32],
                encoder_strides=[(2, 2), (2, 2), (2, 2)],
                encoder_kernel_sizes=[(3, 3), (3, 3), (3, 3)],
                num_classes=3,
                n_conv_per_stage=[2, 2],
                deep_supervision=ds,
            )
            skips = [
                _rand(rng, (2, 256, 256, 8)),
                _rand(rng, (2, 128, 128, 16)),
                _rand(rng, (2, 64, 64, 32)),
            ]
            monkeypatch.setenv("DINOUNET_TPU_DECODER_TAIL", "jax")
            v1 = dec.init(jax.random.PRNGKey(0), skips)
            ref = dec.apply(v1, skips)

            monkeypatch.setenv("DINOUNET_TPU_DECODER_TAIL", "interpret")
            v2 = dec.init(jax.random.PRNGKey(0), skips)
            import jax.tree_util as jtu
            p1 = {jtu.keystr(k): a.shape
                  for k, a in jtu.tree_leaves_with_path(v1)}
            p2 = {jtu.keystr(k): a.shape
                  for k, a in jtu.tree_leaves_with_path(v2)}
            assert p1 == p2

            got = dec.apply(v1, skips)
            ref_list = ref if ds else [ref]
            got_list = got if ds else [got]
            assert len(got_list) == len(ref_list)
            for r, g in zip(ref_list, got_list):
                np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                           atol=0.15, rtol=0.05)

    def test_train_path_unchanged(self, rng, monkeypatch):
        dec = self._decoder()
        skips = self._skips(rng)
        monkeypatch.setenv("DINOUNET_TPU_DECODER_TAIL", "jax")
        v = dec.init(jax.random.PRNGKey(0), skips)
        ref = dec.apply(v, skips, train=True)
        monkeypatch.setenv("DINOUNET_TPU_DECODER_TAIL", "interpret")
        got = dec.apply(v, skips, train=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_unsupported_shape_falls_back(self, rng, monkeypatch):
        """W = 96 is not a lane multiple: the fused gate must decline and the
        plain path must run."""
        from dinounet_tpu.models.decoder import UNetDecoder

        dec = UNetDecoder(
            encoder_channels=[8, 16],
            encoder_strides=[(2, 2), (2, 2)],
            encoder_kernel_sizes=[(3, 3), (3, 3)],
            num_classes=2,
            n_conv_per_stage=[2],
        )
        skips = [_rand(rng, (1, 96, 96, 8)), _rand(rng, (1, 48, 48, 16))]
        monkeypatch.setenv("DINOUNET_TPU_DECODER_TAIL", "interpret")
        out = dec.apply(dec.init(jax.random.PRNGKey(0), skips), skips)
        assert out.shape == (1, 96, 96, 2)


class TestSPMStemCM:
    """The SpatialPriorModule's channel-major stem2/stem3 fast path
    (DINOUNET_TPU_SPM_CM) vs the plain flax graph — identical params and
    running stats, inference semantics."""

    @staticmethod
    def _module_and_input(rng):
        from dinounet_tpu.models.adapter import SpatialPriorModule

        spm = SpatialPriorModule(inplanes=8, embed_dim=16, dtype=jnp.float32)
        # stem2/stem3 run at 1/4 resolution: input 256 wide -> 128-lane maps
        x = jnp.asarray(rng.standard_normal((2, 256, 256, 1)), jnp.float32)
        return spm, x

    @staticmethod
    def _perturb_stats(variables, rng):
        """Non-default running stats so the BN applies are actually tested."""
        import flax

        bs = flax.core.unfreeze(variables["batch_stats"])
        for name in bs:
            for key in bs[name]:
                shape = bs[name][key].shape
                off = jnp.asarray(rng.uniform(0.1, 1.0, shape), jnp.float32)
                bs[name][key] = (bs[name][key] + off if key == "mean"
                                 else bs[name][key] * (1.0 + off))
        return {**variables, "batch_stats": bs}

    def test_matches_flax_path(self, rng, monkeypatch):
        spm, x = self._module_and_input(rng)
        monkeypatch.setenv("DINOUNET_TPU_SPM_CM", "jax")
        v = spm.init(jax.random.PRNGKey(0), x)
        v = self._perturb_stats(v, rng)
        ref = spm.apply(v, x)

        monkeypatch.setenv("DINOUNET_TPU_SPM_CM", "interpret")
        got = spm.apply(v, x)
        for r, g in zip(ref, got):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       rtol=1e-4, atol=1e-5)

    def test_param_trees_interchangeable(self, rng, monkeypatch):
        spm, x = self._module_and_input(rng)
        monkeypatch.setenv("DINOUNET_TPU_SPM_CM", "jax")
        v_flax = spm.init(jax.random.PRNGKey(0), x)
        monkeypatch.setenv("DINOUNET_TPU_SPM_CM", "interpret")
        v_cm = spm.init(jax.random.PRNGKey(0), x)
        assert jax.tree_util.tree_structure(v_flax) == \
            jax.tree_util.tree_structure(v_cm)
        for a, b in zip(jax.tree_util.tree_leaves(v_flax),
                        jax.tree_util.tree_leaves(v_cm)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_train_path_keeps_flax_graph(self, rng, monkeypatch):
        """train=True must never engage the CM stem (batch-stat updates)."""
        spm, x = self._module_and_input(rng)
        monkeypatch.setenv("DINOUNET_TPU_SPM_CM", "interpret")
        v = spm.init(jax.random.PRNGKey(0), x, train=True)
        out, mut = spm.apply(v, x, train=True, mutable=["batch_stats"])
        # batch stats updated => the flax BatchNorm ran
        before = v["batch_stats"]["stem2_bn"]["mean"]
        after = mut["batch_stats"]["stem2_bn"]["mean"]
        assert not np.allclose(np.asarray(before), np.asarray(after))

    def test_ineligible_shape_falls_back(self, rng, monkeypatch):
        from dinounet_tpu.models.adapter import SpatialPriorModule

        spm = SpatialPriorModule(inplanes=8, embed_dim=16, dtype=jnp.float32)
        x = jnp.asarray(rng.standard_normal((1, 192, 192, 1)), jnp.float32)
        monkeypatch.setenv("DINOUNET_TPU_SPM_CM", "interpret")
        outs = spm.apply(spm.init(jax.random.PRNGKey(0), x), x)
        assert outs[0].shape == (1, 48, 48, 16)


class TestWideDecoderMode:
    """DINOUNET_TPU_DECODER_WIDE=1: sub-128-channel decoder stages run their
    convs zero-padded to the full 128-lane tile (configuration.
    decoder_wide_convs). Round-3 hardware A/B: LOST (143.05 vs 147.45 p/s,
    .bench_logs/ab_wide_r3.json) — kept opt-in as a documented negative
    result; these tests pin its correctness."""

    def _decoder(self, deep_supervision=False):
        from dinounet_tpu.models.decoder import UNetDecoder

        return UNetDecoder(
            encoder_channels=[8, 16, 32],
            encoder_strides=[(2, 2), (2, 2), (2, 2)],
            encoder_kernel_sizes=[(3, 3), (3, 3), (3, 3)],
            num_classes=3,
            n_conv_per_stage=[2, 2],
            deep_supervision=deep_supervision,
        )

    def _skips(self, rng):
        return [
            _rand(rng, (2, 64, 64, 8)),
            _rand(rng, (2, 32, 32, 16)),
            _rand(rng, (2, 16, 16, 32)),
        ]

    @pytest.mark.parametrize("ds", [False, True])
    def test_wide_matches_plain_with_identical_tree(self, rng, monkeypatch,
                                                    ds):
        import jax.tree_util as jtu

        monkeypatch.setenv("DINOUNET_TPU_DECODER_TAIL", "jax")
        dec = self._decoder(deep_supervision=ds)
        skips = self._skips(rng)

        monkeypatch.setenv("DINOUNET_TPU_DECODER_WIDE", "0")
        v1 = dec.init(jax.random.PRNGKey(0), skips)
        ref = dec.apply(v1, skips)

        monkeypatch.setenv("DINOUNET_TPU_DECODER_WIDE", "1")
        v2 = dec.init(jax.random.PRNGKey(0), skips)
        p1 = {jtu.keystr(k): (a.shape, np.asarray(a, np.float32).sum())
              for k, a in jtu.tree_leaves_with_path(v1)}
        p2 = {jtu.keystr(k): (a.shape, np.asarray(a, np.float32).sum())
              for k, a in jtu.tree_leaves_with_path(v2)}
        assert p1 == p2  # identical trees AND identical init values

        got = dec.apply(v1, skips)
        refs = ref if ds else [ref]
        gots = got if ds else [got]
        assert len(gots) == len(refs)
        for r, g in zip(refs, gots):
            assert g.shape == r.shape  # logits never stay padded
            np.testing.assert_allclose(np.asarray(g, np.float32),
                                       np.asarray(r, np.float32),
                                       atol=0.05, rtol=0.03)

    def test_train_path_unaffected(self, rng, monkeypatch):
        monkeypatch.setenv("DINOUNET_TPU_DECODER_TAIL", "jax")
        dec = self._decoder()
        skips = self._skips(rng)
        monkeypatch.setenv("DINOUNET_TPU_DECODER_WIDE", "0")
        v = dec.init(jax.random.PRNGKey(0), skips)
        ref = dec.apply(v, skips, train=True)
        monkeypatch.setenv("DINOUNET_TPU_DECODER_WIDE", "1")
        got = dec.apply(v, skips, train=True)
        np.testing.assert_array_equal(np.asarray(got, np.float32),
                                      np.asarray(ref, np.float32))


class TestSegReduceFormulation:
    """DINOUNET_TPU_SEG_REDUCE=1: broadcast-mul+reduce seg head. Round-3
    hardware A/B: LOST (141.03 vs 147.79 p/s, .bench_logs/ab_seg_r3.json —
    XLA relayouts the padded-lane map instead of reducing across lanes);
    kept opt-in as a documented negative result, parity pinned here."""

    def test_reduce_matches_dot(self, rng, monkeypatch):
        from dinounet_tpu.models.decoder import UNetDecoder

        monkeypatch.setenv("DINOUNET_TPU_DECODER_TAIL", "jax")
        dec = UNetDecoder(
            encoder_channels=[8, 16, 32],
            encoder_strides=[(2, 2), (2, 2), (2, 2)],
            encoder_kernel_sizes=[(3, 3), (3, 3), (3, 3)],
            num_classes=3, n_conv_per_stage=[2, 2], deep_supervision=True)
        skips = [_rand(rng, (2, 64, 64, 8)), _rand(rng, (2, 32, 32, 16)),
                 _rand(rng, (2, 16, 16, 32))]

        monkeypatch.setenv("DINOUNET_TPU_SEG_REDUCE", "0")
        monkeypatch.setenv("DINOUNET_TPU_SEG_IMPL", "dot")
        v = dec.init(jax.random.PRNGKey(0), skips)
        ref = dec.apply(v, skips)
        ref_train = dec.apply(v, skips, train=True)

        monkeypatch.setenv("DINOUNET_TPU_SEG_REDUCE", "1")
        assert {str(k) for k in dec.init(jax.random.PRNGKey(0), skips)} \
            == {str(k) for k in v}
        got = dec.apply(v, skips)
        for r, g in zip(ref, got):
            # reduce computes in f32 where dot uses bf16 operands: equal to
            # within bf16 rounding of the inputs
            np.testing.assert_allclose(np.asarray(g, np.float32),
                                       np.asarray(r, np.float32),
                                       atol=0.02, rtol=0.02)
        # training always keeps the dot form (bit-identical)
        got_train = dec.apply(v, skips, train=True)
        for r, g in zip(ref_train, got_train):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(r))


class TestSegConvFormulation:
    """DINOUNET_TPU_SEG_IMPL=conv: the seg head as a real 1x1
    conv_general_dilated so XLA's convolution input fusion absorbs the
    stage's InstanceNorm-apply + leaky producer (the 1.63 ms standalone
    kLoop pass in the round-4 trace existed ONLY before the seg dot).
    Same weights, same contraction — parity vs the dot form pinned here."""

    def _decoder(self):
        from dinounet_tpu.models.decoder import UNetDecoder

        return UNetDecoder(
            encoder_channels=[8, 16, 32],
            encoder_strides=[(2, 2), (2, 2), (2, 2)],
            encoder_kernel_sizes=[(3, 3), (3, 3), (3, 3)],
            num_classes=3, n_conv_per_stage=[2, 2], deep_supervision=True)

    @pytest.mark.parametrize("impl", ["conv", "convw", "convbf"])
    def test_conv_matches_dot(self, rng, monkeypatch, impl):
        monkeypatch.setenv("DINOUNET_TPU_DECODER_TAIL", "jax")
        dec = self._decoder()
        skips = [_rand(rng, (2, 64, 64, 8)), _rand(rng, (2, 32, 32, 16)),
                 _rand(rng, (2, 16, 16, 32))]

        monkeypatch.setenv("DINOUNET_TPU_SEG_IMPL", "dot")
        v = dec.init(jax.random.PRNGKey(0), skips)
        ref = dec.apply(v, skips)
        ref_train = dec.apply(v, skips, train=True)

        monkeypatch.setenv("DINOUNET_TPU_SEG_IMPL", impl)
        assert {str(k) for k in dec.init(jax.random.PRNGKey(0), skips)} \
            == {str(k) for k in v}
        got = dec.apply(v, skips)
        for r, g in zip(ref, got):
            assert g.dtype == r.dtype == jnp.float32
            # both contract bf16 operands with f32 accumulation; conv may
            # order the K-sum differently -> allow accumulation-order noise
            # (convbf additionally rounds the logits through bf16 once)
            tol = 0.02 if impl == "convbf" else 1e-4
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       atol=tol, rtol=tol)
        # training always keeps the dot form (bit-identical)
        got_train = dec.apply(v, skips, train=True)
        for r, g in zip(ref_train, got_train):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(r))

    def test_conv_matches_dot_3d(self, rng, monkeypatch):
        from dinounet_tpu.models.decoder import UNetDecoder

        monkeypatch.setenv("DINOUNET_TPU_DECODER_TAIL", "jax")
        dec = UNetDecoder(
            encoder_channels=[8, 16],
            encoder_strides=[(2, 2, 2), (2, 2, 2)],
            encoder_kernel_sizes=[(3, 3, 3), (3, 3, 3)],
            num_classes=4, n_conv_per_stage=[2], deep_supervision=False)
        skips = [_rand(rng, (1, 16, 16, 16, 8)), _rand(rng, (1, 8, 8, 8, 16))]

        monkeypatch.setenv("DINOUNET_TPU_SEG_IMPL", "dot")
        v = dec.init(jax.random.PRNGKey(0), skips)
        ref = dec.apply(v, skips)
        monkeypatch.setenv("DINOUNET_TPU_SEG_IMPL", "conv")
        got = dec.apply(v, skips)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-4, rtol=1e-4)
        monkeypatch.setenv("DINOUNET_TPU_SEG_IMPL", "convw")
        got = dec.apply(v, skips)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-4, rtol=1e-4)
