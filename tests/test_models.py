"""Model construction + forward-shape tests for the DinoUNet stack."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dinounet_tpu.models.dinounet import DinoUNet, DinoUNetConfig
from dinounet_tpu.models.vit import VIT_CONFIGS, DinoViT, ViTConfig, rope_sincos


TINY_VIT = ViTConfig(embed_dim=64, depth=4, num_heads=2, ffn_ratio=2, n_storage_tokens=4)


def tiny_config(**kw):
    defaults = dict(
        vit=TINY_VIT, interaction_indexes=(0, 1, 2, 3), num_classes=3,
        features_per_stage=(8, 16, 32, 64), n_conv_per_stage_decoder=(2, 2, 2),
        deform_num_heads=4, fapm_rank=16, conv_inplane=8, remat_adapter=False,
    )
    defaults.update(kw)
    return DinoUNetConfig(**defaults)


class TestViT:
    def test_rope_tables(self):
        sin, cos = rope_sincos(4, 6, 16)
        assert sin.shape == (24, 16) and cos.shape == (24, 16)
        np.testing.assert_allclose(np.asarray(sin**2 + cos**2), 1.0, atol=1e-6)

    def test_intermediate_layers(self):
        model = DinoViT(TINY_VIT)
        x = jnp.zeros((2, 32, 32, 3))
        vars_ = model.init(jax.random.key(0), x, (1, 3))
        outs = model.apply(vars_, x, (1, 3))
        assert len(outs) == 2
        patch, cls = outs[0]
        assert patch.shape == (2, 4, 2 * 2, 64)[0:1] + (4, 64) or patch.shape == (2, 4, 64)
        assert patch.shape == (2, 4, 64)
        assert cls.shape == (2, 64)

    def test_configs_registered(self):
        assert set(VIT_CONFIGS) == {
            "dinov3_vits16", "dinov3_vitb16", "dinov3_vitl16", "dinov3_vit7b16"
        }
        assert VIT_CONFIGS["dinov3_vit7b16"].ffn_layer == "swiglu"
        assert not VIT_CONFIGS["dinov3_vit7b16"].qkv_bias


class TestDinoUNet:
    @pytest.fixture(scope="class")
    def built(self):
        model = DinoUNet(tiny_config())
        x = jnp.zeros((2, 64, 64, 1))
        variables = model.init({"params": jax.random.key(0)}, x, train=False)
        return model, variables

    def test_eval_forward_shape(self, built):
        model, variables = built
        out = model.apply(variables, jnp.ones((2, 64, 64, 1)), train=False)
        assert out.shape == (2, 64, 64, 3)
        assert out.dtype == jnp.float32

    def test_train_forward_with_batchstats(self, built):
        model, variables = built
        out, mut = model.apply(
            variables, jnp.ones((2, 64, 64, 1)), train=True,
            rngs={"dropout": jax.random.key(1)}, mutable=["batch_stats"],
        )
        assert out.shape == (2, 64, 64, 3)
        assert "batch_stats" in mut

    def test_deep_supervision_outputs(self):
        model = DinoUNet(tiny_config(deep_supervision=True))
        x = jnp.zeros((1, 64, 64, 1))
        variables = model.init({"params": jax.random.key(0)}, x, train=True)
        outs = model.apply(variables, x, train=True,
                           rngs={"dropout": jax.random.key(1)},
                           mutable=["batch_stats"])[0]
        assert isinstance(outs, list) and len(outs) == 3
        assert outs[0].shape == (1, 64, 64, 3)
        assert outs[1].shape == (1, 32, 32, 3)
        assert outs[2].shape == (1, 16, 16, 3)

    def test_multichannel_inputs(self, built):
        model, variables = built
        for c in (1, 3):
            out = model.apply(variables, jnp.ones((1, 64, 64, c)), train=False)
            assert out.shape == (1, 64, 64, 3)

    def test_backbone_frozen(self, built):
        """Gradients through the loss must be zero for backbone params."""
        model, variables = built

        def loss_fn(params):
            out = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                jnp.ones((1, 64, 64, 1)), train=False,
            )
            return (out ** 2).mean()

        grads = jax.grad(loss_fn)(variables["params"])
        backbone_grads = jax.tree.leaves(grads["backbone"])
        assert all(float(jnp.abs(g).max()) == 0.0 for g in backbone_grads)
        decoder_grads = jax.tree.leaves(grads["decoder"])
        assert any(float(jnp.abs(g).max()) > 0.0 for g in decoder_grads)

    def test_from_plans_arch(self):
        arch = {
            "n_stages": 7,
            "features_per_stage": [32, 64, 128, 256, 512, 512, 512],
            "kernel_sizes": [[3, 3]] * 7,
            "strides": [[1, 1]] + [[2, 2]] * 6,
            "n_conv_per_stage": [2] * 7,
            "n_conv_per_stage_decoder": [2] * 6,
            "conv_bias": True,
            "norm_op": "torch.nn.modules.instancenorm.InstanceNorm2d",
            "norm_op_kwargs": {"eps": 1e-05, "affine": True},
            "dropout_op": None,
            "dropout_op_kwargs": None,
            "nonlin": "torch.nn.LeakyReLU",
            "nonlin_kwargs": {"inplace": True},
        }
        cfg = DinoUNetConfig.from_plans_arch(arch, num_classes=2, model_name="dinounet_s")
        # forced down to 4 stages (ref dinounet_training.py:703-711)
        assert len(cfg.features_per_stage) == 4
        assert cfg.features_per_stage == (32, 64, 128, 256)
        assert cfg.norm == "instancenorm"
        assert cfg.nonlin == "leaky_relu"
        assert cfg.vit.embed_dim == 384


class TestCheckpointConverter:
    """Round-trip of the torch->flax key mapping (ref: hub/backbones.py weight
    loading; converter at models/convert.py)."""

    def test_synthetic_state_dict_roundtrip(self, tmp_path):
        import numpy as np

        from dinounet_tpu.models.convert import (
            convert_dinov3_state_dict,
            load_backbone_params,
            load_dinov3_params_into,
            save_backbone_params,
        )
        from dinounet_tpu.models.vit import DinoViT, ViTConfig

        cfg = ViTConfig(embed_dim=32, depth=2, num_heads=2, dtype="float32")
        model = DinoViT(cfg)
        x = jnp.zeros((1, 32, 32, 3))
        variables = model.init(jax.random.PRNGKey(0), x, (0, 1))
        ref = variables["params"]

        rng = np.random.default_rng(0)
        E, p = cfg.embed_dim, cfg.patch_size
        sd = {
            "patch_embed.proj.weight": rng.standard_normal((E, 3, p, p)).astype(np.float32),
            "patch_embed.proj.bias": rng.standard_normal(E).astype(np.float32),
            "cls_token": rng.standard_normal(ref["cls_token"].shape).astype(np.float32),
            "storage_tokens": rng.standard_normal(ref["storage_tokens"].shape).astype(np.float32),
            "norm.weight": rng.standard_normal(E).astype(np.float32),
            "norm.bias": rng.standard_normal(E).astype(np.float32),
        }
        for i in range(cfg.depth):
            pfx = f"blocks.{i}."
            sd[pfx + "norm1.weight"] = rng.standard_normal(E).astype(np.float32)
            sd[pfx + "norm1.bias"] = rng.standard_normal(E).astype(np.float32)
            sd[pfx + "norm2.weight"] = rng.standard_normal(E).astype(np.float32)
            sd[pfx + "norm2.bias"] = rng.standard_normal(E).astype(np.float32)
            sd[pfx + "attn.qkv.weight"] = rng.standard_normal((3 * E, E)).astype(np.float32)
            sd[pfx + "attn.qkv.bias"] = rng.standard_normal(3 * E).astype(np.float32)
            # mask_k_bias: k-section of the qkv bias is masked out (ref attention.py:30-40)
            mask = np.ones(3 * E, np.float32)
            mask[E : 2 * E] = 0.0
            sd[pfx + "attn.qkv.bias_mask"] = mask
            sd[pfx + "attn.proj.weight"] = rng.standard_normal((E, E)).astype(np.float32)
            sd[pfx + "attn.proj.bias"] = rng.standard_normal(E).astype(np.float32)
            sd[pfx + "ls1.gamma"] = rng.standard_normal(E).astype(np.float32)
            sd[pfx + "ls2.gamma"] = rng.standard_normal(E).astype(np.float32)
            H = cfg.ffn_hidden
            sd[pfx + "mlp.fc1.weight"] = rng.standard_normal((H, E)).astype(np.float32)
            sd[pfx + "mlp.fc1.bias"] = rng.standard_normal(H).astype(np.float32)
            sd[pfx + "mlp.fc2.weight"] = rng.standard_normal((E, H)).astype(np.float32)
            sd[pfx + "mlp.fc2.bias"] = rng.standard_normal(E).astype(np.float32)

        converted = convert_dinov3_state_dict(sd, cfg)

        # structure matches the model's init tree exactly
        assert jax.tree_util.tree_structure(
            jax.tree.map(lambda x: 0, converted)
        ) == jax.tree_util.tree_structure(jax.tree.map(lambda x: 0, ref))
        for pth, leaf in jax.tree_util.tree_flatten_with_path(converted)[0]:
            ref_leaf = ref
            for k in pth:
                ref_leaf = ref_leaf[k.key]
            assert tuple(leaf.shape) == tuple(ref_leaf.shape), pth

        # orientation: qkv kernel is W.T; k-bias masked to zero
        blk = converted["block0"]
        np.testing.assert_allclose(blk["attn"]["qkv"]["kernel"],
                                   sd["blocks.0.attn.qkv.weight"].T)
        E_ = cfg.embed_dim
        np.testing.assert_allclose(blk["attn"]["qkv"]["bias"][E_:2 * E_], 0.0)

        # save -> load -> splice into a full model's variables
        out = tmp_path / "backbone.msgpack"
        save_backbone_params(converted, str(out))
        restored = load_backbone_params(str(out))
        np.testing.assert_allclose(restored["block1"]["ls1_gamma"],
                                   converted["block1"]["ls1_gamma"])

        full = {"params": {"backbone": ref, "head": {"w": jnp.zeros((2, 2))}}}
        spliced = load_dinov3_params_into(full, str(out))
        np.testing.assert_allclose(
            np.asarray(spliced["params"]["backbone"]["block0"]["attn"]["proj"]["kernel"]),
            sd["blocks.0.attn.proj.weight"].T, rtol=1e-6)


class TestSwiGLUPath:
    """The dinounet_7b backbone flavor: SwiGLU FFN, no qkv bias
    (ref hub/backbones.py:452-494)."""

    def test_forward(self):
        from dinounet_tpu.models.vit import DinoViT, ViTConfig

        cfg = ViTConfig(embed_dim=64, depth=2, num_heads=2, ffn_ratio=3.0,
                        ffn_layer="swiglu", swiglu_align=8, qkv_bias=False,
                        dtype="float32")
        model = DinoViT(cfg)
        x = jnp.zeros((1, 32, 32, 3))
        variables = model.init(jax.random.PRNGKey(0), x, (0, 1))
        outs = model.apply(variables, x, (0, 1))
        assert len(outs) == 2
        patches, cls = outs[-1]
        assert patches.shape == (1, 4, 64)
        params = variables["params"]["block0"]["mlp"]
        assert set(params.keys()) == {"w1", "w2", "w3"}
        assert "bias" not in variables["params"]["block0"]["attn"]["qkv"]

    def test_dinounet_7b_config_builds(self):
        from dinounet_tpu.models.dinounet import (
            DINOV3_INTERACTION_INDEXES,
            DINOV3_MODEL_NAMES,
            DinoUNetConfig,
        )
        from dinounet_tpu.models.vit import VIT_CONFIGS

        cfg = DinoUNetConfig(
            vit=VIT_CONFIGS[DINOV3_MODEL_NAMES["dinounet_7b"]],
            interaction_indexes=DINOV3_INTERACTION_INDEXES["dinounet_7b"],
            num_classes=2)
        assert cfg.vit.embed_dim == 4096
        assert cfg.interaction_indexes == (9, 19, 29, 39)


def test_converter_bf16_checkpoint(tmp_path):
    """A torch bf16 .pth converts without fp32 blow-up: params stay bf16 in
    the msgpack and match the source bit-exactly."""
    import os

    import numpy as np
    import torch

    from dinounet_tpu.models.convert import (
        convert_torch_checkpoint,
        load_backbone_params,
    )
    from dinounet_tpu.models.vit import VIT_CONFIGS

    cfg = VIT_CONFIGS["dinov3_vits16"]
    E, p, H = cfg.embed_dim, cfg.patch_size, cfg.ffn_hidden
    g = torch.Generator().manual_seed(0)

    def bf(*shape):
        return torch.randn(*shape, generator=g).bfloat16()

    sd = {
        "patch_embed.proj.weight": bf(E, 3, p, p),
        "patch_embed.proj.bias": bf(E),
        "cls_token": bf(1, 1, E),
        "storage_tokens": bf(1, 4, E),
        "norm.weight": bf(E),
        "norm.bias": bf(E),
    }
    for i in range(cfg.depth):
        pf = f"blocks.{i}."
        sd.update({
            pf + "norm1.weight": bf(E), pf + "norm1.bias": bf(E),
            pf + "norm2.weight": bf(E), pf + "norm2.bias": bf(E),
            pf + "attn.qkv.weight": bf(3 * E, E), pf + "attn.qkv.bias": bf(3 * E),
            pf + "attn.proj.weight": bf(E, E), pf + "attn.proj.bias": bf(E),
            pf + "ls1.gamma": bf(E), pf + "ls2.gamma": bf(E),
            pf + "mlp.fc1.weight": bf(H, E), pf + "mlp.fc1.bias": bf(H),
            pf + "mlp.fc2.weight": bf(E, H), pf + "mlp.fc2.bias": bf(E),
        })
    pth = os.path.join(tmp_path, "ckpt.pth")
    torch.save(sd, pth)
    out = os.path.join(tmp_path, "backbone.msgpack")
    # verify=False: this is a deliberately partial synthetic checkpoint (no
    # bias_mask/mask_token/rope buffer); published-layout verification is
    # covered by test_convert_manifest.py
    convert_torch_checkpoint(pth, "dinov3_vits16", out, verify=False)

    params = load_backbone_params(out)
    k = params["block0"]["attn"]["qkv"]["kernel"]
    assert str(k.dtype) == "bfloat16"
    ref = sd["blocks.0.attn.qkv.weight"].float().numpy().T
    np.testing.assert_array_equal(ref, np.asarray(k, np.float32))


class TestSplitConcatDecoder:
    """conv0(concat(up, skip)) == conv0[:, :, :C](up) + conv0[:, :, C:](skip)
    (models/decoder.py::_split_concat_stage, configuration.
    decoder_concat_impl): same param tree, same outputs up to f32
    accumulation order, same gradients."""

    def _decoder(self, dtype=jnp.bfloat16):
        from dinounet_tpu.models.decoder import UNetDecoder

        dec = UNetDecoder(
            encoder_channels=[8, 16, 32],
            encoder_strides=[(2, 2), (2, 2), (2, 2)],
            encoder_kernel_sizes=[(3, 3), (3, 3), (3, 3)],
            num_classes=3, n_conv_per_stage=[2, 2], deep_supervision=True,
            dtype=dtype)
        rng = np.random.default_rng(7)
        skips = [jnp.asarray(rng.normal(size=s), dtype) for s in
                 [(2, 16, 16, 8), (2, 8, 8, 16), (2, 4, 4, 32)]]
        return dec, skips

    @pytest.mark.parametrize("train", [False, True])
    def test_param_tree_and_forward_match(self, train, monkeypatch):
        dec, skips = self._decoder(jnp.float32)
        monkeypatch.setenv("DINOUNET_TPU_DECODER_CONCAT", "concat")
        v = dec.init(jax.random.PRNGKey(0), skips, train=train)
        ref = dec.apply(v, skips, train=train)
        monkeypatch.setenv("DINOUNET_TPU_DECODER_CONCAT", "split")
        v2 = dec.init(jax.random.PRNGKey(0), skips, train=train)
        assert jax.tree_util.tree_structure(v) == \
            jax.tree_util.tree_structure(v2)
        got = dec.apply(v, skips, train=train)
        for g, r in zip(got, ref):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       rtol=2e-5, atol=2e-5)

    def test_bf16_forward_close(self, monkeypatch):
        dec, skips = self._decoder(jnp.bfloat16)
        monkeypatch.setenv("DINOUNET_TPU_DECODER_CONCAT", "concat")
        v = dec.init(jax.random.PRNGKey(0), skips)
        ref = dec.apply(v, skips)
        monkeypatch.setenv("DINOUNET_TPU_DECODER_CONCAT", "split")
        got = dec.apply(v, skips)
        for g, r in zip(got, ref):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       rtol=0.05, atol=0.05)

    def test_gradients_match(self, monkeypatch):
        dec, skips = self._decoder(jnp.float32)
        monkeypatch.setenv("DINOUNET_TPU_DECODER_CONCAT", "concat")
        v = dec.init(jax.random.PRNGKey(0), skips, train=True)

        def loss(params, impl):
            monkeypatch.setenv("DINOUNET_TPU_DECODER_CONCAT", impl)
            outs = dec.apply({"params": params}, skips, train=True)
            return sum(jnp.sum(o * o) for o in outs)

        g_ref = jax.grad(lambda p: loss(p, "concat"))(v["params"])
        g_spl = jax.grad(lambda p: loss(p, "split"))(v["params"])
        flat_r, _ = jax.tree_util.tree_flatten(g_ref)
        flat_s, _ = jax.tree_util.tree_flatten(g_spl)
        for a, b in zip(flat_r, flat_s):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-3)


class TestPhaseResize:
    """Phase-decomposed integer-ratio bilinear resize vs the matmul path
    (models/layers.py::_phase_axis_resize) and vs torch F.interpolate."""

    def _pair(self, shape, size, dtype, monkeypatch):
        from dinounet_tpu.models import layers

        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=shape), dtype)
        monkeypatch.setenv("DINOUNET_TPU_RESIZE_IMPL", "matmul")
        ref = layers.bilinear_resize(x, size)
        monkeypatch.setenv("DINOUNET_TPU_RESIZE_IMPL", "phase")
        got = layers.bilinear_resize(x, size)
        return got, ref, x

    PAIRS = [
        ((2, 8, 8, 5), (32, 32)),   # 4x up — the add_vit_feature scale-0 map
        ((2, 8, 8, 5), (16, 16)),   # 2x up
        ((2, 8, 8, 5), (4, 4)),     # 0.5x down
        ((1, 8, 6, 3), (32, 12)),   # mixed 4x/2x
        ((1, 9, 9, 2), (3, 3)),     # odd 3x down (single-tap phases)
    ]

    @pytest.mark.parametrize("shape,size", PAIRS)
    def test_bf16_bitwise_vs_matmul(self, shape, size, monkeypatch):
        # bf16 is the in-model dtype: the 2-tap products/sum are exact in the
        # f32 compute both paths share, so the rounded outputs are identical
        got, ref, _ = self._pair(shape, size, jnp.bfloat16, monkeypatch)
        np.testing.assert_array_equal(np.asarray(got, np.float32),
                                      np.asarray(ref, np.float32))

    @pytest.mark.parametrize("shape,size", PAIRS + [((1, 8, 8, 4), (24, 24))])
    def test_f32_close_vs_matmul(self, shape, size, monkeypatch):
        # f32 differs by <=1 ulp: the einsum's dot may fuse multiply-adds
        # (FMA) where the phase path rounds each product
        got, ref, _ = self._pair(shape, size, jnp.float32, monkeypatch)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-6, atol=2e-6)

    def test_fractional_falls_back(self, monkeypatch):
        # 8 -> 12 is not an integer ratio either way: both paths must take
        # the einsum formulation and agree exactly
        got, ref, _ = self._pair((1, 8, 8, 4), (12, 12), jnp.float32,
                                 monkeypatch)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_matches_torch_interpolate(self, monkeypatch):
        import torch
        import torch.nn.functional as F

        got, _, x = self._pair((2, 8, 8, 5), (32, 16), jnp.float32,
                               monkeypatch)
        t = torch.from_numpy(np.asarray(x, np.float32)).permute(0, 3, 1, 2)
        ref = F.interpolate(t, size=(32, 16), mode="bilinear",
                            align_corners=False)
        np.testing.assert_allclose(
            np.asarray(got), ref.permute(0, 2, 3, 1).numpy(),
            rtol=1e-5, atol=1e-5)


class TestResizeEmit:
    """bhcw vs bhwc emit of the W-axis resize einsum
    (models/layers.py::_resize_emit_bhcw): same contraction, same f32
    accumulate — the outputs must be bit-identical (ADVICE r3)."""

    # fractional W ratios so the einsum path is taken regardless of
    # DINOUNET_TPU_RESIZE_IMPL, plus integer up/down ratios (which also take
    # the einsum path under the default matmul impl)
    CASES = [
        ((2, 8, 8, 5), (8, 12)),    # fractional up (W only)
        ((2, 8, 12, 5), (8, 8)),    # fractional down
        ((1, 8, 8, 3), (32, 16)),   # integer up, both axes
        ((1, 6, 16, 4), (6, 4)),    # integer 4x down
        ((1, 7, 10, 2), (21, 15)),  # odd mixed ratios
    ]

    @pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float32])
    @pytest.mark.parametrize("shape,size", CASES)
    def test_bitwise_vs_bhwc(self, shape, size, dtype, monkeypatch):
        from dinounet_tpu.models import layers

        monkeypatch.setenv("DINOUNET_TPU_RESIZE_IMPL", "matmul")
        rng = np.random.default_rng(11)
        x = jnp.asarray(rng.normal(size=shape), dtype)
        monkeypatch.setenv("DINOUNET_TPU_RESIZE_EMIT", "bhwc")
        ref = layers.bilinear_resize(x, size)
        monkeypatch.setenv("DINOUNET_TPU_RESIZE_EMIT", "bhcw")
        got = layers.bilinear_resize(x, size)
        assert got.shape == ref.shape
        assert got.dtype == ref.dtype == dtype
        np.testing.assert_array_equal(np.asarray(got, np.float32),
                                      np.asarray(ref, np.float32))


class TestPhaseTranspConv:
    """Phase-matmul 2x2/s2 transposed conv vs flax nn.ConvTranspose
    (models/layers.py::_phase_transpconv2x2): same param tree, same values."""

    @pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float32])
    def test_matches_conv_transpose(self, dtype, monkeypatch):
        from dinounet_tpu.models.layers import TransposedConv

        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.normal(size=(2, 6, 5, 12)), dtype)
        mod = TransposedConv(9, dtype=dtype)
        monkeypatch.setenv("DINOUNET_TPU_TRANSPCONV_IMPL", "conv")
        vars_ = mod.init(jax.random.key(0), x)
        ref = mod.apply(vars_, x)
        monkeypatch.setenv("DINOUNET_TPU_TRANSPCONV_IMPL", "phase")
        vars_p = mod.init(jax.random.key(0), x)
        # identical param tree (names, shapes, init values)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                       np.asarray(b)),
            vars_, vars_p)
        got = mod.apply(vars_, x)
        assert got.shape == ref.shape == (2, 12, 10, 9)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref, np.float32),
                                   rtol=2e-2 if dtype == jnp.bfloat16 else 2e-6,
                                   atol=1e-3 if dtype == jnp.bfloat16 else 1e-6)

    def test_non2x2_keeps_conv_path(self, monkeypatch):
        from dinounet_tpu.models.layers import TransposedConv

        monkeypatch.setenv("DINOUNET_TPU_TRANSPCONV_IMPL", "phase")
        x = jnp.zeros((1, 4, 4, 3), jnp.float32)
        mod = TransposedConv(5, stride=(3, 3), dtype=jnp.float32)
        vars_ = mod.init(jax.random.key(0), x)
        assert mod.apply(vars_, x).shape == (1, 12, 12, 5)
