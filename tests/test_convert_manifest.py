"""Checkpoint-conversion verification kit (offline — no egress needed).

The golden manifest (dinounet_tpu/models/checkpoint_manifest.json, generated
from the reference model definitions by tools/gen_checkpoint_manifest.py with
the published hub hyperparams, ref hub/backbones.py:201-494) pins the exact
key/shape layout of all four published DINOv3 checkpoints. These tests fail if
any published-checkpoint key would be dropped, mis-shaped, or mis-mapped by
the converter — including the 7B swiglu64 / no-qkv-bias / mask_k_bias layout.
"""

import numpy as np
import pytest

import jax

from dinounet_tpu.models.convert import (
    IGNORED_CHECKPOINT_KEYS,
    checkpoint_manifest,
    convert_dinov3_state_dict,
    verify_state_dict_against_manifest,
)
from dinounet_tpu.models.vit import VIT_CONFIGS, DinoViT, ViTConfig

ALL_MODELS = ["dinov3_vits16", "dinov3_vitb16", "dinov3_vitl16", "dinov3_vit7b16"]


def _flax_param_shapes(cfg: ViTConfig):
    """Expected backbone param tree (names + shapes) via eval_shape (no memory)."""
    model = DinoViT(cfg)
    x = jax.ShapeDtypeStruct((1, 64, 64, 3), np.float32)
    shapes = jax.eval_shape(
        lambda k, x: model.init(k, x, (cfg.depth - 1,)),
        jax.random.PRNGKey(0), x)
    return shapes["params"]


class TestManifest:
    @pytest.mark.parametrize("name", ALL_MODELS)
    def test_manifest_self_consistent(self, name):
        m = checkpoint_manifest(name)
        verify_state_dict_against_manifest(m, name)  # exact copy passes

    @pytest.mark.parametrize("name", ALL_MODELS)
    def test_missing_key_detected(self, name):
        m = dict(checkpoint_manifest(name))
        m.pop("blocks.0.attn.qkv.weight")
        with pytest.raises(ValueError, match="missing"):
            verify_state_dict_against_manifest(m, name)

    @pytest.mark.parametrize("name", ALL_MODELS)
    def test_mis_shaped_key_detected(self, name):
        m = dict(checkpoint_manifest(name))
        m["norm.weight"] = [7]
        with pytest.raises(ValueError, match="mis-shaped"):
            verify_state_dict_against_manifest(m, name)

    def test_unexpected_key_detected(self):
        m = dict(checkpoint_manifest("dinov3_vits16"))
        m["blocks.0.attn.qkv.extra"] = [1]
        with pytest.raises(ValueError, match="unexpected"):
            verify_state_dict_against_manifest(m, "dinov3_vits16")

    def test_7b_layout_flags(self):
        """The 7B manifest must reflect swiglu64 / no-qkv-bias / untied cls norm
        (ref hub/backbones.py:452-494)."""
        m = checkpoint_manifest("dinov3_vit7b16")
        assert "blocks.0.attn.qkv.bias" not in m
        assert "blocks.0.attn.qkv.bias_mask" not in m
        assert "blocks.0.mlp.w1.weight" in m and "blocks.0.mlp.fc1.weight" not in m
        assert m["blocks.0.mlp.w1.weight"] == [8192, 4096]  # swiglu64 hidden
        assert "local_cls_norm.weight" in m
        assert m["blocks.0.attn.qkv.weight"] == [12288, 4096]

    @pytest.mark.parametrize("name", ["dinov3_vits16", "dinov3_vitb16"])
    def test_sbl_layout_flags(self, name):
        m = checkpoint_manifest(name)
        assert "blocks.0.attn.qkv.bias" in m
        assert "blocks.0.attn.qkv.bias_mask" in m  # mask_k_bias=True
        assert "blocks.0.mlp.fc1.weight" in m


def _synth_state_dict(manifest, dtype=np.float32, tiny=False):
    out = {}
    for k, shape in manifest.items():
        if tiny:
            shape = [2] * len(shape)
        if k.endswith("bias_mask"):
            # published checkpoints carry the k-bias mask (0 on the k rows)
            v = np.ones(shape, dtype)
            d = shape[0] // 3
            v[d:2 * d] = 0
            out[k] = v
        else:
            out[k] = np.zeros(shape, dtype)
    return out


class TestConverterAgainstManifest:
    @pytest.mark.parametrize("name", ["dinov3_vits16", "dinov3_vitl16"])
    def test_full_size_conversion_matches_model(self, name):
        """Manifest-shaped state dict -> converter (strict) -> tree that exactly
        matches the flax model's expected param names AND shapes."""
        cfg = VIT_CONFIGS[name]
        sd = _synth_state_dict(checkpoint_manifest(name))
        params = convert_dinov3_state_dict(sd, cfg, strict=True)

        expected = _flax_param_shapes(cfg)
        got_flat = dict(jax.tree_util.tree_flatten_with_path(params)[0])
        exp_flat = dict(jax.tree_util.tree_flatten_with_path(expected)[0])
        assert set(got_flat) == set(exp_flat), (
            set(got_flat) ^ set(exp_flat))
        for path in exp_flat:
            assert tuple(got_flat[path].shape) == tuple(exp_flat[path].shape), (
                path, got_flat[path].shape, exp_flat[path].shape)

    @pytest.mark.parametrize("name", ALL_MODELS)
    def test_every_published_key_consumed(self, name):
        """Strict conversion over the EXACT published key set (tiny arrays for
        the big models) — any dropped key raises."""
        cfg = VIT_CONFIGS[name]
        manifest = checkpoint_manifest(name)
        sd = _synth_state_dict(manifest, tiny=True)
        convert_dinov3_state_dict(sd, cfg, strict=True)  # must not raise

    def test_dropped_key_raises_in_strict_mode(self):
        cfg = VIT_CONFIGS["dinov3_vits16"]
        sd = _synth_state_dict(checkpoint_manifest("dinov3_vits16"), tiny=True)
        sd["blocks.0.attn.some_new_weight"] = np.zeros((2, 2), np.float32)
        with pytest.raises(ValueError, match="not converted"):
            convert_dinov3_state_dict(sd, cfg, strict=True)

    def test_ignore_list_is_exactly_the_unconsumed_set(self):
        """The documented ignore list matches reality: ignored keys present in
        each manifest are precisely the ones conversion leaves untouched."""
        import dinounet_tpu.models.convert as C

        for name in ALL_MODELS:
            manifest = checkpoint_manifest(name)
            cfg = VIT_CONFIGS[name]
            tracked = C._TrackingDict(_synth_state_dict(manifest, tiny=True))
            C.convert_dinov3_state_dict(tracked, cfg)
            unconsumed = set(tracked) - tracked.accessed
            assert unconsumed == set(IGNORED_CHECKPOINT_KEYS) & set(manifest), (
                name, unconsumed)


class TestMini7BLayoutEndToEnd:
    """Scaled-down model with the exact 7B layout flags (swiglu64, no qkv bias,
    untied cls norm): reference meta-model keys -> converter -> flax shapes."""

    def test_mini_7b_roundtrip(self):
        torch = pytest.importorskip("torch")
        from tests.test_adapter_parity import _import_reference_adapter

        _import_reference_adapter()
        try:
            from dinounet.dinov3.models.vision_transformer import (
                DinoVisionTransformer,
            )
        except Exception as e:
            pytest.skip(f"reference not importable: {e}")

        with torch.device("meta"):
            ref = DinoVisionTransformer(
                img_size=64, patch_size=16, embed_dim=128, depth=2, num_heads=4,
                ffn_ratio=3, qkv_bias=False, ffn_layer="swiglu64",
                norm_layer="layernormbf16", n_storage_tokens=4, mask_k_bias=True,
                layerscale_init=1e-5, untie_global_and_local_cls_norm=True,
                pos_embed_rope_base=100,
                pos_embed_rope_normalize_coords="separate",
                pos_embed_rope_dtype="fp32",
            )
        ref_shapes = {k: list(v.shape) for k, v in ref.state_dict().items()}
        cfg = ViTConfig(embed_dim=128, depth=2, num_heads=4, ffn_ratio=3,
                        ffn_layer="swiglu", swiglu_align=64, qkv_bias=False)
        sd = _synth_state_dict(ref_shapes)
        params = convert_dinov3_state_dict(sd, cfg, strict=True)

        expected = _flax_param_shapes(cfg)
        got_flat = dict(jax.tree_util.tree_flatten_with_path(params)[0])
        exp_flat = dict(jax.tree_util.tree_flatten_with_path(expected)[0])
        assert set(got_flat) == set(exp_flat)
        for path in exp_flat:
            assert tuple(got_flat[path].shape) == tuple(exp_flat[path].shape)


class TestManifestFreshness:
    def test_manifest_matches_reference_definition(self):
        """Regenerate the vits16 entry from the reference on the meta device
        and diff against the stored manifest (guards against a stale file)."""
        torch = pytest.importorskip("torch")
        from tests.test_adapter_parity import _import_reference_adapter

        _import_reference_adapter()
        try:
            from dinounet.dinov3.models.vision_transformer import (
                DinoVisionTransformer,
            )
        except Exception as e:
            pytest.skip(f"reference not importable: {e}")
        with torch.device("meta"):
            ref = DinoVisionTransformer(
                img_size=224, patch_size=16, in_chans=3, embed_dim=384,
                depth=12, num_heads=6, ffn_ratio=4, qkv_bias=True,
                layerscale_init=1e-5, norm_layer="layernormbf16",
                ffn_layer="mlp", ffn_bias=True, proj_bias=True,
                n_storage_tokens=4, mask_k_bias=True, pos_embed_rope_base=100,
                pos_embed_rope_normalize_coords="separate",
                pos_embed_rope_rescale_coords=2, pos_embed_rope_dtype="fp32",
            )
        fresh = {k: list(v.shape) for k, v in ref.state_dict().items()}
        assert fresh == checkpoint_manifest("dinov3_vits16")
