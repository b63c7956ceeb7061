"""Numerical parity of the flax DINOv3 backbone against the reference torch
implementation (random weights, converted through models/convert.py).

The reference torch code is imported read-only via a package shim (its package
__init__ pulls unavailable pip deps; the dinov3 subtree only needs torch).
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _import_reference_vit():
    if "dinounet" not in sys.modules:
        pkg = types.ModuleType("dinounet")
        pkg.__path__ = ["/root/reference/dinounet"]
        sys.modules["dinounet"] = pkg
    try:
        from dinounet.dinov3.models.vision_transformer import DinoVisionTransformer
    except Exception as e:  # reference not mounted
        pytest.skip(f"reference DINOv3 not importable: {e}")
    return DinoVisionTransformer


@pytest.fixture(scope="module")
def torch_and_flax_models():
    import jax
    from dinounet_tpu.models.convert import convert_dinov3_state_dict
    from dinounet_tpu.models.vit import DinoViT, ViTConfig

    DinoVisionTransformer = _import_reference_vit()
    torch.manual_seed(0)
    tm = DinoVisionTransformer(
        img_size=64, patch_size=16, embed_dim=64, depth=3, num_heads=2, ffn_ratio=2,
        norm_layer="layernormbf16", n_storage_tokens=4, mask_k_bias=True,
        layerscale_init=1e-5, pos_embed_rope_base=100,
        pos_embed_rope_normalize_coords="separate", pos_embed_rope_dtype="fp32",
    )
    tm.init_weights()
    # make the weights non-trivial (init_weights zeroes biases etc.)
    with torch.no_grad():
        for p in tm.parameters():
            p.add_(torch.randn_like(p) * 0.02)
        # real checkpoints carry a finite bias_mask: 1 everywhere except the k rows
        for blk in tm.blocks:
            m = torch.ones_like(blk.attn.qkv.bias_mask)
            d = m.shape[0] // 3
            m[d : 2 * d] = 0
            blk.attn.qkv.bias_mask.copy_(m)
    tm.eval()

    cfg = ViTConfig(embed_dim=64, depth=3, num_heads=2, ffn_ratio=2,
                    n_storage_tokens=4, dtype="float32")
    sd = {k: v.float().numpy() for k, v in tm.state_dict().items()}
    backbone_params = convert_dinov3_state_dict(sd, cfg)
    fm = DinoViT(cfg)
    return tm, fm, backbone_params


class TestViTParity:
    def test_rope_periods_match(self, torch_and_flax_models):
        tm, _, _ = torch_and_flax_models
        from dinounet_tpu.models.vit import rope_sincos

        H = W = 4
        sin_t, cos_t = tm.rope_embed(H=H, W=W)
        sin_j, cos_j = rope_sincos(H, W, tm.rope_embed.D_head, base=100.0)
        np.testing.assert_allclose(sin_t.detach().numpy(), np.asarray(sin_j), atol=1e-5)
        np.testing.assert_allclose(cos_t.detach().numpy(), np.asarray(cos_j), atol=1e-5)

    def test_intermediate_layers_match(self, torch_and_flax_models):
        import jax.numpy as jnp

        tm, fm, backbone_params = torch_and_flax_models
        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)

        with torch.no_grad():
            ref = tm.get_intermediate_layers(
                torch.from_numpy(x), n=[0, 2], return_class_token=True
            )

        x_nhwc = jnp.asarray(np.moveaxis(x, 1, -1))
        outs = fm.apply({"params": backbone_params}, x_nhwc, (0, 2))

        for (ref_patch, ref_cls), (got_patch, got_cls) in zip(ref, outs):
            np.testing.assert_allclose(
                ref_patch.numpy(), np.asarray(got_patch), atol=2e-4, rtol=1e-3
            )
            np.testing.assert_allclose(
                ref_cls.numpy(), np.asarray(got_cls), atol=2e-4, rtol=1e-3
            )

    def test_bf16_close_to_fp32(self, torch_and_flax_models):
        """bf16 compute (the production dtype) stays close to fp32 reference."""
        import dataclasses

        import jax.numpy as jnp

        from dinounet_tpu.models.vit import DinoViT

        tm, fm, backbone_params = torch_and_flax_models
        rng = np.random.default_rng(1)
        x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
        x_nhwc = jnp.asarray(np.moveaxis(x, 1, -1))

        fp32_out = fm.apply({"params": backbone_params}, x_nhwc, (2,))[0][0]
        cfg_bf16 = dataclasses.replace(fm.cfg, dtype="bfloat16")
        bf16_out = DinoViT(cfg_bf16).apply({"params": backbone_params}, x_nhwc, (2,))[0][0]
        err = np.abs(np.asarray(fp32_out) - np.asarray(bf16_out, np.float32)).max()
        assert err < 0.15, f"bf16 deviation too large: {err}"


import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


class TestInt8Mode:
    """Experimental w8a8 serving mode (DINOUNET_TPU_VIT_INT8=1): identical
    param tree to the bf16 path, bounded deviation on random weights. Real-
    checkpoint Dice validation is a deployment-side step (no egress here)."""

    def test_param_tree_identical_and_outputs_close(self, monkeypatch):
        import numpy as np

        from dinounet_tpu.models.vit import DinoViT, ViTConfig

        cfg = ViTConfig(embed_dim=64, depth=4, num_heads=4, ffn_ratio=2,
                        dtype="float32")
        model = DinoViT(cfg)
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((1, 64, 64, 3)),
            jnp.float32)

        monkeypatch.setenv("DINOUNET_TPU_VIT_INT8", "0")
        variables = model.init(jax.random.PRNGKey(0), x, (3,))
        (ref_tokens, ref_cls), = model.apply(variables, x, (3,))

        monkeypatch.setenv("DINOUNET_TPU_VIT_INT8", "1")
        v8 = model.init(jax.random.PRNGKey(0), x, (3,))
        assert jax.tree_util.tree_structure(v8) == \
            jax.tree_util.tree_structure(variables)
        (q_tokens, q_cls), = model.apply(variables, x, (3,))

        a = np.asarray(ref_tokens, np.float32).ravel()
        b = np.asarray(q_tokens, np.float32).ravel()
        assert np.all(np.isfinite(b))
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert cos > 0.995, cos
        rel = float(np.linalg.norm(a - b) / np.linalg.norm(a))
        assert rel < 0.1, rel

    def test_quant_dense_matches_fp_within_int8_error(self, rng):
        from dinounet_tpu.models.vit import QuantDense

        x = jnp.asarray(rng.standard_normal((5, 37, 96)), jnp.float32)
        qd = QuantDense(48, dtype=jnp.float32)
        variables = qd.init(jax.random.PRNGKey(0), x)
        got = np.asarray(qd.apply(variables, x))
        k = np.asarray(variables["params"]["kernel"])
        b = np.asarray(variables["params"]["bias"])
        ref = np.asarray(x) @ k + b
        rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
        assert rel < 0.02, rel  # two int8 quantizations: ~1% expected
