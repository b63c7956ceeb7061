"""Numerical parity of the full flax encoder path (DinoViT -> DINOv3Adapter)
against the reference torch implementation on CPU.

The reference's MSDA module hard-imports the compiled CUDA extension at
ms_deform_attn.py:18, but only the *backward* uses it — its forward is the
pure-pytorch grid_sample core (ms_deform_attn.py:28-45,71-92). Injecting a
stub module into sys.modules unblocks the import, giving us the reference
forward on CPU and closing the "full-model forward parity" gap noted in
COMPONENTS.md.

ref: dinounet/dinov3/eval/segmentation/models/backbone/dinov3_adapter.py:305-484
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _import_reference_adapter():
    if "dinounet" not in sys.modules:
        pkg = types.ModuleType("dinounet")
        pkg.__path__ = ["/root/reference/dinounet"]
        sys.modules["dinounet"] = pkg
    # the CUDA extension is only needed for backward; stub it for CPU import
    if "MultiScaleDeformableAttention" not in sys.modules:
        sys.modules["MultiScaleDeformableAttention"] = types.ModuleType(
            "MultiScaleDeformableAttention"
        )
    try:
        from dinounet.dinov3.eval.segmentation.models.backbone.dinov3_adapter import (
            DINOv3_Adapter,
        )
    except Exception as e:  # reference not mounted
        pytest.skip(f"reference adapter not importable: {e}")
    return DINOv3_Adapter


def _conv(sd, name):
    out = {"kernel": np.transpose(sd[f"{name}.weight"], (2, 3, 1, 0))}
    if f"{name}.bias" in sd:
        out["bias"] = sd[f"{name}.bias"]
    return out


def _dense(sd, name):
    return {"kernel": sd[f"{name}.weight"].T, "bias": sd[f"{name}.bias"]}


def _ln(sd, name):
    return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}


def _bn(sd, name):
    params = {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}
    stats = {"mean": sd[f"{name}.running_mean"], "var": sd[f"{name}.running_var"]}
    return params, stats


def _transp_conv(sd, name):
    # torch ConvTranspose2d (in, out, kh, kw) -> flax ConvTranspose
    # (kh, kw, in, out) with spatially flipped taps (verified numerically)
    w = sd[f"{name}.weight"][:, :, ::-1, ::-1]
    return {"kernel": np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1))),
            "bias": sd[f"{name}.bias"]}


def _extractor(sd, prefix):
    params = {
        "query_norm": _ln(sd, f"{prefix}.query_norm"),
        "feat_norm": _ln(sd, f"{prefix}.feat_norm"),
        "ffn_norm": _ln(sd, f"{prefix}.ffn_norm"),
        "attn": {
            "value_proj": _dense(sd, f"{prefix}.attn.value_proj"),
            "sampling_offsets": _dense(sd, f"{prefix}.attn.sampling_offsets"),
            "attention_weights": _dense(sd, f"{prefix}.attn.attention_weights"),
            "output_proj": _dense(sd, f"{prefix}.attn.output_proj"),
        },
        "ffn": {
            "fc1": _dense(sd, f"{prefix}.ffn.fc1"),
            "fc2": _dense(sd, f"{prefix}.ffn.fc2"),
            "dwconv": {"dwconv": _conv(sd, f"{prefix}.ffn.dwconv.dwconv")},
        },
    }
    return params


def convert_adapter_state_dict(sd):
    """torch DINOv3_Adapter state_dict -> (params, batch_stats) for DINOv3Adapter."""
    params, stats = {}, {}
    params["level_embed"] = sd["level_embed"]

    spm_p, spm_s = {}, {}
    stem_convs = {"stem1": "stem.0", "stem2": "stem.3", "stem3": "stem.6"}
    stem_bns = {"stem1": "stem.1", "stem2": "stem.4", "stem3": "stem.7"}
    for ours, theirs in stem_convs.items():
        spm_p[f"{ours}_conv"] = _conv(sd, f"spm.{theirs}")
    for ours, theirs in stem_bns.items():
        spm_p[f"{ours}_bn"], spm_s[f"{ours}_bn"] = _bn(sd, f"spm.{theirs}")
    for i in (2, 3, 4):
        spm_p[f"conv{i}_conv"] = _conv(sd, f"spm.conv{i}.0")
        spm_p[f"conv{i}_bn"], spm_s[f"conv{i}_bn"] = _bn(sd, f"spm.conv{i}.1")
    for i in (1, 2, 3, 4):
        spm_p[f"fc{i}"] = _conv(sd, f"spm.fc{i}")
    params["spm"], stats["spm"] = spm_p, spm_s

    n_blocks = 1 + max(
        int(k.split(".")[1]) for k in sd if k.startswith("interactions.")
    )
    for i in range(n_blocks):
        blk = {"extractor": _extractor(sd, f"interactions.{i}.extractor")}
        if f"interactions.{i}.extra_extractors.0.query_norm.weight" in sd:
            blk["extractor1"] = _extractor(sd, f"interactions.{i}.extra_extractors.0")
            blk["extractor2"] = _extractor(sd, f"interactions.{i}.extra_extractors.1")
        params[f"interaction{i}"] = blk

    params["up"] = {"transpconv": _transp_conv(sd, "up")}
    for i in (1, 2, 3, 4):
        p, s = _bn(sd, f"norm{i}")
        params[f"out_norm{i}"], stats[f"out_norm{i}"] = p, s
    return params, stats


@pytest.fixture(scope="module")
def models():
    from dinounet_tpu.models.convert import convert_dinov3_state_dict
    from dinounet_tpu.models.vit import DinoViT, ViTConfig

    DINOv3_Adapter = _import_reference_adapter()
    from dinounet.dinov3.models.vision_transformer import DinoVisionTransformer

    torch.manual_seed(0)
    backbone = DinoVisionTransformer(
        img_size=64, patch_size=16, embed_dim=64, depth=4, num_heads=2, ffn_ratio=2,
        norm_layer="layernormbf16", n_storage_tokens=4, mask_k_bias=True,
        layerscale_init=1e-5, pos_embed_rope_base=100,
        pos_embed_rope_normalize_coords="separate", pos_embed_rope_dtype="fp32",
    )
    backbone.init_weights()
    tm = DINOv3_Adapter(
        backbone, interaction_indexes=[0, 1, 2, 3], pretrain_size=64,
        conv_inplane=8, n_points=4, deform_num_heads=4,
        drop_path_rate=0.3, cffn_ratio=0.25, deform_ratio=0.5, with_cp=False,
    )
    with torch.no_grad():
        for p in tm.parameters():
            p.add_(torch.randn_like(p) * 0.02)
        for name, buf in tm.named_buffers():
            if "running_mean" in name:
                buf.add_(torch.randn_like(buf) * 0.1)
            elif "running_var" in name:
                buf.mul_(torch.rand_like(buf) * 0.5 + 0.75)
        for blk in backbone.blocks:
            m = torch.ones_like(blk.attn.qkv.bias_mask)
            d = m.shape[0] // 3
            m[d : 2 * d] = 0
            blk.attn.qkv.bias_mask.copy_(m)
    tm.eval()

    cfg = ViTConfig(embed_dim=64, depth=4, num_heads=2, ffn_ratio=2,
                    n_storage_tokens=4, dtype="float32")
    sd = {k: v.float().numpy() for k, v in tm.state_dict().items()}
    backbone_params = convert_dinov3_state_dict(
        {k[len("backbone."):]: v for k, v in sd.items()
         if k.startswith("backbone.")},
        cfg,
    )
    adapter_params, adapter_stats = convert_adapter_state_dict(
        {k: v for k, v in sd.items() if not k.startswith("backbone.")}
    )
    return tm, cfg, backbone_params, adapter_params, adapter_stats


class TestAdapterParity:
    def test_full_encoder_forward_matches(self, models):
        import jax.numpy as jnp

        from dinounet_tpu.models.adapter import DINOv3Adapter
        from dinounet_tpu.models.vit import DinoViT

        tm, cfg, backbone_params, adapter_params, adapter_stats = models
        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)

        with torch.no_grad():
            ref = tm(torch.from_numpy(x))

        x_nhwc = jnp.asarray(np.moveaxis(x, 1, -1))
        backbone_outputs = DinoViT(cfg).apply(
            {"params": backbone_params}, x_nhwc, (0, 1, 2, 3)
        )
        feats = DINOv3Adapter(
            embed_dim=64, conv_inplane=8, n_points=4, deform_num_heads=4,
            drop_path_rate=0.3, cffn_ratio=0.25, deform_ratio=0.5,
            dtype=jnp.float32,
        ).apply(
            {"params": adapter_params, "batch_stats": adapter_stats},
            x_nhwc, backbone_outputs, train=False,
        )

        for key, got in zip(("1", "2", "3", "4"), feats):
            want = ref[key].numpy()
            got_nchw = np.moveaxis(np.asarray(got), -1, 1)
            np.testing.assert_allclose(
                want, got_nchw, atol=5e-4, rtol=1e-3,
                err_msg=f"scale {key} mismatch",
            )

    def test_bf16_encoder_close_to_reference(self, models):
        """The production bf16 path stays within autocast-level tolerance."""
        import jax.numpy as jnp

        from dinounet_tpu.models.adapter import DINOv3Adapter
        from dinounet_tpu.models.vit import DinoViT
        import dataclasses

        tm, cfg, backbone_params, adapter_params, adapter_stats = models
        rng = np.random.default_rng(1)
        x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(x))

        x_nhwc = jnp.asarray(np.moveaxis(x, 1, -1))
        cfg_bf16 = dataclasses.replace(cfg, dtype="bfloat16")
        backbone_outputs = DinoViT(cfg_bf16).apply(
            {"params": backbone_params}, x_nhwc, (0, 1, 2, 3)
        )
        feats = DINOv3Adapter(
            embed_dim=64, conv_inplane=8, n_points=4, deform_num_heads=4,
            drop_path_rate=0.3, cffn_ratio=0.25, deform_ratio=0.5,
            dtype=jnp.bfloat16,
        ).apply(
            {"params": adapter_params, "batch_stats": adapter_stats},
            x_nhwc, backbone_outputs, train=False,
        )
        for key, got in zip(("1", "2", "3", "4"), feats):
            want = ref[key].numpy()
            got_nchw = np.moveaxis(np.asarray(got, np.float32), -1, 1)
            scale = np.abs(want).max() + 1e-6
            rel = np.abs(want - got_nchw).max() / scale
            assert rel < 0.05, f"scale {key}: bf16 relative deviation {rel}"
