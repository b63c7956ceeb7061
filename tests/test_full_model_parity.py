"""Full-model forward parity: our DinoUNet (flax) vs the reference torch model
(DINOv3EncoderAdapter + FAPM + UNetDecoder from /root/reference/dinounet_training.py)
on CPU with identical (converted) random weights.

The reference module can't be imported as-is on this machine: it pulls
`dinounet.api` (batchgenerators & co.), the nnU-Net trainer base, and
`dynamic_network_architectures` (not installed). All three are stubbed in
sys.modules; `dynamic_network_architectures.StackedConvBlocks` is re-created
faithfully in torch (conv(pad=(k-1)//2) -> norm -> nonlin stacks, stride only
on the first conv) so the decoder math is the reference's.

ref: dinounet_training.py:210-629 (projector blocks, FAPM, encoder adapter,
UNetDecoder), :786-800 (DinoUNet.forward = encoder -> decoder).
"""

import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402

from tests.test_adapter_parity import (  # noqa: E402
    _conv,
    _dense,
    _import_reference_adapter,
    _transp_conv,
    convert_adapter_state_dict,
)


# ---------------------------------------------------------------------------
# faithful torch stand-ins for the dynamic_network_architectures pieces the
# reference decoder uses (the pip package is not in this image)
# ---------------------------------------------------------------------------

class _ConvDropoutNormReLU(nn.Module):
    def __init__(self, conv_op, in_ch, out_ch, kernel_size, stride, conv_bias,
                 norm_op, norm_op_kwargs, dropout_op, dropout_op_kwargs,
                 nonlin, nonlin_kwargs, nonlin_first=False):
        super().__init__()
        if isinstance(kernel_size, int):
            kernel_size = [kernel_size] * 2
        padding = [(k - 1) // 2 for k in kernel_size]
        self.conv = conv_op(in_ch, out_ch, kernel_size, stride, padding, bias=conv_bias)
        self.norm = norm_op(out_ch, **(norm_op_kwargs or {})) if norm_op else nn.Identity()
        self.nonlin = nonlin(**(nonlin_kwargs or {})) if nonlin else nn.Identity()
        assert dropout_op is None and not nonlin_first

    def forward(self, x):
        return self.nonlin(self.norm(self.conv(x)))


class _StackedConvBlocks(nn.Module):
    def __init__(self, num_convs, conv_op, input_channels, output_channels,
                 kernel_size, initial_stride, conv_bias=False, norm_op=None,
                 norm_op_kwargs=None, dropout_op=None, dropout_op_kwargs=None,
                 nonlin=None, nonlin_kwargs=None, nonlin_first=False):
        super().__init__()
        if not isinstance(output_channels, (list, tuple)):
            output_channels = [output_channels] * num_convs
        blocks = [_ConvDropoutNormReLU(
            conv_op, input_channels, output_channels[0], kernel_size,
            initial_stride, conv_bias, norm_op, norm_op_kwargs, dropout_op,
            dropout_op_kwargs, nonlin, nonlin_kwargs, nonlin_first)]
        for i in range(1, num_convs):
            blocks.append(_ConvDropoutNormReLU(
                conv_op, output_channels[i - 1], output_channels[i], kernel_size,
                1, conv_bias, norm_op, norm_op_kwargs, dropout_op,
                dropout_op_kwargs, nonlin, nonlin_kwargs, nonlin_first))
        self.convs = nn.Sequential(*blocks)

    def forward(self, x):
        return self.convs(x)


def _stub_module(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def _import_reference_training_module():
    """Import /root/reference/dinounet_training.py with unavailable deps stubbed."""
    if "ref_dinounet_training" in sys.modules:
        return sys.modules["ref_dinounet_training"]
    _import_reference_adapter()  # dinounet package shim + MSDA ext stub

    _stub_module("dinounet.api", plan_and_preprocess=None, training=None,
                 evaluate=None)
    _stub_module("dinounet.training")
    _stub_module("dinounet.training.nnUNetTrainer")
    _stub_module(
        "dinounet.training.nnUNetTrainer.nnUNetTrainerNoDeepSupervision",
        nnUNetTrainerNoDeepSupervision=type(
            "nnUNetTrainerNoDeepSupervision", (), {}),
    )

    def get_matching_convtransp(conv_op):
        assert conv_op is nn.Conv2d
        return nn.ConvTranspose2d

    _stub_module("dynamic_network_architectures")
    _stub_module("dynamic_network_architectures.building_blocks")
    _stub_module("dynamic_network_architectures.building_blocks.helper",
                 convert_conv_op_to_dim=lambda op: 2,
                 get_matching_convtransp=get_matching_convtransp)
    _stub_module("dynamic_network_architectures.building_blocks.plain_conv_encoder",
                 PlainConvEncoder=type("PlainConvEncoder", (), {}))
    _stub_module("dynamic_network_architectures.initialization")
    _stub_module("dynamic_network_architectures.initialization.weight_init",
                 InitWeights_He=lambda slope: (lambda m: None))
    _stub_module("dynamic_network_architectures.building_blocks.simple_conv_blocks",
                 StackedConvBlocks=_StackedConvBlocks)

    spec = importlib.util.spec_from_file_location(
        "ref_dinounet_training", "/root/reference/dinounet_training.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_dinounet_training"] = mod
    try:
        spec.loader.exec_module(mod)
    except Exception as e:
        del sys.modules["ref_dinounet_training"]
        pytest.skip(f"reference dinounet_training.py not importable: {e}")
    return mod


# ---------------------------------------------------------------------------
# torch state_dict -> flax param conversion for FAPM encoder + decoder
# ---------------------------------------------------------------------------

def _norm_params(sd, name):
    return {"norm": {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}}


def convert_fapm_encoder_state_dict(sd, n_scales):
    """torch DINOv3EncoderAdapter (fapm + ups only) -> our FAPMEncoder params."""
    fapm = {"shared_basis": _conv(sd, "fapm.shared_basis")}
    for i in range(n_scales):
        fapm[f"specific_basis{i}"] = _conv(sd, f"fapm.specific_bases.{i}")
        fapm[f"film{i}"] = _conv(sd, f"fapm.film_generators.{i}")
        fapm[f"reduce{i}"] = _conv(sd, f"fapm.refinement_blocks.{i}.0")
        fapm[f"reduce_norm{i}"] = _norm_params(sd, f"fapm.refinement_blocks.{i}.1")
        fapm[f"dwsep{i}"] = {
            "depthwise": _conv(sd, f"fapm.refinement_blocks.{i}.3.depthwise"),
            "pointwise": _conv(sd, f"fapm.refinement_blocks.{i}.3.pointwise"),
            "norm": _norm_params(sd, f"fapm.refinement_blocks.{i}.3.bn"),
        }
        fapm[f"refine{i}"] = _conv(sd, f"fapm.refinement_blocks.{i}.4")
        fapm[f"se{i}"] = {
            "fc1": _conv(sd, f"fapm.refinement_blocks.{i}.5.fc.0"),
            "fc2": _conv(sd, f"fapm.refinement_blocks.{i}.5.fc.2"),
        }
        if f"fapm.shortcut_projections.{i}.weight" in sd:
            fapm[f"shortcut{i}"] = _conv(sd, f"fapm.shortcut_projections.{i}")
    params = {"fapm": fapm}
    for i in range(n_scales):
        params[f"up{i}"] = {"up2": {"transpconv": _transp_conv(sd, f"ups.{i}.up2")}}
    return params


def convert_decoder_state_dict(sd, n_stages, n_conv_per_stage):
    params = {}
    for s in range(n_stages - 1):
        params[f"transpconv{s}"] = {
            "transpconv": _transp_conv(sd, f"transpconvs.{s}")}
        stage = {}
        for i in range(n_conv_per_stage[s]):
            stage[f"conv{i}"] = {
                "conv": _conv(sd, f"stages.{s}.convs.{i}.conv"),
                "norm": _norm_params(sd, f"stages.{s}.convs.{i}.norm"),
            }
        params[f"stage{s}"] = stage
        params[f"seg{s}"] = _conv(sd, f"seg_layers.{s}")
    return params


FEATURES = (8, 16, 32, 64)
RANK = 16
N_CLASSES = 3


@pytest.fixture(scope="module")
def full_models():
    from dinounet_tpu.models.convert import convert_dinov3_state_dict
    from dinounet_tpu.models.vit import ViTConfig

    ref_mod = _import_reference_training_module()
    from dinounet.dinov3.eval.segmentation.models.backbone.dinov3_adapter import (
        DINOv3_Adapter,
    )
    from dinounet.dinov3.models.vision_transformer import DinoVisionTransformer

    torch.manual_seed(0)
    backbone = DinoVisionTransformer(
        img_size=64, patch_size=16, embed_dim=64, depth=4, num_heads=2, ffn_ratio=2,
        norm_layer="layernormbf16", n_storage_tokens=4, mask_k_bias=True,
        layerscale_init=1e-5, pos_embed_rope_base=100,
        pos_embed_rope_normalize_coords="separate", pos_embed_rope_dtype="fp32",
    )
    backbone.init_weights()
    adapter = DINOv3_Adapter(
        backbone, interaction_indexes=[0, 1, 2, 3], pretrain_size=64,
        conv_inplane=8, n_points=4, deform_num_heads=4,
        drop_path_rate=0.3, cffn_ratio=0.25, deform_ratio=0.5, with_cp=False,
    )
    encoder = ref_mod.DINOv3EncoderAdapter(
        dinov3_adapter=adapter, target_channels=list(FEATURES), rank=RANK,
        conv_op=nn.Conv2d, norm_op=nn.InstanceNorm2d,
        norm_op_kwargs={"eps": 1e-5, "affine": True},
        nonlin=nn.LeakyReLU, nonlin_kwargs={"inplace": True}, conv_bias=True,
    )
    decoder = ref_mod.UNetDecoder(
        encoder, N_CLASSES, [2, 2, 2], deep_supervision=False)

    with torch.no_grad():
        for p in list(encoder.parameters()) + list(decoder.parameters()):
            p.add_(torch.randn_like(p) * 0.02)
        for name, buf in encoder.named_buffers():
            if "running_mean" in name:
                buf.add_(torch.randn_like(buf) * 0.1)
            elif "running_var" in name:
                buf.mul_(torch.rand_like(buf) * 0.5 + 0.75)
        for blk in backbone.blocks:
            m = torch.ones_like(blk.attn.qkv.bias_mask)
            d = m.shape[0] // 3
            m[d : 2 * d] = 0
            blk.attn.qkv.bias_mask.copy_(m)
    encoder.eval()
    decoder.eval()

    vit_cfg = ViTConfig(embed_dim=64, depth=4, num_heads=2, ffn_ratio=2,
                        n_storage_tokens=4, dtype="float32")
    enc_sd = {k: v.float().numpy() for k, v in encoder.state_dict().items()}
    dec_sd = {k: v.float().numpy() for k, v in decoder.state_dict().items()}

    backbone_params = convert_dinov3_state_dict(
        {k[len("dinov3_adapter.backbone."):]: v for k, v in enc_sd.items()
         if k.startswith("dinov3_adapter.backbone.")}, vit_cfg)
    adapter_params, adapter_stats = convert_adapter_state_dict(
        {k[len("dinov3_adapter."):]: v for k, v in enc_sd.items()
         if k.startswith("dinov3_adapter.") and
         not k.startswith("dinov3_adapter.backbone.")})
    encoder_params = convert_fapm_encoder_state_dict(enc_sd, len(FEATURES))
    decoder_params = convert_decoder_state_dict(dec_sd, len(FEATURES), [2, 2, 2])

    variables = {
        "params": {
            "backbone": backbone_params,
            "adapter": adapter_params,
            "encoder": encoder_params,
            "decoder": decoder_params,
        },
        "batch_stats": {"adapter": adapter_stats},
    }
    return encoder, decoder, vit_cfg, variables, dec_sd


def _our_config(vit_cfg, dtype="float32"):
    import dataclasses

    from dinounet_tpu.models.dinounet import DinoUNetConfig

    return DinoUNetConfig(
        vit=dataclasses.replace(vit_cfg, dtype=dtype),
        interaction_indexes=(0, 1, 2, 3),
        num_classes=N_CLASSES,
        features_per_stage=FEATURES,
        n_conv_per_stage_decoder=(2, 2, 2),
        conv_bias=True,
        norm="instancenorm",
        nonlin="leaky_relu",
        nonlin_kwargs={"negative_slope": 0.01},
        fapm_rank=RANK,
        conv_inplane=8,
        deform_num_heads=4,
        dtype=dtype,
    )


class TestFullModelParity:
    def test_logits_match_fp32(self, full_models):
        import jax.numpy as jnp

        from dinounet_tpu.models.dinounet import DinoUNet

        encoder, decoder, vit_cfg, variables, _ = full_models
        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 1, 64, 64)).astype(np.float32)

        with torch.no_grad():
            ref = decoder(encoder(torch.from_numpy(x))).numpy()

        model = DinoUNet(_our_config(vit_cfg))
        got = model.apply(variables, jnp.asarray(np.moveaxis(x, 1, -1)),
                          train=False)
        got_nchw = np.moveaxis(np.asarray(got), -1, 1)
        np.testing.assert_allclose(ref, got_nchw, atol=1e-3, rtol=1e-3)

    def test_deep_supervision_heads_match(self, full_models):
        """Reference decoder with DS on vs our decoder module (standalone)."""
        import jax.numpy as jnp

        from dinounet_tpu.models.decoder import UNetDecoder as OurDecoder

        encoder, decoder, vit_cfg, variables, dec_sd = full_models
        decoder.deep_supervision = True
        try:
            rng = np.random.default_rng(1)
            skips_np = [
                rng.standard_normal((2, ch, 64 // (2 ** i), 64 // (2 ** i)))
                .astype(np.float32)
                for i, ch in enumerate(FEATURES)
            ]
            with torch.no_grad():
                ref = decoder([torch.from_numpy(s) for s in skips_np])
        finally:
            decoder.deep_supervision = False

        ours = OurDecoder(
            encoder_channels=FEATURES,
            encoder_strides=((2, 2),) * 4,
            encoder_kernel_sizes=((3, 3),) * 4,
            num_classes=N_CLASSES,
            n_conv_per_stage=(2, 2, 2),
            deep_supervision=True,
            norm="instancenorm", nonlin="leaky_relu", conv_bias=True,
            dtype=jnp.float32,
        )
        got = ours.apply(
            {"params": variables["params"]["decoder"]},
            [jnp.asarray(np.moveaxis(s, 1, -1)) for s in skips_np],
            train=False,
        )
        assert len(ref) == len(got) == 3
        for r, g in zip(ref, got):
            np.testing.assert_allclose(
                r.numpy(), np.moveaxis(np.asarray(g), -1, 1),
                atol=1e-4, rtol=1e-3)
