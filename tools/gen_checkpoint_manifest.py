"""Generate the golden checkpoint manifest for the 4 published DINOv3 backbones.

Instantiates the REFERENCE DinoVisionTransformer (/root/reference) with the
exact hyperparameters of the published hub factories
(ref: dinounet/dinov3/hub/backbones.py:201-237 vits16, :279-317 vitb16,
:318-373 vitl16, :452-494 vit7b16) on torch's meta device (no memory) and dumps
every state-dict key with its shape to
dinounet_tpu/models/checkpoint_manifest.json.

The manifest is the offline contract for checkpoint conversion: the converter
is tested against it (tests/test_convert_manifest.py), so a published .pth can
be validated for completeness/shape before or without downloading it here
(this environment has no egress).

Usage: python tools/gen_checkpoint_manifest.py
"""

import json
import os
import sys

sys.path.insert(0, "/root/repo")

HUB_KWARGS = dict(
    img_size=224, patch_size=16, in_chans=3,
    pos_embed_rope_base=100, pos_embed_rope_normalize_coords="separate",
    pos_embed_rope_rescale_coords=2, pos_embed_rope_dtype="fp32",
    qkv_bias=True, layerscale_init=1.0e-05, norm_layer="layernormbf16",
    ffn_layer="mlp", ffn_bias=True, proj_bias=True, n_storage_tokens=4,
    mask_k_bias=True,
)

MODELS = {
    "dinov3_vits16": dict(embed_dim=384, depth=12, num_heads=6, ffn_ratio=4),
    "dinov3_vitb16": dict(embed_dim=768, depth=12, num_heads=12, ffn_ratio=4),
    "dinov3_vitl16": dict(embed_dim=1024, depth=24, num_heads=16, ffn_ratio=4),
    "dinov3_vit7b16": dict(
        embed_dim=4096, depth=40, num_heads=32, ffn_ratio=3,
        qkv_bias=False, drop_path_rate=0.4, ffn_layer="swiglu64",
        untie_global_and_local_cls_norm=True,
    ),
}


def main():
    import torch

    from tests.test_adapter_parity import _import_reference_adapter

    _import_reference_adapter()  # installs the dinounet package shim
    from dinounet.dinov3.models.vision_transformer import DinoVisionTransformer

    manifest = {}
    for name, overrides in MODELS.items():
        kwargs = {**HUB_KWARGS, **overrides}
        with torch.device("meta"):
            model = DinoVisionTransformer(**kwargs)
        manifest[name] = {
            k: list(v.shape) for k, v in model.state_dict().items()
        }
        print(f"{name}: {len(manifest[name])} keys", file=sys.stderr)

    out = os.path.join(os.path.dirname(__file__), "..",
                       "dinounet_tpu", "models", "checkpoint_manifest.json")
    with open(os.path.abspath(out), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    print(f"wrote {os.path.abspath(out)}")


if __name__ == "__main__":
    main()
