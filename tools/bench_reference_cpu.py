"""Measure the PyTorch reference's serial sliding-window tile rate on this host.

BASELINE.md's vs_baseline previously rested on a FLOPs-derived *estimate* of the
reference on A100 (60 patches/s). This script produces a *measured* anchor: the
reference code itself (/root/reference, CUDA ext stubbed — its forward is the
pure-pytorch grid_sample core, ref ms_deform_attn.py:28-45,71-92), full-size
dinounet_b (frozen ViT-B/16 backbone + adapter + FAPM encoder + U-Net decoder),
serial batch-1 512x512 tiles exactly like the reference's sliding-window loop
(ref predict_from_raw_data.py:571-621), on this host's CPU.

Methodology notes recorded with the number:
- random weights (no egress for the published checkpoints) — timing is
  weight-value independent;
- torch.no_grad + eval(), fp32 (the reference's cuda/bf16 autocast is a no-op
  on CPU);
- single measurement anchor, not a GPU number: scale by the host's achieved
  GEMM throughput vs an A100's to sanity-check the A100 estimate.

Usage: python tools/bench_reference_cpu.py [n_tiles]
Prints one JSON line.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def build_reference_dinounet_b():
    import torch
    from torch import nn

    from tests.test_full_model_parity import _import_reference_training_module

    ref_mod = _import_reference_training_module()
    from dinounet.dinov3.eval.segmentation.models.backbone.dinov3_adapter import (
        DINOv3_Adapter,
    )
    from dinounet.dinov3.models.vision_transformer import DinoVisionTransformer

    torch.manual_seed(0)
    # dinounet_b: ViT-B/16 (ref hub/backbones.py:279-317), interaction
    # indexes [2,5,8,11], adapter hyperparams from ref dinounet_training.py:754-769
    backbone = DinoVisionTransformer(
        img_size=512, patch_size=16, embed_dim=768, depth=12, num_heads=12,
        ffn_ratio=4, norm_layer="layernormbf16", n_storage_tokens=4,
        mask_k_bias=True, layerscale_init=1e-5, pos_embed_rope_base=100,
        pos_embed_rope_normalize_coords="separate", pos_embed_rope_dtype="fp32",
    )
    backbone.init_weights()
    adapter = DINOv3_Adapter(
        backbone, interaction_indexes=[2, 5, 8, 11], pretrain_size=512,
        conv_inplane=64, n_points=4, deform_num_heads=16,
        drop_path_rate=0.3, cffn_ratio=0.25, deform_ratio=0.5, with_cp=False,
    )
    encoder = ref_mod.DINOv3EncoderAdapter(
        dinov3_adapter=adapter, target_channels=[32, 64, 128, 256], rank=256,
        conv_op=nn.Conv2d, norm_op=nn.InstanceNorm2d,
        norm_op_kwargs={"eps": 1e-5, "affine": True},
        nonlin=nn.LeakyReLU, nonlin_kwargs={"inplace": True}, conv_bias=True,
    )
    decoder = ref_mod.UNetDecoder(encoder, 3, [2, 2, 2], deep_supervision=False)
    encoder.eval()
    decoder.eval()
    return encoder, decoder


def main(n_tiles: int = 3):
    import torch

    encoder, decoder = build_reference_dinounet_b()
    x = torch.randn(1, 1, 512, 512)
    with torch.no_grad():
        t0 = time.perf_counter()
        decoder(encoder(x))  # warm-up (allocator, conv algo selection)
        warm = time.perf_counter() - t0
        print(f"warm-up tile: {warm:.1f}s", file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        for _ in range(n_tiles):
            decoder(encoder(x))
        dt = (time.perf_counter() - t0) / n_tiles
    print(json.dumps({
        "metric": "reference_cpu_patches_per_sec",
        "value": round(1.0 / dt, 4),
        "unit": "patches/sec",
        "seconds_per_tile": round(dt, 3),
        "threads": torch.get_num_threads(),
        "conditions": "torch CPU fp32, batch-1 512x512 tiles, dinounet_b, "
                      "serial loop (ref predict_from_raw_data.py:571-621)",
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3)
