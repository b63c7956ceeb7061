"""Analytic roofline for the dinounet_b tile forward on TPU v5e.

Derives per-component FLOP and HBM-traffic floors at the headline bench
operating point (batch 8, 512x512 tiles, bf16) and prints them next to the
hardware limits, so BASELINE.md's structural-cap argument is reproducible
arithmetic rather than prose. Compare against a measured rollup from
tools/capture_trace.py / tools/trace_attr.py.

Hardware model (TPU v5e, one chip):
  * MXU peak 197 TFLOP/s bf16 (394 int8);
  * HBM 819 GB/s;
  * XLA tiles the two minor dims of every buffer to (8, 128) — a bf16
    feature map with C<128 minor is physically padded to 128 lanes, so its
    HBM bytes are B*H*W*128*2 regardless of C (the "padding tax" that
    dominates the decoder floors below).

Reference semantics being bounded: /root/reference/dinounet_training.py
:517-629 (model assembly), dinounet/dinov3/eval/segmentation/models/
backbone/dinov3_adapter.py (adapter/MSDA), nnU-Net decoder.
"""

import argparse

PEAK_BF16 = 197e12
PEAK_VPU_F32 = 3.9e12   # 4 scalar units x (8,128) vregs x ~940 MHz
HBM = 819e9

B = 8
TILE = 512
EMBED, DEPTH, HEADS, MLP = 768, 12, 12, 3072
TOKENS = (TILE // 16) ** 2 + 1 + 4  # patches + cls + 4 registers = 1029
DV = EMBED // 2                     # MSDA value dim (ratio 0.5)
MSDA_HEADS, MSDA_POINTS = 16, 4
N_EXTRACTORS = 6                    # 4 interactions, last has 3 extractors
# extractor queries = SPM c2+c3+c4 pyramid (1/8 + 1/16 + 1/32 of 512)
# = 64^2 + 32^2 + 16^2 = 5376, matching the premapped kernel's
# bf16[8,16,24,5376] operand in the round-3 trace
QUERIES = 64 * 64 + 32 * 32 + 16 * 16


def ms(x):
    return x * 1e3


def gb(nbytes):
    return nbytes / 1e9


def padded_map_bytes(h, w, c, dtype_bytes=2, batch=B):
    """HBM bytes of a (B, h, w, c) map under the (8, 128) tile layout."""
    lanes = ((c + 127) // 128) * 128
    sub = ((batch + 7) // 8) * 8
    return h * w * sub * lanes * dtype_bytes


def backbone(int8=False):
    n = B * TOKENS
    qkv = 2 * n * EMBED * 3 * EMBED
    attn = 2 * 2 * B * HEADS * TOKENS * TOKENS * (EMBED // HEADS)
    proj = 2 * n * EMBED * EMBED
    mlp = 2 * 2 * n * EMBED * MLP
    per_block = qkv + attn + proj + mlp
    total = per_block * DEPTH
    # achievable MFU per op class, from the round-2/3 traces (BASELINE.md):
    # qkv/fc1 ~0.9, attention kernel ~0.5 (K=64 halves the MXU ceiling),
    # proj/fc2 carry residual+LN epilogues ~0.45
    achievable = (qkv / 0.9 + attn / 0.5 + proj / 0.45 + mlp / 0.75) * DEPTH
    if int8:
        # the linears ride the 394 TFLOP/s int8 MXU; the measured in-kernel
        # dynamic-quant tax caps the speedup at ~1.47x (BASELINE.md round-3
        # isolated probe: int8 dot 1.72x bf16, 1.47x with in-VMEM quant).
        # The attention kernel stays bf16 (scores/softmax).
        lin = (qkv / 0.9 + proj / 0.45 + mlp / 0.75) * DEPTH / 1.47
        achievable = lin + (attn / 0.5) * DEPTH
        floor = ((qkv + proj + mlp) * DEPTH) / 2 + attn * DEPTH
        return floor / PEAK_BF16, achievable / PEAK_BF16
    return total / PEAK_BF16, achievable / PEAK_BF16


def msda():
    # W-build: VPU-bound f32 outer-product accumulate measured at its design
    # limit ~1.52-1.57 ms/call (BASELINE.md round-2 breakdown; a bf16 variant
    # measured 16% slower end-to-end). Analytic check: per call the kernel
    # touches H*W grid cells x queries worth of f32 accumulate traffic.
    per_call = 1.52e-3
    return N_EXTRACTORS * per_call


def extractor_rest(int8=False):
    # per extractor: value projection (over the 1029 ViT value tokens),
    # sampling offsets + attention weights + output projection (over the
    # 5376 queries), query norm, and the cffn (ratio 0.25) with dwconv
    n = B * QUERIES
    value_proj = 2 * B * TOKENS * EMBED * DV
    out_proj = 2 * n * DV * EMBED
    offs = 2 * n * EMBED * MSDA_HEADS * MSDA_POINTS * 3
    cffn = 2 * 2 * n * EMBED * int(EMBED * 0.25)
    flops = (value_proj + out_proj + offs + cffn) * N_EXTRACTORS
    if int8:
        flops /= 1.47  # in-kernel dynamic-quant speedup, measured (r3 probe)
    # each pass reads+writes the (B, 5376, 768) query tensor; ~4 full passes
    # per extractor (norms, kernel IO outside the custom call, cffn residual)
    traffic = N_EXTRACTORS * 4 * 2 * B * QUERIES * EMBED * 2
    return max(flops / PEAK_BF16, traffic / HBM)


def spm():
    # stem1 3->64 @256^2 stride2; stem2/3 64->64 @256^2; pool + conv2..4
    f = 0
    f += 2 * B * 256 * 256 * (9 * 3) * 64
    f += 2 * 2 * B * 256 * 256 * (9 * 64) * 64
    f += 2 * B * 128 * 128 * (9 * 64) * 128  # conv2 (1/8)
    traffic = (padded_map_bytes(512, 512, 1) +          # image read
               3 * 2 * padded_map_bytes(256, 256, 64))  # stem maps r+w
    return max(f / PEAK_BF16, traffic / HBM)


def adapter_up():
    # 2x2-stride-2 transpconv 768->768, 64^2 -> 128^2 (compute-bound)
    f = 2 * B * 128 * 128 * EMBED * EMBED
    return f / (PEAK_BF16 * 0.8)  # measured 80% MFU


def resize_einsums():
    # hH + wW bilinear-resize matmuls 32^2 -> 128^2 over 768 channels
    f = 2 * B * 128 * 32 * 32 * EMBED + 2 * B * 128 * 128 * 32 * EMBED
    traffic = 2 * padded_map_bytes(128, 128, EMBED)
    return max(f / PEAK_BF16, traffic / HBM)


def decoder():
    """Stage floors under the padded NHWC layout XLA picks (C=32/64 pad to
    128 lanes). Structure per stage: transpconv + concat + conv0 (raw+stats)
    + conv1 with conv0's norm fused into its read + one norm-apply pass
    (fused into the seg reduce on the final stage)."""
    total = 0.0
    # (h, w, skip_ch): stage2 512^2 C32, stage1 256^2 C64, stage0 128^2 C128
    for h, w, c in [(512, 512, 32), (256, 256, 64), (128, 128, 128)]:
        m = padded_map_bytes(h, w, c)
        mcat = padded_map_bytes(h, w, 2 * c)
        traffic = (m                # transpconv write
                   + 2 * m + mcat  # concat r+w
                   + mcat + m      # conv0 r+w
                   + m + m         # conv1 r (norm fused) + w
                   + m)            # final norm-apply read (write fused/next)
        conv_flops = 2 * 2 * B * h * w * (9 * 2 * c) * c
        total += max(traffic / HBM, conv_flops / PEAK_BF16)
    return total


def fapm_encoder():
    # FiLM convs at 128^2 x512ch + skip upsamplers writing the decoder skips
    f = 2 * B * 128 * 128 * 512 * 512 * 2
    traffic = (padded_map_bytes(512, 512, 32) + padded_map_bytes(256, 256, 64)
               + padded_map_bytes(128, 128, 128)) * 2
    return max(f / PEAK_BF16, traffic / HBM)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--int8", action="store_true",
                    help="int8 serving-mode roofline: backbone + extractor "
                         "linears on the 394 TFLOP/s int8 MXU (achievable "
                         "capped at the measured 1.47x in-kernel dynamic-"
                         "quant rate); MSDA/attention/decoder stay bf16")
    args = ap.parse_args()
    bb_peak, bb_achv = backbone(int8=args.int8)
    ex = extractor_rest(int8=args.int8)
    rows = [
        ("backbone ViT-B (12 blocks, 1029 tok)", bb_achv, bb_peak),
        ("MSDA kernels (6x, VPU design limit)", msda(), msda()),
        ("extractor proj/cffn/softmax", ex, ex),
        ("SPM stem", spm(), spm()),
        ("adapter 4x up-transpconv", adapter_up(), adapter_up()),
        ("feature resize einsums", resize_einsums(), resize_einsums()),
        ("U-Net decoder (padded NHWC floors)", decoder(), decoder()),
        ("FAPM + skip upsamplers", fapm_encoder(), fapm_encoder()),
    ]
    print(f"{'component':45s} {'achievable':>10s} {'abs floor':>10s}")
    ach_sum = flo_sum = 0.0
    for name, ach, flo in rows:
        ach_sum += ach
        flo_sum += flo
        print(f"{name:45s} {ms(ach):8.2f}ms {ms(flo):8.2f}ms")
    print(f"{'TOTAL':45s} {ms(ach_sum):8.2f}ms {ms(flo_sum):8.2f}ms")
    print(f"\nachievable-structural cap : {B / ach_sum:6.1f} patches/s/chip")
    print(f"absolute-floor cap        : {B / flo_sum:6.1f} patches/s/chip")
    print(f"backbone+MSDA alone       : {B / (bb_achv + msda()):6.1f} "
          f"patches/s/chip (bf16)")


if __name__ == "__main__":
    main()
