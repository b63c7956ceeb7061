"""Serial A/B measurement matrix over the kernel knobs (VERDICT r2 item 10).

Round 2 left its queued A/B plan in /tmp where it outlived the session; this
is the in-repo, driver-runnable version. Each configuration is measured in
its own subprocess (bench.measure_tier — a wedged relay or Mosaic failure
cannot contaminate the next row), results below the sanity floor are flagged
environment-suspect, and everything is written as JSON so conclusions can be
drawn (or rejected) later from the artifact alone.

Usage:
    python tools/ab_matrix.py [--out .bench_logs/ab_r3.json] [--quick]

--quick runs only the headline pair (full kernel chain vs plain XLA).
"""

import argparse
import datetime
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import LAST_KNOWN_GOOD, SUSPECT_FRACTION, measure_tier  # noqa: E402

# name -> env knobs. "auto" engages the Pallas kernels on TPU.
FULL_MATRIX = {
    "plain":     {"DINOUNET_TPU_DECODER_TAIL": "jax", "DINOUNET_TPU_SPM_CM": "jax",
                  "DINOUNET_TPU_MSDA_PREP": "xla"},
    "prep":      {"DINOUNET_TPU_DECODER_TAIL": "jax", "DINOUNET_TPU_SPM_CM": "jax",
                  "DINOUNET_TPU_MSDA_PREP": "fused"},
    "tail":      {"DINOUNET_TPU_DECODER_TAIL": "auto", "DINOUNET_TPU_SPM_CM": "jax",
                  "DINOUNET_TPU_MSDA_PREP": "fused"},
    "spm":       {"DINOUNET_TPU_DECODER_TAIL": "jax", "DINOUNET_TPU_SPM_CM": "auto",
                  "DINOUNET_TPU_MSDA_PREP": "fused"},
    "tail+spm":  {"DINOUNET_TPU_DECODER_TAIL": "auto", "DINOUNET_TPU_SPM_CM": "auto",
                  "DINOUNET_TPU_MSDA_PREP": "fused"},
}
QUICK_MATRIX = {k: FULL_MATRIX[k] for k in ("plain", "tail+spm")}

# int8 serving-mode matrix (round 3): bf16 headline vs the w8a8 fused chain
# (ops/dense_q8_pallas.py), its bf16-qkv ablation, and the unfused QuantDense
# path the mode used before.
INT8_MATRIX = {
    "bf16":          {"DINOUNET_TPU_VIT_INT8": "0"},
    "int8-fused":    {"DINOUNET_TPU_VIT_INT8": "1"},
    "int8-bf16qkv":  {"DINOUNET_TPU_VIT_INT8": "1",
                      "DINOUNET_TPU_INT8_QKV": "0"},
    "int8-unfused":  {"DINOUNET_TPU_VIT_INT8": "1",
                      "DINOUNET_TPU_DENSE_IMPL": "jax"},
    # round 4 history: int8-fused briefly included the adapter extractor
    # junctions by default; since the DINOUNET_TPU_INT8_ADAPTER default flip
    # to '0' the 'int8-noadapter*' rows equal plain 'int8-fused*'. The
    # explicit opt-in row below keeps the adapter-junction ablation
    # reproducible (ADVICE r4).
    "int8-adapter":  {"DINOUNET_TPU_VIT_INT8": "1",
                      "DINOUNET_TPU_INT8_ADAPTER": "1"},
    "int8-noadapter": {"DINOUNET_TPU_VIT_INT8": "1",
                       "DINOUNET_TPU_INT8_ADAPTER": "0"},
    "int8-fused-2":  {"DINOUNET_TPU_VIT_INT8": "1"},
    "bf16-2":        {"DINOUNET_TPU_VIT_INT8": "0"},
    "int8-noadapter-2": {"DINOUNET_TPU_VIT_INT8": "1",
                         "DINOUNET_TPU_INT8_ADAPTER": "0"},
    "int8-noadapter-3": {"DINOUNET_TPU_VIT_INT8": "1",
                         "DINOUNET_TPU_INT8_ADAPTER": "0"},
}

# wide decoder stages (round 3): zero-padded full-lane convs vs status quo
# (configuration.decoder_wide_convs)
WIDE_MATRIX = {
    "base": {"DINOUNET_TPU_DECODER_WIDE": "0"},
    "wide": {"DINOUNET_TPU_DECODER_WIDE": "1"},
}

# seg-head formulation (round 3): broadcast-mul+reduce (fuses the final
# stage's norm+leaky into the seg pass) vs dot_general
SEG_MATRIX = {
    "dot": {"DINOUNET_TPU_SEG_REDUCE": "0"},
    "reduce": {"DINOUNET_TPU_SEG_REDUCE": "1"},
}

# conv3x3_cm inner-loop formulation (round 3): the lane-merged kernel
# (aligned dy lane-slices over one merged stripe — removes the per-(chunk,
# dy) relayouts that pinned the chunked kernel at ~7% MFU) vs the chunked
# kernel vs plain XLA, each driving the full CM chain.
INNER_MATRIX = {
    "plain":         {"DINOUNET_TPU_DECODER_TAIL": "jax",
                      "DINOUNET_TPU_SPM_CM": "jax"},
    "chain-merged":  {"DINOUNET_TPU_DECODER_TAIL": "auto",
                      "DINOUNET_TPU_SPM_CM": "auto",
                      "DINOUNET_TPU_CONV_CM_INNER": "merged"},
    "chain-chunked": {"DINOUNET_TPU_DECODER_TAIL": "auto",
                      "DINOUNET_TPU_SPM_CM": "auto",
                      "DINOUNET_TPU_CONV_CM_INNER": "chunked"},
    "tail-merged":   {"DINOUNET_TPU_DECODER_TAIL": "auto",
                      "DINOUNET_TPU_SPM_CM": "jax",
                      "DINOUNET_TPU_CONV_CM_INNER": "merged"},
    "spm-merged":    {"DINOUNET_TPU_DECODER_TAIL": "jax",
                      "DINOUNET_TPU_SPM_CM": "auto",
                      "DINOUNET_TPU_CONV_CM_INNER": "merged"},
}

# backbone micro-knobs (round 3): Dh-major premapped attention layout
# (full-lane qkv tiles) and XLA-side GELU placement (kernel erf/exp VPU work
# off the fused fc2 matmul's critical path)
BACKBONE_MATRIX = {
    "base":      {"DINOUNET_TPU_ATTN_LAYOUT": "ndh",
                  "DINOUNET_TPU_MLP_GELU": "kernel"},
    "dmaj":      {"DINOUNET_TPU_ATTN_LAYOUT": "dmaj",
                  "DINOUNET_TPU_MLP_GELU": "kernel"},
    "gelu-xla":  {"DINOUNET_TPU_ATTN_LAYOUT": "ndh",
                  "DINOUNET_TPU_MLP_GELU": "xla"},
    "both":      {"DINOUNET_TPU_ATTN_LAYOUT": "dmaj",
                  "DINOUNET_TPU_MLP_GELU": "xla"},
}

# fused dense block-size sweep (round 3): the fused fc2 kernel runs at ~53%
# MFU (0.369 ms/block vs 0.197 ideal, trace r3d); sweep the row-block cap
# (N=1029 -> 3x344 at the 384 default; >=520 with the GELU prologue fails to
# compile) and the cm-variant's lane-block cap. "chunked" unrolls the fc2
# GELU+matmul over K-chunks to overlap VPU erf/exp with the MXU.
MLPROWS_MATRIX = {
    "rows-208":      {"DINOUNET_TPU_DENSE_ROWS": "208"},
    "rows-384":      {"DINOUNET_TPU_DENSE_ROWS": "384"},
    "chunked-768":   {"DINOUNET_TPU_MLP_GELU": "chunked",
                      "DINOUNET_TPU_GELU_KBLK": "768"},
    "chunked-384":   {"DINOUNET_TPU_MLP_GELU": "chunked",
                      "DINOUNET_TPU_GELU_KBLK": "384"},
    "chunked-1536":  {"DINOUNET_TPU_MLP_GELU": "chunked",
                      "DINOUNET_TPU_GELU_KBLK": "1536"},
}
CMLANES_MATRIX = {
    "lanes-256":  {"DINOUNET_TPU_DENSE_LANES": "256"},
    "lanes-384":  {"DINOUNET_TPU_DENSE_LANES": "384"},
    "lanes-512":  {"DINOUNET_TPU_DENSE_LANES": "512"},
    "lanes-1152": {"DINOUNET_TPU_DENSE_LANES": "1152"},
}

# integer-ratio bilinear resize formulation (round 3): phase-decomposed
# 2-tap lerps vs the K=32 einsum matmuls (models/layers.py::bilinear_resize).
# Duplicate rows bound the run-to-run noise for a ~1%-scale comparison.
RESIZE_MATRIX = {
    "matmul":   {"DINOUNET_TPU_RESIZE_IMPL": "matmul"},
    "phase":    {"DINOUNET_TPU_RESIZE_IMPL": "phase"},
    "matmul-2": {"DINOUNET_TPU_RESIZE_IMPL": "matmul"},
    "phase-2":  {"DINOUNET_TPU_RESIZE_IMPL": "phase"},
}

# confirm pair for the chunked-GELU fc2 (first sweep: chunked-384 158.78 vs
# kernel 157.89 — inside the noise band, needs replication before a default
# flip)
GELU_CONFIRM_MATRIX = {
    "kernel-a":  {"DINOUNET_TPU_MLP_GELU": "kernel"},
    "chunked-a": {"DINOUNET_TPU_MLP_GELU": "chunked",
                  "DINOUNET_TPU_GELU_KBLK": "384"},
    "kernel-b":  {"DINOUNET_TPU_MLP_GELU": "kernel"},
    "chunked-b": {"DINOUNET_TPU_MLP_GELU": "chunked",
                  "DINOUNET_TPU_GELU_KBLK": "384"},
}

# 2x2/s2 transposed-conv formulation (round 3): two phase matmuls + free
# reshapes vs lax.conv_transpose (models/layers.py::_phase_transpconv2x2);
# targets encoder up0 1.24 + adapter up 0.96 + decoder transpconv2 1.05 ms.
TRANSPCONV_MATRIX = {
    "conv":    {"DINOUNET_TPU_TRANSPCONV_IMPL": "conv"},
    "phase":   {"DINOUNET_TPU_TRANSPCONV_IMPL": "phase"},
    "conv-2":  {"DINOUNET_TPU_TRANSPCONV_IMPL": "conv"},
    "phase-2": {"DINOUNET_TPU_TRANSPCONV_IMPL": "phase"},
}

# W-axis resize einsum emit order (round 3): "bhcw" + logical swapaxes lets
# XLA hand the adapter's transpconv add-fusion the dot output with W in lanes
# (the layout it reads x1 in), hoping to elide the 0.62 ms standalone
# relayout copy the bhwc emit pays (round-3 trace). Bitwise-identical values
# (models/layers.py::_resize_emit_bhcw). Duplicate rows bound the noise.
RESIZE_EMIT_MATRIX = {
    "bhwc":   {"DINOUNET_TPU_RESIZE_EMIT": "bhwc"},
    "bhcw":   {"DINOUNET_TPU_RESIZE_EMIT": "bhcw"},
    "bhwc-2": {"DINOUNET_TPU_RESIZE_EMIT": "bhwc"},
    "bhcw-2": {"DINOUNET_TPU_RESIZE_EMIT": "bhcw"},
}

# seg-head conv formulation (round 4): a real 1x1 conv_general_dilated lets
# XLA's convolution input fusion absorb the final stage's InstanceNorm-apply
# + leaky producer (standalone 1.63 ms kLoop pass in the round-4 trace; the
# dot operand cannot absorb it). Duplicate rows bound the noise.
SEGIMPL_MATRIX = {
    "dot":     {"DINOUNET_TPU_SEG_IMPL": "dot"},
    "conv":    {"DINOUNET_TPU_SEG_IMPL": "conv"},
    "convw":   {"DINOUNET_TPU_SEG_IMPL": "convw"},
    "dot-2":   {"DINOUNET_TPU_SEG_IMPL": "dot"},
    "convw-2": {"DINOUNET_TPU_SEG_IMPL": "convw"},
    "convbf":  {"DINOUNET_TPU_SEG_IMPL": "convbf"},
    "convbf-2": {"DINOUNET_TPU_SEG_IMPL": "convbf"},
}

# native-layout (HWBC) decoder stage convs (round 4): the Pallas kernels in
# XLA's own {3,0,2,1} physical layout — M=Rh*W*B matmuls vs the emitter's
# M=8, zero boundary relayouts (layout bitcasts). Duplicates bound the noise.
HWBC_MATRIX = {
    "jax":    {"DINOUNET_TPU_DECODER_HWBC": "jax"},
    "hwbc":   {"DINOUNET_TPU_DECODER_HWBC": "auto"},
    "jax-2":  {"DINOUNET_TPU_DECODER_HWBC": "jax"},
    "hwbc-2": {"DINOUNET_TPU_DECODER_HWBC": "auto"},
}

# round-5 knobs, all measured and default-off (BASELINE.md Appendix B):
# merged MSDA offsets+logits projection (neutral — query reads are
# overlap-hidden), W-first resize contraction order (neutral), in-kernel
# int8 qkv quantize (slightly negative — XLA already fuses the passes).
MERGED_PROJ_MATRIX = {
    "separate":   {"DINOUNET_TPU_MSDA_MERGED_PROJ": "0"},
    "merged":     {"DINOUNET_TPU_MSDA_MERGED_PROJ": "1"},
    "separate-2": {"DINOUNET_TPU_MSDA_MERGED_PROJ": "0"},
    "merged-2":   {"DINOUNET_TPU_MSDA_MERGED_PROJ": "1"},
}
RESIZE_ORDER_MATRIX = {
    "hw":   {"DINOUNET_TPU_RESIZE_ORDER": "hw"},
    "wh":   {"DINOUNET_TPU_RESIZE_ORDER": "wh"},
    "hw-2": {"DINOUNET_TPU_RESIZE_ORDER": "hw"},
    "wh-2": {"DINOUNET_TPU_RESIZE_ORDER": "wh"},
}
INT8_QKV_IMPL_MATRIX = {
    "xla":      {"DINOUNET_TPU_VIT_INT8": "1",
                 "DINOUNET_TPU_INT8_QKV_IMPL": "xla"},
    "kernel":   {"DINOUNET_TPU_VIT_INT8": "1",
                 "DINOUNET_TPU_INT8_QKV_IMPL": "kernel"},
    "xla-2":    {"DINOUNET_TPU_VIT_INT8": "1",
                 "DINOUNET_TPU_INT8_QKV_IMPL": "xla"},
    "kernel-2": {"DINOUNET_TPU_VIT_INT8": "1",
                 "DINOUNET_TPU_INT8_QKV_IMPL": "kernel"},
}

MATRICES = {"full": FULL_MATRIX, "quick": QUICK_MATRIX, "int8": INT8_MATRIX,
            "merged_proj": MERGED_PROJ_MATRIX,
            "resize_order": RESIZE_ORDER_MATRIX,
            "int8_qkv_impl": INT8_QKV_IMPL_MATRIX,
            "segimpl": SEGIMPL_MATRIX, "hwbc": HWBC_MATRIX,
            "wide": WIDE_MATRIX, "seg": SEG_MATRIX, "inner": INNER_MATRIX,
            "backbone": BACKBONE_MATRIX, "mlprows": MLPROWS_MATRIX,
            "cmlanes": CMLANES_MATRIX, "resize": RESIZE_MATRIX,
            "gelu": GELU_CONFIRM_MATRIX, "transpconv": TRANSPCONV_MATRIX,
            "resize_emit": RESIZE_EMIT_MATRIX}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=".bench_logs/ab_matrix.json")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--batch", type=int,
                    default=int(os.environ.get("DINOUNET_TPU_BENCH_BATCH", 8)))
    ap.add_argument("--model", default=os.environ.get(
        "DINOUNET_TPU_BENCH_MODEL", "dinounet_b"))
    ap.add_argument("--set", default=None, choices=sorted(MATRICES),
                    help="named knob matrix (full/quick/int8)")
    ap.add_argument("--rows", default=None,
                    help="comma-separated subset of row names to run")
    ap.add_argument("--timeout", type=int, default=2700,
                    help="per-row subprocess timeout (cold compiles through "
                         "the relay have measured >1400s; a timeout that "
                         "fires mid-compile wedges the relay)")
    args = ap.parse_args()

    floor = SUSPECT_FRACTION * LAST_KNOWN_GOOD.get(args.model, 0.0)
    matrix = MATRICES[args.set] if args.set else (
        QUICK_MATRIX if args.quick else FULL_MATRIX)
    if args.rows:
        keep = {r.strip() for r in args.rows.split(",")}
        matrix = {k: v for k, v in matrix.items() if k in keep}
    rows = []
    for name, knobs in matrix.items():
        knobs = dict(knobs, DINOUNET_TPU_BENCH_MODEL=args.model)
        print(f"=== {name}: {knobs} ===", flush=True)
        value, err = measure_tier(knobs, args.batch, timeout_s=args.timeout)
        row = {"name": name, "knobs": knobs, "batch": args.batch}
        if value is None:
            row["error"] = err
            print(f"  FAILED: {err}", flush=True)
        else:
            row["patches_per_sec"] = round(value, 2)
            row["environment_suspect"] = bool(floor and value < floor)
            print(f"  {value:.2f} p/s"
                  + (" [ENVIRONMENT-SUSPECT]" if row["environment_suspect"]
                     else ""), flush=True)
        rows.append(row)

    out = {
        "model": args.model,
        "batch": args.batch,
        "sanity_floor": floor,
        "timestamp": datetime.datetime.now().isoformat(timespec="seconds"),
        "rows": rows,
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
