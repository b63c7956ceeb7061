"""Global configuration knobs.

Mirrors the reference's global configuration surface
(ref: dinounet/configuration.py:5-10) while adding TPU-specific switches.
"""

import os

# Number of host-side worker processes/threads for preprocessing & friends.
default_num_processes = int(os.environ.get("nnUNet_def_n_proc", 8))

# Above this spacing-anisotropy ratio the resampling switches to the
# separate-z path (per-slice 2D resampling + independent z interpolation).
ANISO_THRESHOLD = 3

def use_pallas_msda() -> bool:
    """Pallas MSDA on TPU backends, pure-JAX gather elsewhere (CPU tests).

    Controlled by env DINOUNET_TPU_MSDA_IMPL in {"auto", "pallas", "jax"}.
    "auto" uses the Pallas kernels (forward + col2im backward) on TPU for both
    inference and training; "jax" forces the gather core (needed on CPU where
    the TPU kernels can't lower); "pallas" forces the kernels everywhere.
    """
    impl = os.environ.get("DINOUNET_TPU_MSDA_IMPL", "auto")
    if impl == "pallas":
        return True
    if impl == "jax":
        return False
    import jax

    return jax.default_backend() not in ("cpu",)


def msda_bf16_build() -> bool:
    """Opt-in bf16 bilinear-matrix build in the MSDA forward kernel.

    The factorized W-build is the kernel's VPU-bound dominant cost; packing it
    bf16 doubles VPU throughput. Coordinates and bilinear weights are still
    computed in f32 (bf16 coords would quantize sampling positions by up to
    1/16 px at grid size 32) — only the thin per-point weight vectors are cast
    before the big (H, W, Q) accumulate, and the MXU contraction runs
    bf16xbf16 -> f32. Inference-path only; the backward kernel stays f32.
    Env DINOUNET_TPU_MSDA_BF16=1 to enable. MEASURED NEGATIVE on v5e
    (BASELINE.md round 2: 139.0 -> 116.6 p/s end-to-end) — kept only as an
    experiment knob for other hardware generations; do not enable on v5e."""
    return os.environ.get("DINOUNET_TPU_MSDA_BF16", "0") == "1"


def msda_fused_prep() -> bool:
    """Fused MSDA prep: the Pallas forward consumes the projections' raw bf16
    offsets/logits and performs the fp32 cast + reference-point base add +
    softmax in VMEM (ops/msda_pallas.py::_fwd_kernel_fused), replacing three
    XLA passes (~0.1-0.2 ms each) per MSDA call and halving the offset/logit
    DMA bytes. The backward recomputes the prep XLA-side and chain-rules the
    softmax analytically.

    Env DINOUNET_TPU_MSDA_PREP in {"fused", "xla"}; default "fused" — the
    round-2 hardware A/B measured 147.99 vs 145.71 p/s end-to-end
    (.bench_logs/ab_results.txt) with exact-parity + VJP tests green
    (tests/test_msda.py::TestFusedPrep). Only consulted on the premapped
    Pallas path."""
    return os.environ.get("DINOUNET_TPU_MSDA_PREP", "fused") == "fused"


def int8_qkv_impl() -> str:
    """Implementation of the int8 serving mode's dmaj qkv projection.

    "xla" (default): the einsum formulation (qkv_q8_premapped_dmaj). The
    round-5 trace showed this already runs at ~87% of the int8 MXU ceiling
    (0.085 ms dot + 0.025 ms quantize prep per ViT-B block vs bf16's
    0.317 ms) — XLA fuses the int32->f32 rescale into the dot and the LN
    apply into the quantize, so the "XLA-side quantize + rescale passes"
    residual BASELINE.md carried from round 3 no longer exists at HEAD.
    "kernel": the fused Pallas path (ops/dense_q8_pallas.py::
    qkv_q8_dmaj_fused — per-token quantize, int8 dot, rescale in VMEM),
    MEASURED SLIGHTLY NEGATIVE round 5 (kernel 164.99/165.57 vs xla
    165.99/166.24 p/s, duplicate subprocess rows): its (B,N,C)->(B,C,N)
    operand transpose + the forfeited LN-into-dot fusion cost more than the
    (already-fused) passes it removes. Kept parity-/gate-tested so the
    measurement is reproducible.

    Env DINOUNET_TPU_INT8_QKV_IMPL in {"kernel", "xla"}."""
    v = os.environ.get("DINOUNET_TPU_INT8_QKV_IMPL", "xla")
    return v if v in ("kernel", "xla") else "xla"


def msda_merged_proj() -> bool:
    """Merged sampling_offsets + attention_weights projection (round 5).

    On the fused-prep Pallas path the two per-extractor projections read the
    same (B, 5376, 768) query activation (~66 MB) from HBM twice; the
    round-5 measured-byte floors put each dot at its read floor, so the only
    way to go faster is to read once. With this knob the adapter emits ONE
    channel-major einsum whose weight matrix interleaves the two kernels per
    head ((2LP offset | LP logit) rows), and the MSDA kernel consumes the
    packed buffer directly via BlockSpecs
    (ops/msda_pallas.py::ms_deform_attn_pallas_premapped_fused_merged) — no
    XLA slice pass in between. Param trees are unchanged (the two Dense
    param sets still exist; the interleave happens on the weight side).

    Env DINOUNET_TPU_MSDA_MERGED_PROJ in {"1", "0"}; default "0" — the
    round-5 hardware A/B measured the merge NEUTRAL-to-slightly-negative
    (merged 160.95/161.33 vs separate 161.27/161.49 p/s, duplicate
    subprocess rows): the two 66 MB query reads are evidently overlapped
    behind the MSDA kernels, so removing one buys nothing while the packed
    (B, 3LP·M, Lq) einsum costs a little elsewhere. Kept as a parity- and
    gate-tested knob so the measurement is reproducible. Only consulted
    when the premapped+fused-prep path is active."""
    return os.environ.get("DINOUNET_TPU_MSDA_MERGED_PROJ", "0") == "1"


def vit_int8() -> bool:
    """Experimental int8 serving mode for the FROZEN backbone's linear layers.

    w8a8 dynamic quantization (per-output-channel weights, per-token
    activations, int8xint8->int32 on the MXU's double-rate path, f32 dequant).
    Param tree/checkpoints unchanged — quantization happens at apply time.
    Opt-in via DINOUNET_TPU_VIT_INT8=1: the accuracy impact on REAL published
    checkpoints cannot be validated in this environment (no egress), so this
    must stay off until a deployment validates Dice parity on its own data.
    Bound on random weights: see tests/test_vit_parity.py::TestInt8Mode.

    On the fused dense path the mode uses the in-kernel w8a8 quantization
    (ops/dense_q8_pallas.py) so it keeps the stats-threaded block chain; with
    DINOUNET_TPU_DENSE_IMPL=jax it falls back to the unfused QuantDense."""
    return os.environ.get("DINOUNET_TPU_VIT_INT8", "0") == "1"


def int8_qkv() -> bool:
    """Whether the int8 serving mode also quantizes the QKV projection
    (XLA-side int8 einsum straight into the premapped per-head layout,
    ops/dense_q8_pallas.py::qkv_q8_premapped). DINOUNET_TPU_INT8_QKV=0 keeps
    the qkv einsum bf16 — an A/B knob because XLA's int8 handling of the
    transposed-write einsum is hardware-generation-dependent. Only consulted
    when vit_int8() is on and the premapped fused path is active."""
    return os.environ.get("DINOUNET_TPU_INT8_QKV", "1") == "1"


def adapter_int8() -> bool:
    """Whether the int8 serving mode extends to the adapter extractors'
    large matmuls (round 4, VERDICT r3 item 2b): the 6 MSDA output
    projections (channel-major w8a8 kernel, M*D=384 -> 768 over 5376
    queries) and the 6 ConvFFN fc2 junctions (GELU-prologue w8a8 kernel,
    192 -> 768) — the ~3.9 ms extractor pool next in line after the
    backbone linears. The extractors are NOT frozen in training (unlike the
    backbone), so this — like every int8 knob — is inference/serving only;
    the kernels carry exact-fp VJPs but training paths never enable
    vit_int8.

    Default flipped OFF in round 4: the junction matmuls were never
    MXU-bound (round-2 bf16 fusion there was already neutral), so in-kernel
    dynamic quantization is pure overhead — measured −4 p/s on the ndh
    chain and −13 on the dmaj chain (ab_int8_r4.json / ab_int8c_r4.json:
    int8 backbone-only 166.1-166.2 vs with-adapter 153.3-153.7 p/s).
    DINOUNET_TPU_INT8_ADAPTER=1 opts in for ablation."""
    return vit_int8() and os.environ.get("DINOUNET_TPU_INT8_ADAPTER", "0") == "1"


def use_fused_attention() -> bool:
    """Fused RoPE+SDPA Pallas kernel for the frozen backbone (TPU only).

    Controlled by env DINOUNET_TPU_ATTN_IMPL in {"auto", "pallas", "jax"};
    "auto" follows the MSDA kernel selection (Pallas on TPU, XLA elsewhere).
    """
    impl = os.environ.get("DINOUNET_TPU_ATTN_IMPL", "auto")
    if impl == "pallas":
        return True
    if impl == "jax":
        return False
    return use_pallas_msda()


def vit_scan_threshold() -> int:
    """Block-count threshold above which DinoViT runs its homogeneous block
    stack as ONE lax.scan body with depth-stacked params instead of an
    unrolled chain (round 4, DINOUNET_TPU_VIT_SCAN).

    Why: the unrolled ViT-7B/16 graph (40 blocks) exceeds what the XLA:TPU
    compile service will process (opaque HTTP-500/compiler-OOM — round-4
    bisection: the same blocks at depth 4 compile in 13 s, depth 40 dies,
    independent of every kernel knob), and a scanned body shrinks the
    backbone graph ~depth-fold. Deliberately NOT used for the s/b/l models:
    their unrolled graphs compile fast, the stats-threaded fused-dense
    chain is inter-block-heterogeneous at the boundaries, and unrolling
    lets XLA overlap across block boundaries.

    DINOUNET_TPU_VIT_SCAN: "auto" (default; scan when depth >= 24 on the
    non-fused path), "0"/"off" (never), or an integer threshold.
    Checkpoint note: scan mode stacks each block param leaf along a leading
    depth axis (params under 'blocks_scan/...'); models/convert.py emits
    the stacked layout when the mode is active for the target config.
    """
    v = os.environ.get("DINOUNET_TPU_VIT_SCAN", "auto")
    if v in ("auto", ""):
        return 24
    if v in ("0", "off", "never"):
        return 1 << 30
    try:
        return max(1, int(v))
    except ValueError:
        return 24


def attn_premapped_layout() -> str:
    """Lane layout of the premapped QKV projection / attention kernel pair
    (models/vit.py + ops/attention_pallas.py).

    "ndh": qkv einsum emits (B, 3, M, N, Dh) — the round-2 layout. Dh=64 is
    the minor dim, so every q/k/v tile wastes half its 128 lanes (~2x the
    qkv HBM bytes) and the projection einsum writes half-empty output tiles.
    "dmaj": qkv einsum emits (B, 3, M, Dh, N) — tokens in lanes, full tiles;
    RoPE's rotate-half becomes a sublane roll in the kernel
    (fused_rope_attention_premapped_dmaj). Same math, same (B, M, Dh, N)
    channel-major output.

    DINOUNET_TPU_ATTN_LAYOUT in {"ndh", "dmaj"}; default "dmaj" — the
    round-3 hardware A/B measured 156.93 vs 147.46 p/s end-to-end (+6.4%,
    `.bench_logs/ab_backbone_r3.json`). Only consulted on the premapped
    fused path without int8 qkv (qkv_q8_premapped emits ndh)."""
    impl = os.environ.get("DINOUNET_TPU_ATTN_LAYOUT", "dmaj")
    return impl if impl in ("ndh", "dmaj") else "dmaj"


def mlp_gelu_impl() -> str:
    """Where the backbone MLP's exact-erf GELU runs on the fused dense path.

    "kernel": inside the fused fc2 kernel (dense_stats_pallas.py, A&S-7.1.26
    erf on the VPU) — one HBM read of the fc1 output, but the per-element
    erf/exp/divide VPU work is comparable to the fc2 matmul's MXU time and
    can throttle it. "xla": nn.gelu(approximate=False) between fc1 and the
    kernel — XLA fuses it into fc1's epilogue (no extra pass) and the fc2
    kernel runs matmul-only.

    "chunked": in-kernel like "kernel", but the GELU+matmul unrolls over
    K-chunks (DINOUNET_TPU_GELU_KBLK, default 384) so the VPU erf/exp work
    of chunk j+1 can overlap chunk j's MXU contraction; the f32-accumulator
    regrouping can move rare output elements by 1 bf16 ulp vs "kernel"
    (dense_stats_pallas.py::_kernel).

    DINOUNET_TPU_MLP_GELU in {"kernel", "xla", "chunked"}; default "chunked"
    — the round-3 hardware A/B plus its replication pair measured chunked
    158.78/158.79/159.38 vs kernel 157.89/157.88/157.88 p/s end-to-end
    (`.bench_logs/ab_mlprows_r3.json`, `ab_gelu_r3.json` — consistent sign
    across 6 subprocess-isolated rows). Only consulted on the fused bf16
    dense path (the int8 kernels keep their in-kernel GELU prologue, which
    is load-bearing for the quantization layout)."""
    impl = os.environ.get("DINOUNET_TPU_MLP_GELU", "chunked")
    return impl if impl in ("kernel", "xla", "chunked") else "chunked"


def fused_dense_impl() -> str:
    """Implementation of the backbone's fused dense+residual+LN-stats op.

    DINOUNET_TPU_DENSE_IMPL in {"auto", "pallas", "interpret", "jax"}:
    "auto" uses the Pallas kernel (ops/dense_stats_pallas.py) on TPU and the
    plain flax path elsewhere; "interpret" runs the kernel in interpreter mode
    (CPU model-path tests); "jax" forces the unfused flax path. Under int8
    serving mode the fused path swaps in the w8a8 kernels
    (ops/dense_q8_pallas.py); "jax" + int8 is the unfused QuantDense path.
    """
    impl = os.environ.get("DINOUNET_TPU_DENSE_IMPL", "auto")
    if impl in ("pallas", "interpret", "jax"):
        return impl
    return "pallas" if use_pallas_msda() else "jax"


def use_fused_dense() -> bool:
    return fused_dense_impl() != "jax"


def decoder_tail_impl() -> str:
    """Implementation of the fused high-res decoder tail
    (ops/decoder_tail_pallas.py): channel-major conv+InstanceNorm+leaky+seg
    kernels for the final decoder stage at inference.

    DINOUNET_TPU_DECODER_TAIL in {"auto", "pallas", "interpret", "jax"}:
    "auto" uses the Pallas kernels on TPU and the plain flax path elsewhere.

    Default "jax": the round-3 hardware A/B measured the chain SLOWER than
    XLA end-to-end (136.9 vs 147.8 p/s for dinounet_b once it lowered —
    BASELINE.md "negative results"; the conv kernels run at ~7% MFU against
    their 37% M=96/K=64 MXU ceiling and the packed-transpconv bit-view
    costs an extra XLA pass). Kept opt-in + lowering-gated rather than
    deleted so the measurement is reproducible (tools/ab_matrix.py)."""
    impl = os.environ.get("DINOUNET_TPU_DECODER_TAIL", "jax")
    if impl in ("pallas", "interpret", "jax"):
        return impl
    return "pallas" if use_pallas_msda() else "jax"


def use_fused_decoder_tail() -> bool:
    return decoder_tail_impl() != "jax"


def conv_cm_inner() -> str:
    """Inner-loop formulation of the channel-major conv3x3 kernel
    (ops/decoder_tail_pallas.py::conv3x3_cm).

    "merged": the halo-extended stripe is lane-merged once and the three dy
    taps read lane-tile-aligned slices (offsets dy*W, W % 128 == 0), with
    the dx combine as masked 1-lane shift-adds on the output — removes the
    per-(chunk, dy) stripe relayouts that pinned the chunked kernel at ~7%
    MFU (round-3 trace, BASELINE.md negative results).
    "chunked": the round-3 dy-shifted-sublane-read kernel, kept for A/B.

    DINOUNET_TPU_CONV_CM_INNER in {"merged", "chunked"}."""
    impl = os.environ.get("DINOUNET_TPU_CONV_CM_INNER", "merged")
    return impl if impl in ("merged", "chunked") else "merged"


def seg_head_reduce() -> bool:
    """Inference-time seg-head formulation: express the 1x1 num_classes
    projection as a broadcast-multiply + lane reduction instead of a
    dot_general, hoping XLA fuses the stage's InstanceNorm-apply + leaky
    into the reduce pass (a dot operand cannot absorb elementwise
    producers).

    Default OFF: the round-3 hardware A/B measured it 4.6% SLOWER end to
    end (141.03 vs 147.79 p/s, .bench_logs/ab_seg_r3.json) — XLA refuses a
    cross-lane reduction over the lane-padded channel dim and instead
    relayouts the full 537 MB stage-2 map twice ({3,0,2,1}<->{2,3,1,0}
    copies, 0.99+1.09 ms in the trace), outweighing the fused pass. The
    dot form is already within ~8% of its HBM read floor. See BASELINE.md
    "negative results"."""
    return os.environ.get("DINOUNET_TPU_SEG_REDUCE", "0") == "1"


def seg_head_impl() -> str:
    """DINOUNET_TPU_SEG_IMPL in {"convbf", "conv", "convw", "dot"}:
    inference-time seg-head formulation.

    The round-4 trace showed the final stage's InstanceNorm-apply +
    leaky_relu as the only remaining standalone full-map pass (1.63 ms kLoop
    fusion over the 537 MB stage-2 map): a dot operand cannot absorb
    elementwise producers, while a convolution operand can (every other
    stage's apply+leaky is absorbed into the consuming conv/transpconv
    fusion). Measured A/B (.bench_logs/ab_segimpl*_r4.json, duplicate rows):

    - "dot"   158.11/159.22/158.53 p/s — the standalone pass stays;
    - "conv"  157.83/158.33 — NHWC 1x1 conv absorbs the producer but the
      emitter writes f32 logits batch-in-lanes (B=8 -> 128-lane pad,
      537 MB) plus a 0.77 ms canonicalizing copy: a wash;
    - "convw" 158.93/157.80 — conv with batch=W keeps the dot's small
      W-in-lanes output but that emitter does NOT take input fusions, so
      the standalone pass stays: a wash;
    - "convbf" 160.39/161.05 (**default**) — the absorbing NHWC conv with a
      bf16 output: halves the bad write, shrinks the canonicalizing copy.
      The logits round through bf16 once at inference (|err| ~ 2^-8
      relative; training and the dot path keep full f32 accumulation).

    The value is captured at trace time (subprocess-per-row A/Bs only)."""
    return os.environ.get("DINOUNET_TPU_SEG_IMPL", "convbf")


def decoder_hwbc() -> str:
    """DINOUNET_TPU_DECODER_HWBC in {"jax", "auto", "interpret"}: run the
    eligible high-resolution decoder stages' 3x3 convs through the
    native-layout Pallas kernels (ops/conv_hwbc_pallas.py) at inference.

    XLA's sub-128-channel conv emitter packs batch into the matmul M
    dimension (M=8 -> <=12.5% MXU), pinning stage2's convs at 3.26/2.04 ms
    vs 1.97/1.31 ms layout-byte floors (round-4 trace + tools/hbm_floors.py).
    The kernel keeps XLA's own physical layout (H, W, B, C-lanes) so —
    unlike the round-3 channel-major chain — the stage boundaries are
    layout bitcasts, not relayouts. "auto" engages on TPU; "interpret" runs
    the kernel in interpreter mode (tests); default set by hardware A/B.
    Inference-only: training keeps the flax graph."""
    return os.environ.get("DINOUNET_TPU_DECODER_HWBC", "jax")


def decoder_concat_impl() -> str:
    """How each decoder stage feeds [transpconv_out, skip] to its first conv.

    "concat" (default): materialize jnp.concatenate([up, skip], -1) and run
    conv0 over the 2C-channel map — the reference formulation
    (ref dinounet_training.py:601-612). In the round-5 train trace this
    cluster is ~5.4 ms of the 58.7 ms dinounet_s step: the concat runs as
    pad/maximum fusions into XLA's 3-tap windowed conv layouts (~4.5 ms
    incl. a 1.27 ms pad_maximum_fusion at 512^2) and its backward is a
    0.9 ms split + relayout copies.

    "split": exploit conv linearity in input channels —
    conv0(concat(up, skip)) == conv0[:, :, :C](up) + conv0[:, :, C:](skip)
    — so the 2C map never exists: two C-channel convs accumulate into the
    same output, the backward produces the two input grads directly with no
    split, and XLA lays out each branch from its producer's layout. Exact
    same param tree (the kernel is sliced, not re-declared); numerics agree
    up to f32-accumulation order inside the dot.

    MEASURED A BIG LOSS round 5 (train step dinounet_s batch 2:
    split 77.6/77.7 vs concat 60.8/60.7 ms/iter, duplicate subprocess
    rows): what the trace attributes to "concatenate" is mostly the 3-tap
    windowed-input build of XLA's spatial-partitioned conv algorithm, and
    splitting conv0 into two convs makes each pay its OWN windowed build +
    halo — duplicating exactly the work the merge was meant to remove.
    Default stays "concat"; the knob is parity-/gradient-tested
    (tests/test_models.py::TestSplitConcatDecoder) so the measurement is
    reproducible.

    Env DINOUNET_TPU_DECODER_CONCAT in {"concat", "split"}; applies to the
    plain flax stage path (train and eval); the fused/hwbc/wide inference
    paths keep their own formulations."""
    v = os.environ.get("DINOUNET_TPU_DECODER_CONCAT", "concat")
    return v if v in ("concat", "split") else "concat"


def decoder_wide_convs() -> bool:
    """Inference-only "wide" decoder stages: XLA assigns the decoder's
    high-resolution bf16 feature maps channel-minor layouts where the
    (8, 128) tile pads the lane dimension to 128, so a 32-channel map costs
    the same HBM bytes as a 128-channel one (round-3 trace: stage2's convs
    run 1.6x above even that padded floor on the Cout<128 emitter path).
    With this knob the sub-128-channel decoder stages run their convs with
    output channels zero-padded to the full 128 lanes — identical physical
    traffic, full-lane MXU stores — staying wide through InstanceNorm/leaky
    (padded channels are exactly 0 end-to-end) and slicing nowhere: the seg
    heads and next-stage transposed convs consume the wide map through
    zero-padded weight rows. Param trees/checkpoints unchanged; training
    keeps the plain flax graph.

    Env DINOUNET_TPU_DECODER_WIDE in {"1", "0"}; default set by the round-3
    hardware A/B (tools/ab_matrix.py)."""
    return os.environ.get("DINOUNET_TPU_DECODER_WIDE", "0") == "1"


def spm_cm_impl() -> str:
    """Implementation of the SpatialPriorModule's high-res stem convs
    (stem2/stem3: 3x3 stride-1 at 1/2 resolution, 64 channels — the same
    sub-128-channel conv shape class the decoder tail targets; XLA runs them
    at ~12-25% MFU). "pallas" routes them through ops/decoder_tail_pallas.py
    ::conv3x3_cm in channel-major layout with the BatchNorm inference applies
    folded into the kernel prologues; inference-only (training keeps flax).

    DINOUNET_TPU_SPM_CM in {"auto", "pallas", "interpret", "jax"}.

    Default "jax": the round-3 hardware A/B measured the CM stem slower
    end-to-end (143.3 vs 147.8 p/s; the two CM kernels take 1.86 ms vs
    XLA's fused stem convs plus the boundary relayouts — BASELINE.md
    "negative results"). Opt-in + lowering-gated, same rationale as
    decoder_tail_impl."""
    impl = os.environ.get("DINOUNET_TPU_SPM_CM", "jax")
    if impl in ("pallas", "interpret", "jax"):
        return impl
    return "pallas" if use_pallas_msda() else "jax"


def use_spm_cm() -> bool:
    return spm_cm_impl() != "jax"


def enable_persistent_compilation_cache() -> None:
    """Turn on JAX's on-disk executable cache (idempotent).

    The DinoUNet train step takes minutes to compile (pallas MSDA kernels
    inside a large differentiated graph); caching compiled executables across
    processes turns every non-first run's compile into a disk read. Opt out
    with DINOUNET_TPU_COMPILE_CACHE=0.
    """
    global _cache_enabled
    if globals().get("_cache_enabled"):
        return
    cache_dir = os.environ.get(
        "DINOUNET_TPU_COMPILE_CACHE",
        os.path.expanduser("~/.cache/dinounet_tpu_jax"))
    if cache_dir in ("0", ""):
        return
    import jax

    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        globals()["_cache_enabled"] = True
    except Exception:
        pass
