"""Headline benchmark: sliding-window patches/sec for dinounet_b.

BASELINE.json's primary metric — "Sliding-window patches/sec/chip
(dinounet_b)" — measured as the steady-state throughput of the jitted tile
forward (frozen ViT-B/16 backbone + adapter + FAPM + U-Net decoder) on
batched 512x512 tiles, exactly the hot loop of inference
(ref: dinounet/inference/predict_from_raw_data.py:571-621, which runs tiles
serially at batch 1; we batch them — the structural TPU win).

Baseline for vs_baseline: the reference publishes no numbers
(SURVEY.md §6, BASELINE.md). We use an estimated 60 patches/sec for the
reference's serial PyTorch sliding-window loop on A100 (fp16 autocast,
batch-1 tiles, MSDA forward in fp32 grid_sample per ms_deform_attn.py:28-45)
derived from its per-tile FLOP count (~250 GFLOPs) at realistic batch-1
utilization. vs_baseline = measured / 60.

Measurement hygiene (round-3, after the round-2 relay wedge contaminated the
A/B rows — VERDICT r2 items 5/6): every (kernel-tier, batch) candidate runs
in its OWN subprocess so a Mosaic lowering failure or a wedged relay cannot
contaminate the next tier's process/session; results below 30% of the
last-known-good throughput are flagged environment-suspect (printed in the
JSON) and never used to conclude a kernel comparison; and the JSON names the
kernel set that actually produced the headline number, so a silent step-down
is visible in the artifact.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import os
import subprocess
import sys
import time

BASELINE_PATCHES_PER_SEC = 60.0  # estimated A100 PyTorch reference (see above)

# Sanity floor: measured healthy throughput per model (BASELINE.md). A tier
# result below 30% of this is an environment artifact (degraded relay, wedged
# runtime), not a kernel property — round 2 recorded 10 p/s "measurements"
# through a dying relay that were meaningless as kernel comparisons.
LAST_KNOWN_GOOD = {
    "dinounet_s": 222.9,   # round 4 (was 201.6 round 2)
    "dinounet_b": 161.6,   # round 4
    "dinounet_l": 71.5,    # round 4 (was 67.8 round 2)
    "dinounet_7b": 8.1,    # round 4 (scanned backbone + bf16 bench weights)
}
SUSPECT_FRACTION = 0.3

KNOBS = ("DINOUNET_TPU_DECODER_TAIL", "DINOUNET_TPU_SPM_CM",
         "DINOUNET_TPU_DENSE_IMPL", "DINOUNET_TPU_MSDA_IMPL",
         "DINOUNET_TPU_MSDA_PREP", "DINOUNET_TPU_ATTN_LAYOUT",
         "DINOUNET_TPU_MLP_GELU", "DINOUNET_TPU_CONV_CM_INNER",
         "DINOUNET_TPU_SEG_IMPL")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build(batch, model_name=None):
    import jax
    import jax.numpy as jnp

    from dinounet_tpu.models.dinounet import (
        DINOV3_INTERACTION_INDEXES,
        DINOV3_MODEL_NAMES,
        DinoUNet,
        DinoUNetConfig,
    )
    from dinounet_tpu.models.vit import VIT_CONFIGS

    # headline metric is dinounet_b; DINOUNET_TPU_BENCH_MODEL overrides for
    # the BASELINE.md side table (dinounet_s/l/7b)
    model_name = model_name or os.environ.get("DINOUNET_TPU_BENCH_MODEL",
                                              "dinounet_b")
    cfg = DinoUNetConfig(
        vit=VIT_CONFIGS[DINOV3_MODEL_NAMES[model_name]],
        interaction_indexes=DINOV3_INTERACTION_INDEXES[model_name],
        num_classes=3,
    )
    model = DinoUNet(cfg)
    x = jnp.zeros((batch, 512, 512, 1), jnp.bfloat16)
    if model_name == "dinounet_7b":
        # The real published 7B weights are bf16 and the converter preserves
        # that (models/convert.py), so serving loads ~13.5 GiB — but
        # model.init creates f32 params (~28 GiB), which neither fits the
        # 16 GiB chip nor survives compile-time buffer assignment (the
        # round-4 7B HTTP-500s were exactly this). Build the bench weights
        # at the serving dtype directly: shapes from eval_shape, matrix
        # (ndim>=2) f32 leaves stored bf16, vectors/norm params kept f32.
        shapes = jax.eval_shape(
            lambda k: model.init(k, x, train=False), jax.random.PRNGKey(0))
        variables = jax.tree.map(
            lambda s: jnp.zeros(
                s.shape,
                jnp.bfloat16 if (s.dtype == jnp.float32 and len(s.shape) >= 2)
                else s.dtype),
            shapes)
    else:
        variables = jax.jit(model.init, static_argnames=("train",))(
            jax.random.PRNGKey(0), x, train=False)

    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    return fwd, variables, x


def _drain(out) -> float:
    """Synchronize by host readback: on the axon relay backend,
    block_until_ready returns before execution finishes, but the device
    stream is ordered, so reading one scalar of the last output back to the
    host proves everything before it completed."""
    import jax.numpy as jnp

    return float(jnp.ravel(out)[0])


def run(batch, iters=16):
    fwd, variables, x = build(batch)
    log(f"compiling tile forward, batch={batch} ...")
    t0 = time.perf_counter()
    _drain(fwd(variables, x))
    log(f"compiled+first step in {time.perf_counter() - t0:.1f}s")
    _drain(fwd(variables, x))  # warm
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fwd(variables, x)
        _drain(out)
        dt = time.perf_counter() - t0
        best = max(best, batch * iters / dt)
    return best


def run_production(batch, iters=8):
    """Production sliding-window throughput (VERDICT r4 weak #5): tiles flow
    through inference/sliding_window.py's jitted predictor — dynamic-slice
    tile extraction, gaussian multiply + scatter-add accumulation all in the
    SAME jit as the forward, so no canonical f32 logits tensor is ever
    materialized (the tile-loop headline pays a ~1.27 ms/step
    canonicalization the production path never does). Fixed case: one
    1280x1280 slice at tile_step_size 0.5 -> a 4x4 grid of 16 tiles = two
    full batches of 8. Ref hot loop: predict_from_raw_data.py:571-621."""
    import jax.numpy as jnp

    from dinounet_tpu.inference.sliding_window import (
        make_tile_predictor_2d,
        sliding_window_offsets_2d,
    )
    from dinounet_tpu.models.dinounet import (
        DINOV3_INTERACTION_INDEXES,
        DINOV3_MODEL_NAMES,
        DinoUNet,
        DinoUNetConfig,
    )
    from dinounet_tpu.models.vit import VIT_CONFIGS
    import jax

    model_name = os.environ.get("DINOUNET_TPU_BENCH_MODEL", "dinounet_b")
    cfg = DinoUNetConfig(
        vit=VIT_CONFIGS[DINOV3_MODEL_NAMES[model_name]],
        interaction_indexes=DINOV3_INTERACTION_INDEXES[model_name],
        num_classes=3,
    )
    model = DinoUNet(cfg)
    init_x = jnp.zeros((batch, 512, 512, 1), jnp.bfloat16)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), init_x, train=False)

    predict = make_tile_predictor_2d(
        lambda v, t: model.apply(v, t, train=False), (512, 512),
        num_classes=3, tile_batch=batch)
    volume = jnp.zeros((1, 1280, 1280, 1), jnp.bfloat16)
    offsets = jnp.asarray(
        sliding_window_offsets_2d((1, 1280, 1280), (512, 512), 0.5))
    n_tiles = int(offsets.shape[0])  # 16: two full batches of 8
    log(f"compiling production predictor ({n_tiles} tiles/case) ...")
    t0 = time.perf_counter()
    accum, _ = predict(volume, offsets, variables)
    _drain(accum)
    log(f"compiled+first case in {time.perf_counter() - t0:.1f}s")
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            accum, _ = predict(volume, offsets, variables)
        _drain(accum)
        dt = time.perf_counter() - t0
        best = max(best, n_tiles * iters / dt)
    return best


def _child(batch: int, production: bool = False) -> None:
    """Run ONE (tier, batch) measurement in this process; knobs come from the
    environment. Prints a single JSON line with the result."""
    try:
        value = run_production(batch) if production else run(batch)
        print(json.dumps({"ok": True, "value": value}), flush=True)
    except Exception as e:  # noqa: BLE001 — the parent needs the reason
        print(json.dumps({"ok": False, "error": f"{type(e).__name__}: "
                          f"{str(e).splitlines()[0][:400]}"}), flush=True)


def measure_tier(knobs: dict, batch: int, timeout_s: int = 1500,
                 production: bool = False):
    """Measure one (kernel-tier, batch) in a fresh subprocess. Returns
    (value, error): value is patches/sec or None; error is a short string."""
    env = dict(os.environ)
    env.update(knobs)
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--child-prod" if production else "--child", str(batch)],
            env=env, capture_output=True, text=True, timeout=timeout_s,
            cwd=os.path.dirname(os.path.abspath(__file__)))
    except subprocess.TimeoutExpired:
        return None, f"timeout after {timeout_s}s"
    for line in proc.stderr.splitlines():
        if "compil" in line or "failed" in line:
            log("  " + line)
    for line in reversed(proc.stdout.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                res = json.loads(line)
            except json.JSONDecodeError:
                continue
            if res.get("ok"):
                return float(res["value"]), None
            return None, res.get("error", "unknown")
    return None, f"no result (rc={proc.returncode}): " + \
        (proc.stderr.strip().splitlines()[-1][:300] if proc.stderr else "")


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        _child(int(sys.argv[2]))
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--child-prod":
        _child(int(sys.argv[2]), production=True)
        return

    # Fail fast when the TPU backend is unreachable: during a relay wedge —
    # or after the tunnel process dies outright — `import jax` +
    # `jax.devices()` blocks FOREVER in backend init (no client-side
    # timeout), so probe in a killable subprocess first and emit a
    # diagnosable JSON line instead of hanging the harness.
    try:
        probe = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices(); print('OK')"],
            capture_output=True, text=True, timeout=180)
        backend_ok = probe.returncode == 0 and "OK" in probe.stdout
        backend_err = "" if backend_ok else \
            (probe.stderr.strip().splitlines() or ["backend init failed"])[-1]
    except subprocess.TimeoutExpired:
        backend_ok, backend_err = False, \
            "backend init blocked >180s (relay wedged or tunnel dead)"
    if not backend_ok:
        print(json.dumps({
            "metric": "sliding_window_patches_per_sec_dinounet_b",
            "value": None, "unit": "patches/sec/chip",
            "error": f"no usable TPU backend: {backend_err[:300]}",
            "environment_suspect": True}), flush=True)
        return

    import jax

    log(f"backend={jax.default_backend()} devices={jax.devices()}")
    model = os.environ.get("DINOUNET_TPU_BENCH_MODEL", "dinounet_b")
    batches = [8, 4, 1] if jax.default_backend() != "cpu" else [1]
    forced = os.environ.get("DINOUNET_TPU_BENCH_BATCH")
    if forced:
        # skip the OOM step-down (each failed candidate costs a full compile
        # through the dev tunnel); e.g. dinounet_7b runs at batch 1
        batches = [int(forced)]
    floor = SUSPECT_FRACTION * LAST_KNOWN_GOOD.get(model, 0.0)

    # fallback tiers: if a Pallas path fails to lower/execute, step down to
    # the XLA formulations knob by knob (decoder tail first, then the dense/
    # attention fusions, then the MSDA kernel) so a single kernel regression
    # never zeroes the benchmark
    # defaults mirror configuration.py: the CM conv chain measured slower
    # than XLA end-to-end (round-3 A/B, BASELINE.md), so the headline runs
    # tail/spm on XLA unless the env opts in
    tail0 = os.environ.get("DINOUNET_TPU_DECODER_TAIL", "jax")
    spm0 = os.environ.get("DINOUNET_TPU_SPM_CM", "jax")
    dense0 = os.environ.get("DINOUNET_TPU_DENSE_IMPL", "auto")
    msda0 = os.environ.get("DINOUNET_TPU_MSDA_IMPL", "auto")
    prep0 = os.environ.get("DINOUNET_TPU_MSDA_PREP", "fused")
    tiers = []
    # the decoder tail and the SPM stem share the conv3x3_cm kernel family,
    # so they step down together
    for tail, spm, dense in ((tail0, spm0, dense0), ("jax", "jax", dense0),
                             ("jax", "jax", "jax")):
        if (tail, spm, dense) not in tiers:
            tiers.append((tail, spm, dense))
    impls = []
    for impl, prep in ((msda0, prep0), (msda0, "xla"), ("jax", "xla")):
        if (impl, prep) not in impls:
            impls.append((impl, prep))

    value = None
    win = None
    suspect = False
    # outer loop = MSDA impl (dropping the Pallas MSDA kernel costs ~8x and
    # must be the LAST resort); inner loop = the conv-chain/dense knobs,
    # which are cheap to give up
    for impl, prep in impls:
        for tail, spm, dense in tiers:
            knobs = {
                "DINOUNET_TPU_DECODER_TAIL": tail,
                "DINOUNET_TPU_SPM_CM": spm,
                "DINOUNET_TPU_DENSE_IMPL": dense,
                "DINOUNET_TPU_MSDA_IMPL": impl,
                "DINOUNET_TPU_MSDA_PREP": prep,
            }
            for batch in batches:
                tag = (f"tail={tail} spm={spm} dense={dense} impl={impl} "
                       f"prep={prep} batch={batch}")
                log(f"tier: {tag}")
                v, err = measure_tier(knobs, batch)
                if v is None:
                    log(f"  failed: {err}")
                    continue
                log(f"  {v:.1f} p/s")
                value, win = v, dict(knobs, batch=batch)
                break
            if value is not None:
                break
        if value is not None:
            break
    if value is None:
        raise SystemExit("benchmark failed for all configurations")

    if floor and value < floor:
        # a wedged relay measures everything at a fraction of real speed;
        # don't draw kernel conclusions from this run
        suspect = True
        log(f"WARNING: {value:.1f} p/s is below the {floor:.1f} p/s sanity "
            f"floor (30% of last-known-good {LAST_KNOWN_GOOD[model]}) — "
            "flagging as environment-suspect")

    # Best-of guard for the conv-chain kernels: when the winning config ran
    # the decoder tail / SPM stem, also time the plain-XLA formulation at the
    # same batch/MSDA config (own subprocess) and report the faster of the
    # two — a chain that lowers but runs slower must not drag the headline
    # number below the known-good configuration.
    if win and (win["DINOUNET_TPU_DECODER_TAIL"] != "jax"
                or win["DINOUNET_TPU_SPM_CM"] != "jax") and not suspect:
        plain = dict(win)
        batch = plain.pop("batch")
        plain["DINOUNET_TPU_DECODER_TAIL"] = "jax"
        plain["DINOUNET_TPU_SPM_CM"] = "jax"
        alt, err = measure_tier(plain, batch)
        if alt is not None:
            log(f"best-of: chain {value:.1f} vs plain {alt:.1f} p/s")
            if alt > value and alt >= floor:
                value, win = alt, dict(plain, batch=batch)
        else:
            log(f"best-of plain config failed: {err}")

    out = {
        "metric": "sliding_window_patches_per_sec_" + model,
        "value": round(value, 2),
        "unit": "patches/sec/chip",
    }
    if model == "dinounet_b":
        # the 60 p/s A100 estimate is a dinounet_b baseline; a ratio for any
        # other model would be meaningless
        out["vs_baseline"] = round(value / BASELINE_PATCHES_PER_SEC, 3)

    # Production sliding-window row (VERDICT r4 weak #5): the same winning
    # knobs driven through inference/sliding_window.py's in-jit gaussian
    # accumulate on a fixed 16-tile case — no output canonicalization, i.e.
    # what deployments actually get. Skipped for non-headline models and on
    # environment-suspect runs (no kernel conclusions from a degraded relay).
    if model == "dinounet_b" and win and not suspect \
            and not os.environ.get("DINOUNET_TPU_BENCH_SKIP_PROD"):
        prod_knobs = {k: v for k, v in win.items() if k != "batch"}
        prod, perr = measure_tier(prod_knobs, win["batch"], production=True)
        if prod is not None:
            log(f"production sliding-window: {prod:.1f} p/s "
                f"(tile-loop {value:.1f})")
            out["production_patches_per_sec"] = round(prod, 2)
            out["production_case"] = "1280x1280, 16 tiles, step 0.5"
        else:
            log(f"production row failed: {perr}")
    if win:
        out["active_kernels"] = {
            "decoder_tail": win["DINOUNET_TPU_DECODER_TAIL"],
            "spm_cm": win["DINOUNET_TPU_SPM_CM"],
            "dense": win["DINOUNET_TPU_DENSE_IMPL"],
            "msda": win["DINOUNET_TPU_MSDA_IMPL"],
            "msda_prep": win["DINOUNET_TPU_MSDA_PREP"],
            # knobs the tier ladder doesn't vary — report the effective value
            # (env override or configuration.py default) so the artifact
            # names the full active kernel set
            "attn_layout": win.get(
                "DINOUNET_TPU_ATTN_LAYOUT",
                os.environ.get("DINOUNET_TPU_ATTN_LAYOUT", "dmaj")),
            "mlp_gelu": win.get(
                "DINOUNET_TPU_MLP_GELU",
                os.environ.get("DINOUNET_TPU_MLP_GELU", "chunked")),
            "conv_cm_inner": win.get(
                "DINOUNET_TPU_CONV_CM_INNER",
                os.environ.get("DINOUNET_TPU_CONV_CM_INNER", "merged")),
            "seg_impl": win.get(
                "DINOUNET_TPU_SEG_IMPL",
                os.environ.get("DINOUNET_TPU_SEG_IMPL", "convbf")),
            "batch": win["batch"],
        }
    if suspect:
        out["environment_suspect"] = True
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
