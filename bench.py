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

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

BASELINE_PATCHES_PER_SEC = 60.0  # estimated A100 PyTorch reference (see above)


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


def main():
    import jax

    log(f"backend={jax.default_backend()} devices={jax.devices()}")
    batches = [8, 4, 1] if jax.default_backend() != "cpu" else [1]
    forced = os.environ.get("DINOUNET_TPU_BENCH_BATCH")
    if forced:
        # skip the OOM step-down (each failed candidate costs a full compile
        # through the dev tunnel); e.g. dinounet_7b runs at batch 1
        batches = [int(forced)]
    value = None
    # fallback tiers: if a Pallas path fails to lower/execute, step down to
    # the XLA formulations knob by knob (decoder tail first, then the dense/
    # attention fusions, then the MSDA kernel) so a single kernel regression
    # never zeroes the benchmark
    tail0 = os.environ.get("DINOUNET_TPU_DECODER_TAIL", "auto")
    spm0 = os.environ.get("DINOUNET_TPU_SPM_CM", "auto")
    dense0 = os.environ.get("DINOUNET_TPU_DENSE_IMPL", "auto")
    msda0 = os.environ.get("DINOUNET_TPU_MSDA_IMPL", "auto")
    prep0 = os.environ.get("DINOUNET_TPU_MSDA_PREP", "xla")
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
    win = None
    # outer loop = MSDA impl (dropping the Pallas MSDA kernel costs ~8x and
    # must be the LAST resort); inner loop = the conv-chain/dense knobs,
    # which are cheap to give up
    for impl, prep in impls:
        os.environ["DINOUNET_TPU_MSDA_IMPL"] = impl
        os.environ["DINOUNET_TPU_MSDA_PREP"] = prep
        for tail, spm, dense in tiers:
            os.environ["DINOUNET_TPU_DECODER_TAIL"] = tail
            os.environ["DINOUNET_TPU_SPM_CM"] = spm
            os.environ["DINOUNET_TPU_DENSE_IMPL"] = dense
            for batch in batches:
                try:
                    value = run(batch)
                    win = (tail, spm, dense, impl, prep, batch)
                    break
                except Exception as e:  # OOM or lowering failure: step down
                    log(f"batch={batch} impl={impl} prep={prep} tail={tail} "
                        f"spm={spm} dense={dense} failed: "
                        f"{type(e).__name__}: {e}")
            if value is not None:
                break
        if value is not None:
            break
    if value is None:
        raise SystemExit("benchmark failed for all configurations")

    # Best-of guard for unmeasured kernel chains: when the winning config ran
    # the conv-chain kernels (decoder tail / SPM stem), also time the plain-
    # XLA formulation at the same batch/MSDA config and report the faster of
    # the two — a chain that lowers but runs slower must not drag the
    # headline number below the known-good configuration.
    if win is not None and (win[0] != "jax" or win[1] != "jax"):
        tail, spm, dense, impl, prep, batch = win
        os.environ["DINOUNET_TPU_DECODER_TAIL"] = "jax"
        os.environ["DINOUNET_TPU_SPM_CM"] = "jax"
        try:
            alt = run(batch)
            log(f"best-of: chain {value:.1f} vs plain {alt:.1f} p/s")
            if alt > value:
                value = alt
            else:
                os.environ["DINOUNET_TPU_DECODER_TAIL"] = tail
                os.environ["DINOUNET_TPU_SPM_CM"] = spm
        except Exception as e:
            log(f"best-of plain config failed: {type(e).__name__}: {e}")
            os.environ["DINOUNET_TPU_DECODER_TAIL"] = tail
            os.environ["DINOUNET_TPU_SPM_CM"] = spm

    model = os.environ.get("DINOUNET_TPU_BENCH_MODEL", "dinounet_b")
    out = {
        "metric": "sliding_window_patches_per_sec_" + model,
        "value": round(value, 2),
        "unit": "patches/sec/chip",
    }
    if model == "dinounet_b":
        # the 60 p/s A100 estimate is a dinounet_b baseline; a ratio for any
        # other model would be meaningless
        out["vs_baseline"] = round(value / BASELINE_PATCHES_PER_SEC, 3)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
