"""Real-TPU Mosaic lowering gate (VERDICT r2 item 5).

`jax.export(platforms=['tpu'])` and interpret-mode tests proved unable to see
Mosaic layout-inference failures twice in round 2 (the decoder-tail and SPM
kernels passed both and failed `infer-vector-layout` on hardware). This gate
drives each Pallas wrapper AND the full tile forward through the REAL TPU
compile path — `jax.jit(fn).lower(args).compile()` — which on this machine
goes through the axon remote-compile endpoint (TpuAotCompiler when no chip is
attached, the live compiler otherwise). Compile-only: nothing executes, no
input data moves, so a check costs seconds once the compile cache is warm.

Reports per-kernel PASS/FAIL; exit code 1 on any failure.

Usage:
    python tools/lowering_gate.py            # kernel wrappers + dinounet_b fwd
    python tools/lowering_gate.py --quick    # kernel wrappers only
    python tools/lowering_gate.py --train    # also the dinounet_s train step
"""

import sys
import time
import traceback

# keep kernel knobs at their Pallas settings regardless of ambient env
import os  # noqa: E402  (env must be set before dinounet imports)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("DINOUNET_TPU_MSDA_IMPL", "pallas")
os.environ.setdefault("DINOUNET_TPU_ATTN_IMPL", "pallas")
os.environ.setdefault("DINOUNET_TPU_DENSE_IMPL", "pallas")
os.environ.setdefault("DINOUNET_TPU_DECODER_TAIL", "pallas")
os.environ.setdefault("DINOUNET_TPU_SPM_CM", "pallas")
os.environ.setdefault("DINOUNET_TPU_MSDA_PREP", "fused")
os.environ.setdefault("DINOUNET_TPU_DECODER_HWBC", "auto")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

FAILURES = []


def gate(name, fn, *args):
    """Compile fn(*args) for TPU; PASS iff XLA+Mosaic accept it."""
    t0 = time.perf_counter()
    try:
        jax.jit(fn).lower(*args).compile()
        print(f"PASS {name} ({time.perf_counter() - t0:.1f}s)", flush=True)
    except Exception as e:  # noqa: BLE001 — report and continue
        msg = str(e).splitlines()
        head = next((ln for ln in msg if "Mosaic" in ln or "INTERNAL" in ln),
                    msg[0] if msg else "")
        print(f"FAIL {name}: {type(e).__name__}: {head[:200]}", flush=True)
        if "-v" in sys.argv:
            traceback.print_exc()
        FAILURES.append(name)


def _rand(key, shape, dtype=jnp.bfloat16):
    return jax.random.normal(key, shape, jnp.float32).astype(dtype)


def gate_kernels():
    from dinounet_tpu.ops import decoder_tail_pallas as dt
    from dinounet_tpu.ops import dense_stats_pallas as ds
    from dinounet_tpu.ops import attention_pallas as ap
    from dinounet_tpu.ops import msda_pallas as mp

    k = jax.random.PRNGKey(0)
    ks = iter(jax.random.split(k, 64))

    # --- decoder-tail family (small-but-representative shapes) ---
    B, Cin, Cout, H, W = 2, 64, 32, 128, 128
    x = _rand(next(ks), (B, Cin, H, W))
    w3 = _rand(next(ks), (3, 3, Cin, Cout), jnp.float32)
    b3 = _rand(next(ks), (Cout,), jnp.float32)
    s = jnp.abs(_rand(next(ks), (B, Cin), jnp.float32)) + 0.5
    t = _rand(next(ks), (B, Cin), jnp.float32)
    gate("conv3x3_cm[stats]", lambda a: dt.conv3x3_cm(a, w3, b3), x)
    gate("conv3x3_cm[prologue,nostats]",
         lambda a: dt.conv3x3_cm(a, w3, b3, prologue=(s, t), stats=False), x)
    wt = _rand(next(ks), (2, 2, Cin, Cout), jnp.float32)
    gate("transpconv2x2_cm",
         lambda a: dt.transpconv2x2_cm(a, wt, b3, prologue=(s, t)), x)
    wsg = _rand(next(ks), (Cin, 3), jnp.float32)
    bsg = _rand(next(ks), (3,), jnp.float32)
    gate("seg_head_cm",
         lambda a: dt.seg_head_cm(a, wsg, bsg, prologue=(s, t)), x)

    # full chained stage (transpconv -> concat -> conv0 -> conv1 -> seg)
    def chain(lres, skip):
        sp = [(wt, b3, w3[:, :, :, :Cout], b3, jnp.ones((Cout,), jnp.float32),
               jnp.zeros((Cout,), jnp.float32),
               jnp.zeros((3, 3, Cout, Cout), jnp.float32), b3,
               jnp.ones((Cout,), jnp.float32),
               jnp.zeros((Cout,), jnp.float32))]
        segp = [(jnp.zeros((Cout, 3), jnp.float32),
                 jnp.zeros((3,), jnp.float32))]
        return dt.decoder_chain_cm(lres, [skip], sp, segp,
                                   deep_supervision=True)

    lres = _rand(next(ks), (B, Cin, H // 2, W // 2))
    skip = _rand(next(ks), (B, Cin - Cout, H, W))
    gate("decoder_chain_cm[1stage]", chain, lres, skip)

    # --- native-layout (HWBC) decoder convs (round 4) ---
    from dinounet_tpu.ops import conv_hwbc_pallas as ch

    Bh = 8
    xh = _rand(next(ks), (H, W, Bh, Cout))   # (H, W, B, Ci)
    wh2 = _rand(next(ks), (3, 3, 2 * Cout, Cout), jnp.float32)
    sh_ = jnp.abs(_rand(next(ks), (Bh, 2 * Cout), jnp.float32)) + 0.5
    th_ = _rand(next(ks), (Bh, 2 * Cout), jnp.float32)
    gate("conv3x3_hwbc[2in,raw]",
         lambda a, a2: ch.conv3x3_hwbc(a, wh2, b3, x2=a2), xh, xh)
    wh1 = _rand(next(ks), (3, 3, Cout, Cout), jnp.float32)
    sh1 = jnp.abs(_rand(next(ks), (Bh, Cout), jnp.float32)) + 0.5
    th1 = _rand(next(ks), (Bh, Cout), jnp.float32)
    gate("conv3x3_hwbc[prologue]",
         lambda a: ch.conv3x3_hwbc(a, wh1, b3, prologue=(sh1, th1)), xh)
    del sh_, th_

    # --- dense+stats family (backbone/adapter junction shapes) ---
    N, D, F = 1024, 768, 3072
    h = _rand(next(ks), (8, N, F))
    wd = _rand(next(ks), (F, D))
    bd = _rand(next(ks), (D,), jnp.float32)
    res = _rand(next(ks), (8, N, D))
    gm = _rand(next(ks), (D,), jnp.float32)
    gate("dense_residual_stats[gelu]",
         lambda a: ds.dense_residual_stats(a, wd, bd, res, gm,
                                           apply_gelu=True), h)
    ht = _rand(next(ks), (8, D, N))
    wcm = _rand(next(ks), (D, D), jnp.float32)
    gate("dense_cm_residual_stats",
         lambda a: ds.dense_cm_residual_stats(a, wcm, bd, res, gm), ht)

    # --- int8 dense family (w8a8 serving kernels, dense_q8_pallas) ---
    from dinounet_tpu.ops import dense_q8_pallas as dq

    wf32 = wd.astype(jnp.float32)
    hx = _rand(next(ks), (8, N, D))
    w1 = _rand(next(ks), (D, F), jnp.float32)
    b1 = _rand(next(ks), (F,), jnp.float32)
    gate("dense_q8[fc1]", lambda a: dq.dense_q8(a, w1, b1), hx)
    gate("dense_q8_residual_stats[gelu]",
         lambda a: dq.dense_q8_residual_stats(a, wf32, bd, res, gm,
                                              prologue="gelu"), h)
    gate("dense_cm_q8_residual_stats",
         lambda a: dq.dense_cm_q8_residual_stats(a, wcm, bd, res, gm), ht)
    wq_k = _rand(next(ks), (D, 3 * D), jnp.float32)
    bq_k = _rand(next(ks), (3 * D,), jnp.float32)
    gate("qkv_q8_premapped[xla]",
         lambda a: dq.qkv_q8_premapped(a, wq_k, bq_k, 12, 64), hx)

    # --- attention family ---
    heads, dh = 12, 64
    q = _rand(next(ks), (8, 3, heads, N, dh))
    sin = _rand(next(ks), (N, dh), jnp.float32)
    cos = _rand(next(ks), (N, dh), jnp.float32)
    gate("fused_rope_attention_premapped",
         lambda qkv: ap.fused_rope_attention_premapped(qkv, sin, cos), q)
    q_dmaj = _rand(next(ks), (8, 3, heads, dh, N))
    gate("fused_rope_attention_premapped[dmaj]",
         lambda qkv: ap.fused_rope_attention_premapped_dmaj(qkv, sin, cos),
         q_dmaj)

    # --- MSDA family (premapped + fused prep), fwd and vjp ---
    Lq, P = 1029, 4
    shapes = ((32, 32), (16, 16), (8, 8))
    Lv = sum(a * b for a, b in shapes)
    heads_m, dh_m = 16, 48
    v = _rand(next(ks), (2, heads_m, dh_m, Lv))
    Lq_pad = 1152  # 384-aligned
    xs = _rand(next(ks), (2, heads_m, len(shapes) * P, Lq_pad), jnp.float32)
    ys = _rand(next(ks), (2, heads_m, len(shapes) * P, Lq_pad), jnp.float32)
    aw = jnp.abs(_rand(next(ks), (2, heads_m, len(shapes) * P, Lq_pad),
                       jnp.float32))
    gate("msda_premapped[fwd]",
         lambda a: mp.ms_deform_attn_pallas_premapped(a, shapes, xs, ys, aw),
         v)
    gate("msda_premapped[vjp]",
         lambda a: jax.grad(lambda b: mp.ms_deform_attn_pallas_premapped(
             b, shapes, xs, ys, aw).astype(jnp.float32).sum())(a), v)
    off = _rand(next(ks), (2, heads_m, len(shapes) * P * 2, Lq_pad))
    logits = _rand(next(ks), (2, heads_m, len(shapes) * P, Lq_pad))
    base = _rand(next(ks), (len(shapes) * P * 2, Lq_pad), jnp.float32)
    gate("msda_premapped_fused[fwd]",
         lambda a: mp.ms_deform_attn_pallas_premapped_fused(
             a, shapes, off, logits, base), v)
    packed = jnp.concatenate([off, logits], axis=2)
    gate("msda_premapped_fused_merged[fwd]",
         lambda a: mp.ms_deform_attn_pallas_premapped_fused_merged(
             a, shapes, packed, base), v)

    from dinounet_tpu.ops import dense_q8_pallas as q8

    xq = _rand(next(ks), (2, 256, 128))
    kq = _rand(next(ks), (128, 384), jnp.float32)
    bq = _rand(next(ks), (384,), jnp.float32)
    gate("qkv_q8_dmaj_fused[fwd]",
         lambda a: q8.qkv_q8_dmaj_fused(a, kq, bq, 2, 64), xq)


def gate_forward(model_name="dinounet_b", batch=8):
    from bench import build

    fwd, variables, x = build(batch, model_name)
    gate(f"tile_forward[{model_name},b{batch}]",
         lambda v, a: fwd(v, a), variables, x)


def gate_forward_int8(model_name="dinounet_b", batch=8):
    """The int8 serving mode's full tile forward (w8a8 fused chain)."""
    os.environ["DINOUNET_TPU_VIT_INT8"] = "1"
    try:
        from bench import build

        fwd, variables, x = build(batch, model_name)
        gate(f"tile_forward[{model_name},b{batch},int8]",
             lambda v, a: fwd(v, a), variables, x)
    finally:
        os.environ.pop("DINOUNET_TPU_VIT_INT8", None)


def gate_train_step():
    """Compile the dinounet_s train step (fwd+bwd through every kernel VJP)."""
    from tests.helpers import tiny_train_step_for_gate  # optional helper
    fn, args = tiny_train_step_for_gate()
    gate("train_step[dinounet_s-tiny]", fn, *args)


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    gate_kernels()
    if "--quick" not in sys.argv:
        gate_forward()
        gate_forward_int8()
    if "--train" in sys.argv:
        try:
            gate_train_step()
        except ImportError:
            print("SKIP train_step gate (helper not present)", flush=True)
    if FAILURES:
        print(f"FAILURES: {FAILURES}", flush=True)
        return 1
    print("ALL PASS", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
