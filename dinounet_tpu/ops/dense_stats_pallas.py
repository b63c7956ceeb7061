"""Fused dense + LayerScale residual + LayerNorm row-stats — Pallas TPU kernel.

Why this exists: in the frozen DINOv3 backbone the fc2/proj projections are
matmuls whose consumers are a LayerScale residual add and the *next*
LayerNorm's statistics. XLA fuses all of that into one `convert_reduce_fusion`
per matmul — but the fused reduce epilogue routes the row statistics through
scratch (S(1)) memory and throttles the matmul: the round-2 trace shows fc2 at
0.545 ms/block vs 0.214 ms for the same-FLOPs fc1 (87-95 % MFU), i.e. the
epilogue costs ~2.5x the matmul itself. Defusing the stats is also a measured
loss (BASELINE.md: 131.6 -> 129.1 p/s) because then the activation is read
twice. This kernel computes, in one VMEM-resident pass per row block:

    y    = act(h) @ W + b          (MXU, f32 accumulation, bf16 rounding)
    out  = res + LayerScale * y    (the block's residual stream)
    mu   = mean(out)               (over the feature dim, fp32 — the *next*
    var  = E[out^2] - mu^2          LayerNorm's statistics)

so HBM sees h once and out once, and the statistics never leave registers
until the tiny (rows, 1) stores. The LayerNorm *apply* stays in XLA, where it
fuses into the next matmul's prologue (models/vit.py::LayerNormFp32 accepts
precomputed stats).

Numerics are kept identical to the unfused path (and to the reference's
torch.autocast(bf16) evaluation, ref dinov3/layers/block.py:83-125 +
mlp/attention projections): the matmul accumulates f32 and rounds to the
compute dtype, bias/LayerScale/residual adds happen in the compute dtype, and
the statistics are taken over the fp32 cast of the *rounded* residual output —
exactly what LayerNormFp32 would compute from the stored tensor.

The backbone is frozen on every DinoUNet path, but jax.grad linearizes the
whole graph before pruning, so the op carries a custom VJP that differentiates
the pure-jnp reference formulation (exact; dead-code-eliminated on frozen
paths) — the same pattern as ops/attention_pallas.py.
"""

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INV_SQRT2 = 1.0 / math.sqrt(2.0)


def _gelu_exact(hf):
    """erf-based GELU on an fp32 tensor (matches nn.gelu(approximate=False))."""
    return hf * 0.5 * (1.0 + jax.lax.erf(hf * _INV_SQRT2))


def _erf_as7126(x):
    """erf via Abramowitz-Stegun 7.1.26 (max abs error 1.5e-7): Mosaic has no
    erf primitive, but this needs only exp/divide, both of which lower. The
    error is ~5 bf16-ulps below the output rounding, so the kernel's GELU is
    bit-comparable to nn.gelu(approximate=False)."""
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.sign(x) * y


def _gelu_kernel(hf):
    """In-kernel GELU (fp32): exact-form GELU on the A&S erf."""
    return hf * 0.5 * (1.0 + _erf_as7126(hf * _INV_SQRT2))


def _kernel(apply_gelu, gelu_kblk, h_ref, w_ref, b_ref, res_ref, g_ref,
            o_ref, mu_ref, var_ref):
    """One program = one (batch, row-block). h: (1, R, K); w: (K, D);
    b/g: (1, D); res/o: (1, R, D); mu/var: (1, R, 1).

    gelu_kblk > 0 unrolls the GELU+matmul over K-chunks of that width so
    Mosaic's scheduler can software-pipeline chunk j+1's erf/exp VPU work
    against chunk j's MXU contraction (the monolithic form serializes them:
    0.369 ms vs the 0.197 ms matmul-only ideal in the round-3 trace). The
    f32 accumulator regroups chunk partial sums, so the bf16 output can
    differ from the monolithic kernel by 1 ulp on rare elements — opt-in via
    DINOUNET_TPU_MLP_GELU=chunked."""
    if apply_gelu and gelu_kblk:
        acc = None
        for k0 in range(0, h_ref.shape[2], gelu_kblk):
            hc = h_ref[0, :, k0:k0 + gelu_kblk]
            hc = _gelu_kernel(hc.astype(jnp.float32)).astype(hc.dtype)
            p = jax.lax.dot_general(
                hc, w_ref[k0:k0 + gelu_kblk, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = p if acc is None else acc + p
    else:
        h = h_ref[0]
        if apply_gelu:
            h = _gelu_kernel(h.astype(jnp.float32)).astype(h.dtype)
        acc = jax.lax.dot_general(
            h, w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    y = acc.astype(o_ref.dtype) + b_ref[...].astype(o_ref.dtype)
    out = res_ref[0] + y * g_ref[...].astype(o_ref.dtype)
    o_ref[0] = out
    # read the *stored* value back so the statistics see the bf16-rounded
    # tensor (compilers may elide intermediate bf16 rounding in the live
    # expression, which would make stats diverge from what LayerNormFp32
    # would compute from the saved activation)
    of = o_ref[0].astype(jnp.float32)
    mu = jnp.mean(of, axis=-1, keepdims=True)
    m2 = jnp.mean(of * of, axis=-1, keepdims=True)
    mu_ref[0] = mu
    var_ref[0] = jnp.maximum(m2 - mu * mu, 0.0)


def _env_cap(name: str, default: int = 384) -> int:
    """Block-size cap tuning knob (read per trace; bench tiers run in their
    own subprocess so a sweep sets the env before spawning)."""
    try:
        return max(8, int(os.environ.get(name, default)))
    except ValueError:
        return default


def _pick_k_chunk(K: int, cap: int) -> int:
    """Largest multiple of 128 that divides K and is <= cap (lane-tile-aligned
    static slices of the K dim); 0 when none exists (falls back to the
    monolithic kernel)."""
    best = 0
    for c in range(128, cap + 1, 128):
        if K % c == 0:
            best = c
    return best


def _pick_row_block(n: int, cap: int = 384) -> int:
    """Row-block size: a multiple of 8 (Mosaic's second-minor block
    constraint), sized so ceil(n/blk) blocks cover n with minimal padding
    (1029 tokens -> 3 blocks of 344; the ragged tail rows are masked by
    Pallas on store, and the stats are per-row so padding never leaks)."""
    n_blocks = -(-n // cap)
    per_block = -(-n // n_blocks)
    return -(-per_block // 8) * 8


def _reference(h, w, b, res, gamma, apply_gelu):
    """Pure-jnp formulation with the same rounding points — numerical source
    for the custom VJP and the CPU/interpret cross-check."""
    if apply_gelu:
        h = _gelu_exact(h.astype(jnp.float32)).astype(h.dtype)
    acc = jax.lax.dot_general(
        h, w.astype(h.dtype), (((h.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    y = acc.astype(h.dtype) + b.astype(h.dtype)
    out = res + y * gamma.astype(h.dtype)
    of = out.astype(jnp.float32)
    mu = jnp.mean(of, axis=-1)
    var = jnp.maximum(jnp.mean(of * of, axis=-1) - mu * mu, 0.0)
    return out, mu, var


def dense_residual_stats(h, w, b, res, gamma, apply_gelu: bool = False,
                         interpret: bool = False):
    """out = res + gamma * (act(h) @ w + b), plus next-LN row statistics.

    h: (B, N, K) compute-dtype activations (post-GELU, or pre-GELU with
    apply_gelu=True); w: (K, D) f32 params; b: (D,) f32 (pass zeros for
    bias-free layers); res: (B, N, D); gamma: (D,) f32 LayerScale.
    Returns (out (B, N, D) in h.dtype, mean (B, N) f32, var (B, N) f32).
    """
    return _dense_residual_stats(h, w, b, res, gamma, apply_gelu, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _dense_residual_stats(h, w, b, res, gamma, apply_gelu, interpret):
    return _forward(h, w, b, res, gamma, apply_gelu, interpret)


def _vjp_fwd(h, w, b, res, gamma, apply_gelu, interpret):
    out = _forward(h, w, b, res, gamma, apply_gelu, interpret)
    return out, (h, w, b, res, gamma)


def _vjp_bwd(apply_gelu, interpret, saved, cts):
    h, w, b, res, gamma = saved
    _, pullback = jax.vjp(
        lambda *a: _reference(*a, apply_gelu), h, w, b, res, gamma)
    return pullback(cts)


_dense_residual_stats.defvjp(_vjp_fwd, _vjp_bwd)


def _forward(h, w, b, res, gamma, apply_gelu, interpret):
    B, N, K = h.shape
    D = w.shape[1]
    blk = _pick_row_block(N, _env_cap("DINOUNET_TPU_DENSE_ROWS"))
    kblk = 0
    if apply_gelu:
        from dinounet_tpu.configuration import mlp_gelu_impl

        if mlp_gelu_impl() == "chunked":
            kblk = _pick_k_chunk(K, _env_cap("DINOUNET_TPU_GELU_KBLK", 384))
    kern = functools.partial(_kernel, apply_gelu, kblk)
    wc = w.astype(h.dtype)
    out, mu, var = pl.pallas_call(
        kern,
        grid=(B, -(-N // blk)),
        in_specs=[
            pl.BlockSpec((1, blk, K), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, D), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk, D), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, blk, D), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, N, D), h.dtype),
            jax.ShapeDtypeStruct((B, N, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, N, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * K * D,
            bytes_accessed=h.dtype.itemsize * B * N * (K + 2 * D),
            transcendentals=B * N * K if apply_gelu else 0,
        ),
        interpret=interpret,
    )(h, wc, b.reshape(1, D), res, gamma.reshape(1, D))
    return out, mu[..., 0], var[..., 0]


def _cm_kernel(h_ref, w_ref, b_ref, res_ref, g_ref, o_ref, mu_ref, var_ref):
    """Channel-major lhs variant: one program = one (batch, token-block).
    h: (1, K, R) — K channel-major rows, R tokens in lanes; w: (K, D);
    b/g: (1, D); res/o: (1, R, D); mu/var: (1, R, 1)."""
    acc = jax.lax.dot_general(
        h_ref[0], w_ref[...], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (R, D)
    y = acc.astype(o_ref.dtype) + b_ref[...].astype(o_ref.dtype)
    out = res_ref[0] + y * g_ref[...].astype(o_ref.dtype)
    o_ref[0] = out
    of = o_ref[0].astype(jnp.float32)
    mu = jnp.mean(of, axis=-1, keepdims=True)
    m2 = jnp.mean(of * of, axis=-1, keepdims=True)
    mu_ref[0] = mu
    var_ref[0] = jnp.maximum(m2 - mu * mu, 0.0)


def _pick_lane_block(n: int, cap: int = 384) -> int:
    """Token-block size for the channel-major variant, where tokens are the
    *lane* dimension of the input block — must be a multiple of 128."""
    n_blocks = -(-n // cap)
    per_block = -(-n // n_blocks)
    return -(-per_block // 128) * 128


def _cm_reference(h_t, w, b, res, gamma):
    """Pure-jnp formulation of the channel-major op with identical rounding
    points — numerical source for the custom VJP and CPU cross-checks.
    h_t: (B, K, N); out[b,n,d] = res + gamma*(sum_k h_t[b,k,n] w[k,d] + b[d])."""
    acc = jax.lax.dot_general(
        h_t, w.astype(h_t.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (B, N, D)
    y = acc.astype(h_t.dtype) + b.astype(h_t.dtype)
    out = res + y * gamma.astype(h_t.dtype)
    of = out.astype(jnp.float32)
    mu = jnp.mean(of, axis=-1)
    var = jnp.maximum(jnp.mean(of * of, axis=-1) - mu * mu, 0.0)
    return out, mu, var


def dense_cm_residual_stats(h_t, w, b, res, gamma, interpret: bool = False):
    """out = res + gamma * (h_t^T @ w + b), plus next-LN row statistics, where
    the activations arrive channel-major: h_t (B, K, N) with tokens in lanes.

    This is the residual-junction form of the MSDA output projection (kernel
    emits (B, M, D, N) natively) and of the premapped attention output
    projection (ops/attention_pallas.py emits (B, M, Dh, N)): fusing the
    projection, LayerScale residual add, and the next LayerNorm's statistics
    into one pass removes the separate (B, N, D) relayout+residual+stats
    reads of the token stream. w: (K, D) f32 params; b: (D,) f32; res:
    (B, N, D) compute dtype; gamma: (D,) f32 LayerScale (pass ones for
    gamma-free junctions). Returns (out (B, N, D) in res.dtype, mean (B, N)
    f32, var (B, N) f32).
    """
    return _dense_cm_residual_stats(h_t, w, b, res, gamma, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _dense_cm_residual_stats(h_t, w, b, res, gamma, interpret):
    return _cm_forward(h_t, w, b, res, gamma, interpret)


def _cm_vjp_fwd(h_t, w, b, res, gamma, interpret):
    return _cm_forward(h_t, w, b, res, gamma, interpret), (h_t, w, b, res, gamma)


def _cm_vjp_bwd(interpret, saved, cts):
    h_t, w, b, res, gamma = saved
    _, pullback = jax.vjp(_cm_reference, h_t, w, b, res, gamma)
    return pullback(cts)


_dense_cm_residual_stats.defvjp(_cm_vjp_fwd, _cm_vjp_bwd)


def _cm_forward(h_t, w, b, res, gamma, interpret):
    B, K, N = h_t.shape
    D = w.shape[1]
    blk = _pick_lane_block(N, _env_cap("DINOUNET_TPU_DENSE_LANES"))
    wc = w.astype(h_t.dtype)
    out, mu, var = pl.pallas_call(
        _cm_kernel,
        grid=(B, -(-N // blk)),
        in_specs=[
            pl.BlockSpec((1, K, blk), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, D), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk, D), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, blk, D), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, N, D), res.dtype),
            jax.ShapeDtypeStruct((B, N, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, N, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * K * D,
            bytes_accessed=h_t.dtype.itemsize * B * N * (K + 2 * D),
            transcendentals=0,
        ),
        interpret=interpret,
    )(h_t, wc, b.reshape(1, D), res, gamma.reshape(1, D))
    return out, mu[..., 0], var[..., 0]


def row_stats(x):
    """LayerNormFp32-compatible (mean, var) over the last dim of x, in fp32 —
    the entry statistics for the stats-threaded block chain (XLA pass; one
    small read of the token tensor per forward)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1)
    var = jnp.maximum(jnp.mean(xf * xf, axis=-1) - mu * mu, 0.0)
    return mu, var
