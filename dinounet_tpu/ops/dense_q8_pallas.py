"""int8 fused dense kernels for the frozen backbone's serving mode.

Why this exists: the v5e MXU runs int8xint8->int32 at twice the bf16 rate, and
a kernel-vs-kernel probe at backbone shapes (round 3) measured a VMEM-resident
int8 dot 1.72x faster than the same-tiled bf16 dot — still 1.47x with the
dynamic activation quantization performed in-kernel. The original int8 mode
(models/vit.py::QuantDense) loses almost all of that (+2.4% end-to-end,
BASELINE.md) because the per-token quantize and f32 rescale run as separate
XLA passes AND the mode disables the fused dense+residual+LN-stats chain
entirely. These kernels put the w8a8 dynamic quantization inside the fused
kernels so the int8 serving mode keeps the stats-threaded block chain
(ops/dense_stats_pallas.py) and pays for quantization in VMEM, not HBM.

Quantization scheme (identical to QuantDense, so the two int8 paths agree):
per-output-channel symmetric int8 weights (scale = max|w|/127, XLA-side — the
params stay f32 in the checkpoint), per-token symmetric int8 activations
(scale = max|x_row|/127), int8xint8->int32 MXU dot, f32 dequant
`acc * a_scale * w_scale + bias`.

Layout rules (hard-won on hardware, tools/probe_interleave.py): reductions
over the LANE axis produce (rows, 1) sublane-shaped scales that broadcast
freely, so the row-major kernels quantize in-kernel. The channel-major
projection variant would need a lane->sublane transpose of its per-token
scales, which Mosaic does not lower — so its activation quantization runs
XLA-side (one fused elementwise pass) and the kernel consumes the int8
tensor directly, which also halves the activation DMA bytes.

The backbone is frozen on every DinoUNet path, but jax.grad linearizes the
whole graph before pruning, so each op carries a custom VJP differentiating
the pure-jnp reference formulation (straight-through on the rounding, exact
elsewhere; dead-code-eliminated on frozen paths).

ref semantics: these serve the qkv/proj/fc1/fc2 projections of
dinov3/layers/{attention.py:86-118, block.py:83-125} under the frozen-backbone
autocast evaluation; quantization is our TPU serving addition (the reference
has no int8 path).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dinounet_tpu.ops.dense_stats_pallas import (
    _gelu_exact,
    _gelu_kernel,
    _pick_lane_block,
)


def quantize_weight(w):
    """Per-output-channel symmetric int8 quantization of a (K, D) f32 kernel.

    Returns (wq int8 (K, D), w_scale f32 (D,)). Runs XLA-side once per call —
    two small passes over the frozen weights (~0.4 ms total for all of ViT-B's
    48 linears, vs the ~5 ms the int8 dots save)."""
    ws = jnp.maximum(jnp.max(jnp.abs(w), axis=0), 1e-12) / 127.0
    wq = jnp.clip(jnp.round(w / ws[None, :]), -127, 127).astype(jnp.int8)
    return wq, ws


def quantize_act_cm(h_t):
    """Per-token symmetric int8 quantization of a channel-major (B, K, N)
    activation, XLA-side (see module docstring for why not in-kernel).

    Returns (xq int8 (B, K, N), a_col f32 (B, N, 1)) — the scale comes back
    token-major so the kernel's (R, D) dequant broadcast is sublane-shaped."""
    hf = h_t.astype(jnp.float32)
    a = jnp.maximum(jnp.max(jnp.abs(hf), axis=1), 1e-12) / 127.0  # (B, N)
    xq = jnp.clip(jnp.round(hf / a[:, None, :]), -127, 127).astype(jnp.int8)
    return xq, a[..., None]


def _quant_rows(hf):
    """In-kernel per-row dynamic quantization of an f32 (R, K) tile.

    The max-reduce is over the lane axis, so the scale lands in the natural
    (R, 1) sublane layout — no forbidden lane->sublane relayout."""
    a = jnp.maximum(jnp.max(jnp.abs(hf), axis=-1, keepdims=True), 1e-12) / 127.0
    q = jnp.clip(jnp.round(hf / a), -127, 127).astype(jnp.int8)
    return q, a


def _prologue(kind, h, out_dtype):
    """f32 activation prologue with the unfused path's bf16 rounding points
    (QuantDense quantizes from the bf16-rounded tensor; reproducing the
    rounding keeps the fused and unfused int8 paths bit-comparable)."""
    hf = h.astype(jnp.float32)
    if kind == "gelu":
        hf = _gelu_kernel(hf).astype(out_dtype).astype(jnp.float32)
    return hf


def _q8_kernel(prologue, h_ref, w_ref, ws_ref, b_ref, o_ref):
    """Plain variant (fc1): one program = one (batch, row-block).
    h: (1, R, K) compute dtype; w: (K, D) int8; ws/b: (1, D) f32;
    o: (1, R, D) compute dtype."""
    hf = _prologue(prologue, h_ref[0], o_ref.dtype)
    q, a = _quant_rows(hf)
    acc = jax.lax.dot_general(
        q, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * a * ws_ref[...] + b_ref[...]
    o_ref[0] = y.astype(o_ref.dtype)


def _q8_stats_kernel(prologue, h_ref, w_ref, ws_ref, b_ref, res_ref, g_ref,
                     o_ref, mu_ref, var_ref):
    """Residual+stats variant (fc2): adds the LayerScale residual and the
    next LayerNorm's row statistics, exactly as
    dense_stats_pallas._kernel does for the bf16 path."""
    hf = _prologue(prologue, h_ref[0], o_ref.dtype)
    q, a = _quant_rows(hf)
    acc = jax.lax.dot_general(
        q, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * a * ws_ref[...] + b_ref[...]
    out = res_ref[0] + y.astype(o_ref.dtype) * g_ref[...].astype(o_ref.dtype)
    o_ref[0] = out
    # stats from the stored bf16-rounded tensor (see dense_stats_pallas)
    of = o_ref[0].astype(jnp.float32)
    mu = jnp.mean(of, axis=-1, keepdims=True)
    m2 = jnp.mean(of * of, axis=-1, keepdims=True)
    mu_ref[0] = mu
    var_ref[0] = jnp.maximum(m2 - mu * mu, 0.0)


def _cm_q8_kernel(xq_ref, a_ref, w_ref, ws_ref, b_ref, res_ref, g_ref,
                  o_ref, mu_ref, var_ref):
    """Channel-major variant (premapped attention projection): the activation
    arrives pre-quantized int8 (B, K, N) with tokens in lanes (half the DMA
    bytes of the bf16 kernel), the per-token scale arrives token-major
    (1, R, 1). One program = one (batch, token-block)."""
    acc = jax.lax.dot_general(
        xq_ref[0], w_ref[...], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)  # (R, D)
    y = acc.astype(jnp.float32) * a_ref[0] * ws_ref[...] + b_ref[...]
    out = res_ref[0] + y.astype(o_ref.dtype) * g_ref[...].astype(o_ref.dtype)
    o_ref[0] = out
    of = o_ref[0].astype(jnp.float32)
    mu = jnp.mean(of, axis=-1, keepdims=True)
    m2 = jnp.mean(of * of, axis=-1, keepdims=True)
    mu_ref[0] = mu
    var_ref[0] = jnp.maximum(m2 - mu * mu, 0.0)


def _pick_row_block32(n: int, cap: int = 384) -> int:
    """Row-block size rounded to 32 (the int8 operand's native sublane tile;
    the bf16 kernels round to 8)."""
    n_blocks = -(-n // cap)
    per_block = -(-n // n_blocks)
    return -(-per_block // 32) * 32


# ---------------------------------------------------------------------------
# reference formulations (jnp): numerical source for the custom VJPs and the
# CPU/interpret cross-checks. Same rounding points as the kernels.
# ---------------------------------------------------------------------------

def _ref_quant_rows(hf):
    a = jnp.maximum(jnp.max(jnp.abs(hf), axis=-1, keepdims=True), 1e-12) / 127.0
    q = jnp.clip(jnp.round(hf / a), -127, 127).astype(jnp.int8)
    return q, a


def _ref_prologue(kind, h):
    hf = h.astype(jnp.float32)
    if kind == "gelu":
        hf = _gelu_exact(hf).astype(h.dtype).astype(jnp.float32)
    return hf


def _reference_q8(h, w, b, prologue):
    wq, ws = quantize_weight(w)
    hf = _ref_prologue(prologue, h)
    q, a = _ref_quant_rows(hf)
    acc = jax.lax.dot_general(
        q, wq, (((h.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * a * ws + b
    return y.astype(h.dtype)


def _reference_q8_stats(h, w, b, res, gamma, prologue):
    wq, ws = quantize_weight(w)
    hf = _ref_prologue(prologue, h)
    q, a = _ref_quant_rows(hf)
    acc = jax.lax.dot_general(
        q, wq, (((h.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * a * ws + b
    out = res + y.astype(res.dtype) * gamma.astype(res.dtype)
    of = out.astype(jnp.float32)
    mu = jnp.mean(of, axis=-1)
    var = jnp.maximum(jnp.mean(of * of, axis=-1) - mu * mu, 0.0)
    return out, mu, var


def _reference_cm_q8_stats(h_t, w, b, res, gamma):
    wq, ws = quantize_weight(w)
    xq, a_col = quantize_act_cm(h_t)
    acc = jax.lax.dot_general(
        xq, wq, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)  # (B, N, D)
    y = acc.astype(jnp.float32) * a_col * ws + b
    out = res + y.astype(res.dtype) * gamma.astype(res.dtype)
    of = out.astype(jnp.float32)
    mu = jnp.mean(of, axis=-1)
    var = jnp.maximum(jnp.mean(of * of, axis=-1) - mu * mu, 0.0)
    return out, mu, var


# ---------------------------------------------------------------------------
# public ops
# ---------------------------------------------------------------------------

def dense_q8(h, w, b, prologue: str = "none", interpret: bool = False):
    """y = act(h) @ Wq * scales + b with in-kernel w8a8 dynamic quantization.

    h: (B, N, K) compute-dtype activations; w: (K, D) f32 params (quantized
    per-output-channel XLA-side); b: (D,) f32; prologue in {"none", "gelu"}.
    Returns (B, N, D) in h.dtype. Serves fc1 in the int8 fused block chain.
    """
    return _dense_q8(h, w, b, prologue, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _dense_q8(h, w, b, prologue, interpret):
    return _q8_forward(h, w, b, prologue, interpret)


def _q8_vjp_fwd(h, w, b, prologue, interpret):
    return _q8_forward(h, w, b, prologue, interpret), (h, w, b)


def _q8_vjp_bwd(prologue, interpret, saved, ct):
    h, w, b = saved
    _, pullback = jax.vjp(lambda *a: _reference_q8(*a, prologue), h, w, b)
    return pullback(ct)


_dense_q8.defvjp(_q8_vjp_fwd, _q8_vjp_bwd)


def _q8_forward(h, w, b, prologue, interpret):
    B, N, K = h.shape
    D = w.shape[1]
    blk = _pick_row_block32(N)
    wq, ws = quantize_weight(w)
    out = pl.pallas_call(
        functools.partial(_q8_kernel, prologue),
        grid=(B, -(-N // blk)),
        in_specs=[
            pl.BlockSpec((1, blk, K), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, D), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, blk, D), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, D), h.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * K * D,
            bytes_accessed=h.dtype.itemsize * B * N * (K + D) + K * D,
            transcendentals=B * N * K if prologue == "gelu" else 0,
        ),
        interpret=interpret,
    )(h, wq, ws.reshape(1, D), b.reshape(1, D))
    return out


def dense_q8_residual_stats(h, w, b, res, gamma, prologue: str = "none",
                            interpret: bool = False):
    """out = res + gamma * (act(h) @ Wq * scales + b), plus next-LN row stats,
    with in-kernel w8a8 dynamic quantization — the int8 twin of
    dense_stats_pallas.dense_residual_stats. Serves fc2 (prologue="gelu") in
    the int8 fused block chain. Returns (out (B,N,D), mean (B,N), var (B,N)).
    """
    return _dense_q8_residual_stats(h, w, b, res, gamma, prologue, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _dense_q8_residual_stats(h, w, b, res, gamma, prologue, interpret):
    return _q8_stats_forward(h, w, b, res, gamma, prologue, interpret)


def _q8s_vjp_fwd(h, w, b, res, gamma, prologue, interpret):
    out = _q8_stats_forward(h, w, b, res, gamma, prologue, interpret)
    return out, (h, w, b, res, gamma)


def _q8s_vjp_bwd(prologue, interpret, saved, cts):
    h, w, b, res, gamma = saved
    _, pullback = jax.vjp(
        lambda *a: _reference_q8_stats(*a, prologue), h, w, b, res, gamma)
    return pullback(cts)


_dense_q8_residual_stats.defvjp(_q8s_vjp_fwd, _q8s_vjp_bwd)


def _q8_stats_forward(h, w, b, res, gamma, prologue, interpret):
    B, N, K = h.shape
    D = w.shape[1]
    blk = _pick_row_block32(N)
    wq, ws = quantize_weight(w)
    out, mu, var = pl.pallas_call(
        functools.partial(_q8_stats_kernel, prologue),
        grid=(B, -(-N // blk)),
        in_specs=[
            pl.BlockSpec((1, blk, K), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, D), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i, j: (0, 0),
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
            bytes_accessed=h.dtype.itemsize * B * N * (K + 2 * D) + K * D,
            transcendentals=B * N * K if prologue == "gelu" else 0,
        ),
        interpret=interpret,
    )(h, wq, ws.reshape(1, D), b.reshape(1, D), res,
      gamma.reshape(1, D))
    return out, mu[..., 0], var[..., 0]


def dense_cm_q8_residual_stats(h_t, w, b, res, gamma, interpret: bool = False):
    """Channel-major int8 twin of dense_cm_residual_stats: the activation
    arrives channel-major (B, K, N) from the premapped attention kernel, is
    quantized per-token XLA-side (the in-kernel scale would need a
    lane->sublane transpose Mosaic rejects), and the kernel consumes the int8
    tensor (half the DMA bytes). Returns (out (B,N,D), mean (B,N), var (B,N)).
    """
    return _dense_cm_q8_residual_stats(h_t, w, b, res, gamma, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _dense_cm_q8_residual_stats(h_t, w, b, res, gamma, interpret):
    return _cm_q8_forward(h_t, w, b, res, gamma, interpret)


def _cmq8_vjp_fwd(h_t, w, b, res, gamma, interpret):
    out = _cm_q8_forward(h_t, w, b, res, gamma, interpret)
    return out, (h_t, w, b, res, gamma)


def _cmq8_vjp_bwd(interpret, saved, cts):
    h_t, w, b, res, gamma = saved
    _, pullback = jax.vjp(_reference_cm_q8_stats, h_t, w, b, res, gamma)
    return pullback(cts)


_dense_cm_q8_residual_stats.defvjp(_cmq8_vjp_fwd, _cmq8_vjp_bwd)


def _cm_q8_forward(h_t, w, b, res, gamma, interpret):
    B, K, N = h_t.shape
    D = w.shape[1]
    blk = _pick_lane_block(N)
    wq, ws = quantize_weight(w)
    xq, a_col = quantize_act_cm(h_t)
    out, mu, var = pl.pallas_call(
        _cm_q8_kernel,
        grid=(B, -(-N // blk)),
        in_specs=[
            pl.BlockSpec((1, K, blk), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, D), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i, j: (0, 0),
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
            bytes_accessed=B * N * (K + 2 * D * res.dtype.itemsize) + K * D,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xq, a_col, wq, ws.reshape(1, D), b.reshape(1, D), res,
      gamma.reshape(1, D))
    return out, mu[..., 0], var[..., 0]


def qkv_q8_premapped(x, kernel, bias, n_heads: int, head_dim: int):
    """int8 premapped QKV projection (XLA): per-token dynamic quantization of
    the LN-applied tokens, int8 einsum straight into the attention kernel's
    (B, 3, M, N, Dh) per-head layout, f32 rescale, compute-dtype output.

    x: (B, N, C) compute dtype; kernel: (C, 3C) f32; bias: (3C,) f32 or None.
    XLA folds the transposed write into the dot as in the bf16 premapped path;
    the int8 dot rides the MXU's double-rate path.
    """
    B, N, C = x.shape
    M, Dh = n_heads, head_dim
    xf = x.astype(jnp.float32)
    a = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True),
                    1e-12) / 127.0  # (B, N, 1)
    xq = jnp.clip(jnp.round(xf / a), -127, 127).astype(jnp.int8)
    wq, ws = quantize_weight(kernel)  # (C, 3C) int8, (3C,) f32
    acc = jnp.einsum("bnc,cpmd->bpmnd", xq, wq.reshape(C, 3, M, Dh),
                     preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * a[:, None, None, :, :] \
        * ws.reshape(1, 3, M, 1, Dh)
    if bias is not None:
        y = y + bias.reshape(1, 3, M, 1, Dh)
    return y.astype(x.dtype)


def _qkv_q8_dmaj_kernel(w_ref, x_ref, ws_ref, b_ref, o_ref, xq_ref, a_ref):
    """Fused int8 dmaj qkv: one program = one (batch, output-row block).

    x arrives channel-major (1, C, N) bf16 (tokens in lanes — the dmaj
    layout's natural operand); on the first row-block the program quantizes
    it per-token into VMEM scratch (the C-axis max is a sublane reduce, so
    the scale lands lane-shaped (1, N) and broadcasts directly over the
    (Jblk, N) accumulator — no forbidden lane->sublane relayout). Every
    row-block then runs the int8 dot and the f32 rescale + bias in VMEM.
    This removes the two XLA passes the round-4/5 traces charged to the
    int8 qkv: the standalone per-token quantize and — much bigger — the
    int32->f32 rescale pass over the (B, 3, M, Dh, N) accumulator
    (~76 MB/block for ViT-B)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        xf = x_ref[0].astype(jnp.float32)  # (C, N)
        a = jnp.maximum(jnp.max(jnp.abs(xf), axis=0, keepdims=True),
                        1e-12) / 127.0  # (1, N) lanes
        a_ref[...] = a
        xq_ref[...] = jnp.clip(jnp.round(xf / a), -127, 127).astype(jnp.int8)

    acc = jax.lax.dot_general(
        w_ref[...], xq_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)  # (Jblk, N)
    # same multiply order as qkv_q8_premapped_dmaj: (acc * a) * ws + bias
    y = acc.astype(jnp.float32) * a_ref[...] * ws_ref[...] + b_ref[...]
    o_ref[0] = y.astype(o_ref.dtype)


def qkv_q8_dmaj_fused(x, kernel, bias, n_heads: int, head_dim: int,
                      interpret: bool = False):
    """Pallas twin of qkv_q8_premapped_dmaj: per-token dynamic quantization,
    int8 MXU dot, and f32 rescale all in VMEM (same rounding points and
    multiply order — identical int8 tensors, f32 rescale agrees to ulp
    level). x: (B, N, C) compute dtype;
    kernel (C, 3C) f32; bias (3C,) f32 or None. Returns (B, 3, M, Dh, N).

    The only XLA-side passes left are the (B, N, C)->(B, C, N) operand
    transpose (12.6 MB for ViT-B, and XLA fuses the producing LN apply into
    it) and the frozen-weight quantize."""
    return _qkv_q8_dmaj_fused(x, kernel, bias, n_heads, head_dim, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _qkv_q8_dmaj_fused(x, kernel, bias, n_heads, head_dim, interpret):
    return _qkv_q8_dmaj_forward(x, kernel, bias, n_heads, head_dim, interpret)


def _qkv_dmaj_vjp_fwd(x, kernel, bias, n_heads, head_dim, interpret):
    out = _qkv_q8_dmaj_forward(x, kernel, bias, n_heads, head_dim, interpret)
    return out, (x, kernel, bias)


def _qkv_dmaj_vjp_bwd(n_heads, head_dim, interpret, saved, ct):
    x, kernel, bias = saved
    if bias is None:
        _, pullback = jax.vjp(
            lambda x_, k_: qkv_q8_premapped_dmaj(x_, k_, None, n_heads,
                                                 head_dim), x, kernel)
        return pullback(ct) + (None,)
    _, pullback = jax.vjp(
        lambda x_, k_, b_: qkv_q8_premapped_dmaj(x_, k_, b_, n_heads,
                                                 head_dim), x, kernel, bias)
    return pullback(ct)


_qkv_q8_dmaj_fused.defvjp(_qkv_dmaj_vjp_fwd, _qkv_dmaj_vjp_bwd)


def _qkv_q8_dmaj_forward(x, kernel, bias, n_heads, head_dim, interpret):
    B, N, C = x.shape
    M, Dh = n_heads, head_dim
    D3 = kernel.shape[1]
    assert D3 == 3 * M * Dh, (D3, M, Dh)
    wq, ws = quantize_weight(kernel)  # (C, 3C) int8, (3C,) f32
    wq_t = wq.T  # (3C, C): output-rows-major for the (Jblk, C) blocks
    x_t = jnp.swapaxes(x, 1, 2)  # (B, C, N); LN apply fuses into this copy
    b_col = (bias if bias is not None
             else jnp.zeros((D3,), jnp.float32)).reshape(D3, 1)
    jblk = _pick_row_block32(D3)
    out = pl.pallas_call(
        _qkv_q8_dmaj_kernel,
        grid=(B, -(-D3 // jblk)),
        in_specs=[
            pl.BlockSpec((jblk, C), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, N), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((jblk, 1), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((jblk, 1), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, jblk, N), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, D3, N), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((C, N), jnp.int8),
            pltpu.VMEM((1, N), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * C * D3,
            bytes_accessed=x.dtype.itemsize * B * N * (C + D3) + C * D3,
            transcendentals=0,
        ),
        interpret=interpret,
    )(wq_t, x_t, ws.reshape(D3, 1), b_col)
    return out.reshape(B, 3, M, Dh, N)


def qkv_q8_premapped_dmaj(x, kernel, bias, n_heads: int, head_dim: int):
    """int8 premapped QKV in the Dh-major layout (B, 3, M, Dh, N): the same
    per-token dynamic quantization + int8 einsum as qkv_q8_premapped, but
    emitting tokens-in-lanes so the int8 serving mode composes with the
    dmaj attention layout (the round-3 +6.4% default) instead of falling
    back to the half-empty (N, Dh=64) tiles. Round-4 finding: the int8 mode
    measured 153.7 vs 160.9 p/s at HEAD defaults because it forfeited dmaj.
    """
    B, N, C = x.shape
    M, Dh = n_heads, head_dim
    xf = x.astype(jnp.float32)
    a = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True),
                    1e-12) / 127.0  # (B, N, 1)
    xq = jnp.clip(jnp.round(xf / a), -127, 127).astype(jnp.int8)
    wq, ws = quantize_weight(kernel)  # (C, 3C) int8, (3C,) f32
    acc = jnp.einsum("bnc,cpmd->bpmdn", xq, wq.reshape(C, 3, M, Dh),
                     preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * a[:, :, 0].reshape(B, 1, 1, 1, N) \
        * ws.reshape(1, 3, M, Dh, 1)
    if bias is not None:
        y = y + bias.reshape(1, 3, M, Dh, 1)
    return y.astype(x.dtype)
