"""Fused RoPE + multi-head self-attention — Pallas TPU kernel.

The frozen DINOv3 backbone is the dominant cost of the DinoUNet tile forward,
and within it the attention score/probability matrices are pure HBM traffic:
at 512x512 tiles (N = 1029 tokens) each block materializes a (B, M, N, N)
score tensor (~200 MB bf16 at batch 8) twice per layer through the einsum +
softmax + einsum formulation. This kernel keeps one (batch, head)'s worth of
work in VMEM: RoPE rotation of q/k, the QK^T matmul, the fp32 softmax, and
the PV matmul, so HBM sees q/k/v once and the output once — the score matrix
never leaves the chip. One head per program keeps the live VMEM set at
~7 MB (scores (N, N) fp32 dominate), under the 16 MB scoped limit.

RoPE inside the kernel uses the roll trick: rotate_half(x) = concat(-x2, x1)
equals roll(x, D/2) * sign with sign = [-1]*D/2 ++ [+1]*D/2; the sign is
folded into the sin table, so the rotation is one lane-roll and two FMAs.
Prefix (cls/storage) tokens carry identity rows (sin 0, cos 1) in the tables,
exactly like the XLA path (models/vit.py) and the reference, which applies
RoPE to patch tokens only (ref: dinov3/layers/attention.py:66-85).

The backbone is frozen on every DinoUNet path (ref: dinov3_adapter.py:326
requires_grad_(False); our models wrap backbone outputs in stop_gradient), so
no cotangent ever reaches this op in practice — but jax.grad still linearizes
the whole graph before pruning, so the op carries a custom VJP whose backward
recomputes the attention with the XLA einsum formulation and differentiates
that (exact; dead-code-eliminated on the frozen paths).
Numerics match the XLA path: RoPE in fp32, scores bf16 on the MXU with fp32
accumulation, softmax in fp32, probabilities cast back to the compute dtype
(the reference's torch.autocast(bf16) evaluation).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(scale, q_ref, k_ref, v_ref, sin_ref, cos_ref, o_ref):
    """One program = one (batch, head). q/k/v/o: (1, 1, N, Dh); sin/cos:
    (N, Dh) fp32 with the rotation sign pre-folded into sin (identity
    tables — sin 0, cos 1 — encode the no-RoPE case)."""
    Dh = q_ref.shape[-1]
    cdt = q_ref.dtype
    sin = sin_ref[...]
    cos = cos_ref[...]

    def rope(x, mul=None):
        xf = x.astype(jnp.float32)
        r = xf * cos + pltpu.roll(xf, Dh // 2, 1) * sin
        if mul is not None:
            r = r * mul  # scale folded into q: an (N, Dh) pass instead of
            # multiplying the (N, N) f32 score matrix
        return r.astype(cdt)

    q = rope(q_ref[0, 0], scale)
    k = rope(k_ref[0, 0])
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )
    # softmax with the normalization folded into the output: dividing the
    # (N, Dh) PV result by the row sums replaces a full (N, N) pass
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m).astype(cdt)
    denom = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
    pv = jax.lax.dot_general(
        e, v_ref[0, 0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, 0] = (pv / denom).astype(cdt)


def _kernel_pm(scale, q_ref, k_ref, v_ref, sin_ref, cos_ref, o_ref):
    """Premapped variant: one program = one (batch, head); q/k/v blocks are
    (1, 1, 1, N, Dh) planes of the (B, 3, M, N, Dh) projection output, and
    the output block is (1, 1, Dh, N) — channel-major, so the attention
    output feeds the fused output-projection kernel
    (ops/dense_stats_pallas.py::dense_cm_residual_stats) with no relayout
    pass on either side. The PV product is computed directly in (Dh, N)
    orientation by contracting the key axis of V with the key axis of the
    probabilities — same FLOPs, transposed output."""
    Dh = q_ref.shape[-1]
    cdt = q_ref.dtype
    sin = sin_ref[...]
    cos = cos_ref[...]

    def rope(x, mul=None):
        xf = x.astype(jnp.float32)
        r = xf * cos + pltpu.roll(xf, Dh // 2, 1) * sin
        if mul is not None:
            r = r * mul
        return r.astype(cdt)

    q = rope(q_ref[0, 0, 0], scale)
    k = rope(k_ref[0, 0, 0])
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m).astype(cdt)
    denom = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)  # (N, 1)
    # pv_t[d, n] = sum_k v[k, d] * e[n, k]
    pv_t = jax.lax.dot_general(
        v_ref[0, 0, 0], e, (((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, 0] = (pv_t / denom[:, 0][None, :]).astype(cdt)


def _kernel_pm_dmaj(scale, q_ref, k_ref, v_ref, sin_ref, cos_ref, o_ref):
    """Dh-major premapped variant: one program = one (batch, head); q/k/v
    blocks are (1, 1, 1, Dh, N) planes of a (B, 3, M, Dh, N) projection
    output and the RoPE tables arrive transposed (Dh, N). With tokens in the
    LANE dimension every q/k/v tile is fully utilized (the (N, Dh=64) layout
    of _kernel_pm wastes half of every 128-lane tile on the minor Dh dim —
    ~2x the qkv HBM bytes and a half-empty MXU output tile on the projection
    einsum). RoPE's rotate-half becomes a SUBLANE roll (axis 0), which Mosaic
    lowers. The score matmul contracts the sublane Dh axis of q and k
    directly; PV contracts the key axis of v's lanes with e's lanes, giving
    (Dh, N) output — identical to _kernel_pm's channel-major emission."""
    Dh = q_ref.shape[-2]
    cdt = q_ref.dtype
    sin = sin_ref[...]
    cos = cos_ref[...]

    def rope(x, mul=None):
        xf = x.astype(jnp.float32)
        r = xf * cos + pltpu.roll(xf, Dh // 2, 0) * sin
        if mul is not None:
            r = r * mul
        return r.astype(cdt)

    q = rope(q_ref[0, 0, 0], scale)  # (Dh, N)
    k = rope(k_ref[0, 0, 0])
    s = jax.lax.dot_general(
        q, k, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )  # (N, N): rows = query tokens, cols = key tokens
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m).astype(cdt)
    denom = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)  # (N, 1)
    # pv_t[d, n] = sum_k v[d, k] * e[n, k]
    pv_t = jax.lax.dot_general(
        v_ref[0, 0, 0], e, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, 0] = (pv_t / denom[:, 0][None, :]).astype(cdt)


def _xla_reference_dmaj(qkv_t, sin_eff_t, cos_t):
    """Einsum formulation over the Dh-major (B, 3, M, Dh, N) layout,
    returning (B, M, Dh, N) — numerical source for the custom VJP."""
    Dh = qkv_t.shape[-2]
    q, k, v = qkv_t[:, 0], qkv_t[:, 1], qkv_t[:, 2]  # (B, M, Dh, N)

    def rope(x):
        xf = x.astype(jnp.float32)
        rolled = jnp.roll(xf, Dh // 2, axis=-2)
        return (xf * cos_t + rolled * sin_eff_t).astype(x.dtype)

    q = rope(q)
    k = rope(k)
    s = jnp.einsum("bmdn,bmdk->bmnk", q, k,
                   preferred_element_type=jnp.float32) * (Dh ** -0.5)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bmnk,bmdk->bmdn", p, v,
                      preferred_element_type=jnp.float32).astype(qkv_t.dtype)


def fused_rope_attention_premapped_dmaj(qkv_t: jnp.ndarray,
                                        sin: jnp.ndarray | None,
                                        cos: jnp.ndarray | None,
                                        interpret: bool = False) -> jnp.ndarray:
    """qkv_t: (B, 3, M, Dh, N) — the QKV projection emitted Dh-major
    (models/vit.py computes it as `bnc,cpmd->bpmdn`, whose transposed write
    folds into the matmul and whose minor dim N fills whole 128-lane tiles,
    unlike the (N, Dh=64) layout). sin/cos: (N, Dh) fp32 RoPE tables as
    everywhere else (transposed once here — XLA CSEs the transpose across
    the 12 blocks sharing the tables). Returns (B, M, Dh, N) channel-major,
    identical to fused_rope_attention_premapped."""
    N, Dh = qkv_t.shape[4], qkv_t.shape[3]
    if sin is not None:
        half = Dh // 2
        sin_eff = jnp.concatenate(
            [-sin[:, :half], sin[:, half:]], axis=-1).astype(jnp.float32)
        sin_eff_t, cos_t = sin_eff.T, cos.astype(jnp.float32).T
    else:
        sin_eff_t = jnp.zeros((Dh, N), jnp.float32)
        cos_t = jnp.ones((Dh, N), jnp.float32)
    return _fused_rope_attention_dmaj(qkv_t, sin_eff_t, cos_t, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _fused_rope_attention_dmaj(qkv_t, sin_eff_t, cos_t, interpret=False):
    return _pallas_forward_dmaj(qkv_t, sin_eff_t, cos_t, interpret)


def _vjp_fwd_dmaj(qkv_t, sin_eff_t, cos_t, interpret):
    return _pallas_forward_dmaj(qkv_t, sin_eff_t, cos_t, interpret), (
        qkv_t, sin_eff_t, cos_t)


def _vjp_bwd_dmaj(interpret, res, g):
    qkv_t, sin_eff_t, cos_t = res
    _, pullback = jax.vjp(
        lambda q: _xla_reference_dmaj(q, sin_eff_t, cos_t), qkv_t)
    return (pullback(g)[0], jnp.zeros_like(sin_eff_t), jnp.zeros_like(cos_t))


_fused_rope_attention_dmaj.defvjp(_vjp_fwd_dmaj, _vjp_bwd_dmaj)


def _pallas_forward_dmaj(qkv_t, sin_eff_t, cos_t, interpret=False):
    B, three, M, Dh, N = qkv_t.shape
    assert three == 3

    kern = functools.partial(_kernel_pm_dmaj, Dh ** -0.5)

    def plane(p):
        return pl.BlockSpec((1, 1, 1, Dh, N), lambda b, m, _p=p: (b, _p, m, 0, 0),
                            memory_space=pltpu.VMEM)

    table_spec = pl.BlockSpec((Dh, N), lambda b, m: (0, 0),
                              memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(B, M),
        in_specs=[plane(0), plane(1), plane(2), table_spec, table_spec],
        out_specs=pl.BlockSpec((1, 1, Dh, N), lambda b, m: (b, m, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, M, Dh, N), qkv_t.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * M * N * N * Dh,
            bytes_accessed=qkv_t.dtype.itemsize * 4 * B * M * N * Dh,
            transcendentals=B * M * N * N,
        ),
        interpret=interpret,
    )(qkv_t, qkv_t, qkv_t, sin_eff_t, cos_t)


def _xla_reference_pm(qkv_t, sin_eff, cos):
    """Einsum formulation over the premapped (B, 3, M, N, Dh) layout,
    returning (B, M, Dh, N) — numerical source for the custom VJP."""
    Dh = qkv_t.shape[-1]
    q, k, v = qkv_t[:, 0], qkv_t[:, 1], qkv_t[:, 2]  # (B, M, N, Dh)

    def rope(x):
        xf = x.astype(jnp.float32)
        rolled = jnp.roll(xf, Dh // 2, axis=-1)
        return (xf * cos + rolled * sin_eff).astype(x.dtype)

    q = rope(q)
    k = rope(k)
    s = jnp.einsum("bmnd,bmkd->bmnk", q, k,
                   preferred_element_type=jnp.float32) * (Dh ** -0.5)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bmnk,bmkd->bmdn", p, v,
                      preferred_element_type=jnp.float32).astype(qkv_t.dtype)


def fused_rope_attention_premapped(qkv_t: jnp.ndarray,
                                   sin: jnp.ndarray | None,
                                   cos: jnp.ndarray | None,
                                   interpret: bool = False) -> jnp.ndarray:
    """qkv_t: (B, 3, M, N, Dh) — the QKV projection emitted directly in the
    kernel's per-head layout (models/vit.py computes it as one einsum whose
    transposed write folds into the matmul, the premapped-MSDA trick).
    Returns the attention output channel-major: (B, M, Dh, N)."""
    N, Dh = qkv_t.shape[3], qkv_t.shape[4]
    if sin is not None:
        half = Dh // 2
        sin_eff = jnp.concatenate(
            [-sin[:, :half], sin[:, half:]], axis=-1).astype(jnp.float32)
        cos = cos.astype(jnp.float32)
    else:
        sin_eff = jnp.zeros((N, Dh), jnp.float32)
        cos = jnp.ones((N, Dh), jnp.float32)
    return _fused_rope_attention_pm(qkv_t, sin_eff, cos, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _fused_rope_attention_pm(qkv_t, sin_eff, cos, interpret=False):
    return _pallas_forward_pm(qkv_t, sin_eff, cos, interpret)


def _vjp_fwd_pm(qkv_t, sin_eff, cos, interpret):
    return _pallas_forward_pm(qkv_t, sin_eff, cos, interpret), (
        qkv_t, sin_eff, cos)


def _vjp_bwd_pm(interpret, res, g):
    qkv_t, sin_eff, cos = res
    _, pullback = jax.vjp(lambda q: _xla_reference_pm(q, sin_eff, cos), qkv_t)
    return (pullback(g)[0], jnp.zeros_like(sin_eff), jnp.zeros_like(cos))


_fused_rope_attention_pm.defvjp(_vjp_fwd_pm, _vjp_bwd_pm)


def _pallas_forward_pm(qkv_t, sin_eff, cos, interpret=False):
    B, three, M, N, Dh = qkv_t.shape
    assert three == 3

    kern = functools.partial(_kernel_pm, Dh ** -0.5)

    def plane(p):
        return pl.BlockSpec((1, 1, 1, N, Dh), lambda b, m, _p=p: (b, _p, m, 0, 0),
                            memory_space=pltpu.VMEM)

    table_spec = pl.BlockSpec((N, Dh), lambda b, m: (0, 0),
                              memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(B, M),
        in_specs=[plane(0), plane(1), plane(2), table_spec, table_spec],
        out_specs=pl.BlockSpec((1, 1, Dh, N), lambda b, m: (b, m, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, M, Dh, N), qkv_t.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * M * N * N * Dh,
            bytes_accessed=qkv_t.dtype.itemsize * 4 * B * M * N * Dh,
            transcendentals=B * M * N * N,
        ),
        interpret=interpret,
    )(qkv_t, qkv_t, qkv_t, sin_eff, cos)


def _xla_reference(qkv, sin_eff, cos):
    """The einsum formulation on the sign-folded tables — used only as the
    numerical source for the custom VJP (models/vit.py's fallback path has
    the same math)."""
    B, N, _, M, Dh = qkv.shape
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

    def rope(x):
        xf = x.astype(jnp.float32)
        rolled = jnp.roll(xf, Dh // 2, axis=-1)
        return (xf * cos[:, None, :] + rolled * sin_eff[:, None, :]).astype(x.dtype)

    q = rope(q)
    k = rope(k)
    s = jnp.einsum("bnmd,bkmd->bmnk", q, k,
                   preferred_element_type=jnp.float32) * (Dh ** -0.5)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bmnk,bkmd->bnmd", p, v,
                      preferred_element_type=jnp.float32).astype(qkv.dtype)


def fused_rope_attention(qkv: jnp.ndarray, sin: jnp.ndarray | None,
                         cos: jnp.ndarray | None,
                         interpret: bool = False) -> jnp.ndarray:
    """qkv: (B, N, 3, M, Dh) — the fused QKV projection output, reshaped.
    sin/cos: (N, Dh) fp32 RoPE tables (identity rows for prefix tokens), or
    None to skip RoPE. Returns attention output (B, N, M, Dh) in qkv's dtype.
    """
    N, Dh = qkv.shape[1], qkv.shape[4]
    if sin is not None:
        half = Dh // 2
        # fold rotate_half's sign into the sin table (see module docstring)
        sin_eff = jnp.concatenate(
            [-sin[:, :half], sin[:, half:]], axis=-1).astype(jnp.float32)
        cos = cos.astype(jnp.float32)
    else:
        sin_eff = jnp.zeros((N, Dh), jnp.float32)
        cos = jnp.ones((N, Dh), jnp.float32)
    return _fused_rope_attention(qkv, sin_eff, cos, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _fused_rope_attention(qkv, sin_eff, cos, interpret=False):
    return _pallas_forward(qkv, sin_eff, cos, interpret)


def _vjp_fwd(qkv, sin_eff, cos, interpret):
    return _pallas_forward(qkv, sin_eff, cos, interpret), (qkv, sin_eff, cos)


def _vjp_bwd(interpret, res, g):
    qkv, sin_eff, cos = res
    _, pullback = jax.vjp(lambda q: _xla_reference(q, sin_eff, cos), qkv)
    return (pullback(g)[0], jnp.zeros_like(sin_eff), jnp.zeros_like(cos))


_fused_rope_attention.defvjp(_vjp_fwd, _vjp_bwd)


def _pallas_forward(qkv, sin_eff, cos, interpret=False):
    B, N, three, M, Dh = qkv.shape
    assert three == 3

    # (B, N, 3, M, Dh) -> per-head layout (B, M, N, Dh); XLA fuses the
    # slice+transpose into the surrounding graph
    q = qkv[:, :, 0].transpose(0, 2, 1, 3)
    k = qkv[:, :, 1].transpose(0, 2, 1, 3)
    v = qkv[:, :, 2].transpose(0, 2, 1, 3)

    kern = functools.partial(_kernel, Dh ** -0.5)
    head_spec = pl.BlockSpec((1, 1, N, Dh), lambda b, m: (b, m, 0, 0),
                             memory_space=pltpu.VMEM)
    table_spec = pl.BlockSpec((N, Dh), lambda b, m: (0, 0),
                              memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=(B, M),
        in_specs=[head_spec, head_spec, head_spec, table_spec, table_spec],
        out_specs=head_spec,
        out_shape=jax.ShapeDtypeStruct((B, M, N, Dh), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * M * N * N * Dh,
            bytes_accessed=qkv.dtype.itemsize * 4 * B * M * N * Dh,
            transcendentals=B * M * N * N,
        ),
        interpret=interpret,
    )(q, k, v, sin_eff, cos)
    return out.transpose(0, 2, 1, 3)
