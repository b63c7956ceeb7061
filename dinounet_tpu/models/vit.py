"""DINOv3 Vision Transformer backbone, TPU-native (flax.linen, NHWC).

Capability parity with ref: dinounet/dinov3/models/vision_transformer.py:55-412 and
dinounet/dinov3/layers/{attention.py,rope_position_encoding.py,block.py,ffn_layers.py,
patch_embed.py,layer_scale.py,rms_norm.py} — re-designed for XLA:

  * NHWC patch embedding (one conv = one MXU matmul per patch grid).
  * Axial RoPE (no learned pos-embed): sin/cos computed once per (H, W) in fp32,
    applied to the patch-token segment of q/k only (cls + storage tokens skipped),
    mirroring ref attention.py:66-85.
  * Fused QKV projection; attention via jax.nn.dot_product_attention (XLA picks the
    fused TPU path); bf16 matmuls with fp32 layernorms — the same numerics as the
    reference's `torch.autocast(bf16)` evaluation of the frozen backbone
    (ref: dinov3_adapter.py:422-426).
  * The `mask_k_bias` trick (ref attention.py:30-40) is folded into the checkpoint
    conversion: the k-section of the qkv bias is zeroed once at load time.

The backbone is always frozen in DinoUNet; callers wrap outputs in
jax.lax.stop_gradient so XLA never builds its backward graph.
"""

import dataclasses
import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    ffn_ratio: float = 4.0
    ffn_layer: str = "mlp"  # "mlp" | "swiglu" (align 64 handled below)
    swiglu_align: int = 64
    qkv_bias: bool = True
    proj_bias: bool = True
    ffn_bias: bool = True
    layerscale_init: float = 1e-5
    n_storage_tokens: int = 4
    patch_size: int = 16
    norm_eps: float = 1e-5  # 'layernormbf16' (ref vision_transformer.py:29)
    rope_base: float = 100.0
    dtype: str = "bfloat16"  # compute dtype for matmuls

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def n_prefix_tokens(self) -> int:
        return 1 + self.n_storage_tokens

    @property
    def ffn_hidden(self) -> int:
        if self.ffn_layer == "mlp":
            return int(self.embed_dim * self.ffn_ratio)
        d = int(int(self.embed_dim * self.ffn_ratio) * 2 / 3)
        return d + (-d % self.swiglu_align)


# Exact hyperparameters of the published checkpoints
# (ref: dinounet/dinov3/hub/backbones.py:201-237,279-317,318-373,452-494).
VIT_CONFIGS = {
    "dinov3_vits16": ViTConfig(embed_dim=384, depth=12, num_heads=6, ffn_ratio=4,
                               ffn_layer="mlp", qkv_bias=True),
    "dinov3_vitb16": ViTConfig(embed_dim=768, depth=12, num_heads=12, ffn_ratio=4,
                               ffn_layer="mlp", qkv_bias=True),
    "dinov3_vitl16": ViTConfig(embed_dim=1024, depth=24, num_heads=16, ffn_ratio=4,
                               ffn_layer="mlp", qkv_bias=True),
    "dinov3_vit7b16": ViTConfig(embed_dim=4096, depth=40, num_heads=32, ffn_ratio=3,
                                ffn_layer="swiglu", swiglu_align=64, qkv_bias=False),
}


def rope_sincos(H: int, W: int, head_dim: int, base: float = 100.0,
                dtype=jnp.float32) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Axial RoPE tables for an H x W patch grid -> (sin, cos), each [H*W, head_dim].

    ref: dinov3/layers/rope_position_encoding.py:57-110 (normalize_coords='separate',
    eval path: no shift/jitter/rescale augmentation).
    """
    periods = base ** (2 * jnp.arange(head_dim // 4, dtype=dtype) / (head_dim // 2))
    coords_h = (jnp.arange(0.5, H, dtype=dtype) / H) * 2.0 - 1.0  # [H] in [-1, 1]
    coords_w = (jnp.arange(0.5, W, dtype=dtype) / W) * 2.0 - 1.0  # [W]
    hh = jnp.broadcast_to(coords_h[:, None], (H, W))
    ww = jnp.broadcast_to(coords_w[None, :], (H, W))
    coords = jnp.stack([hh, ww], axis=-1).reshape(H * W, 2)  # [HW, 2]
    angles = 2 * math.pi * coords[:, :, None] / periods[None, None, :]  # [HW, 2, d/4]
    angles = angles.reshape(H * W, head_dim // 2)
    angles = jnp.tile(angles, (1, 2))  # [HW, head_dim]
    return jnp.sin(angles), jnp.cos(angles)


def rope_apply(x: jnp.ndarray, sin: jnp.ndarray, cos: jnp.ndarray) -> jnp.ndarray:
    """x: [..., HW, D]; sin/cos: [HW, D] (ref attention.py:16-27)."""
    d_half = x.shape[-1] // 2
    x1 = x[..., :d_half]
    x2 = x[..., d_half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return x * cos + rotated * sin


class LayerNormFp32(nn.Module):
    """LayerNorm computed in fp32 regardless of input dtype (autocast semantics).

    `stats=(mean, var)` (each (..., N) fp32) skips the statistics pass — the
    stats-threaded fused-dense path (ops/dense_stats_pallas.py) computes them
    in the producing kernel's epilogue; only the apply remains here, where XLA
    fuses it into the next matmul's prologue."""
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, stats=None):
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (dim,), jnp.float32)
        xf = x.astype(jnp.float32)
        if stats is None:
            # one-pass statistics: E[x] and E[x^2] fuse into a single read of
            # x (a serial mean -> var dependency costs a second full pass;
            # profiled as the largest single cost bucket of the tile forward)
            mean = xf.mean(-1, keepdims=True)
            mean2 = (xf * xf).mean(-1, keepdims=True)
            var = jnp.maximum(mean2 - mean * mean, 0.0)
        else:
            mean, var = stats[0][..., None], stats[1][..., None]
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * scale + bias).astype(x.dtype)


class _DenseParams(nn.Module):
    """Declares an nn.Dense-identical param tree (kernel/bias) and returns the
    raw params — for layers whose matmul runs inside a Pallas kernel. Naming
    this module e.g. "proj" yields exactly nn.Dense(name="proj")'s checkpoint
    layout, so the fused and unfused paths share checkpoints."""
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, in_features: int):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (in_features, self.features), jnp.float32)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,),
                           jnp.float32)
        else:
            b = jnp.zeros((self.features,), jnp.float32)
        return k, b


class PatchEmbed(nn.Module):
    """Non-overlapping patch embedding as explicit patchify + one MXU matmul.

    Param layout is identical to nn.Conv (kernel (p, p, C, E) + bias), so
    checkpoints are unchanged. The stride-p conv formulation measures ~40%
    slower on TPU at DinoUNet shapes: the conv emitter inherits awkward
    layouts from the channel-replicate producer, while the reshape/transpose
    here lowers to plain relayouts feeding a (B*h*w, p*p*C) x (p*p*C, E) dot.
    (ref: dinov3/layers/patch_embed.py:21-89 — a Conv2d in torch.)
    """
    embed_dim: int
    patch_size: int

    @nn.compact
    def __call__(self, x):
        p = self.patch_size
        B, H, W, C = x.shape
        h, w = H // p, W // p
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (p, p, C, self.embed_dim), jnp.float32)
        bias = self.param(
            "bias", nn.initializers.zeros, (self.embed_dim,), jnp.float32)
        xr = x.reshape(B, h, p, w, p, C).transpose(0, 1, 3, 2, 4, 5)
        xr = xr.reshape(B, h, w, p * p * C)
        y = jax.lax.dot_general(
            xr, kernel.reshape(p * p * C, self.embed_dim).astype(x.dtype),
            (((3,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        return (y + bias).astype(x.dtype)


class QuantDense(nn.Module):
    """nn.Dense-compatible (identical param tree) w8a8 dynamic-quant linear.

    Experimental serving mode for the frozen backbone
    (configuration.vit_int8): per-output-channel symmetric int8 weights,
    per-token symmetric int8 activations, int8xint8->int32 MXU dot (the
    double-rate path on TPU), f32 rescale. Quantization is at apply time, so
    checkpoints and the converter are untouched."""
    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (x.shape[-1], self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32) if self.use_bias else None
        w_scale = jnp.maximum(jnp.max(jnp.abs(k), axis=0), 1e-12) / 127.0
        wq = jnp.clip(jnp.round(k / w_scale[None, :]), -127, 127).astype(jnp.int8)
        xf = x.astype(jnp.float32)
        a_scale = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True),
                              1e-12) / 127.0
        xq = jnp.clip(jnp.round(xf / a_scale), -127, 127).astype(jnp.int8)
        y = jax.lax.dot_general(
            xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32)
        y = y * a_scale * w_scale
        if b is not None:
            y = y + b
        return y.astype(self.dtype)


def _backbone_dense(features: int, use_bias: bool, dtype, name: str):
    """nn.Dense, or the int8 serving variant when DINOUNET_TPU_VIT_INT8=1
    (same param tree either way — checkpoints are portable)."""
    from dinounet_tpu.configuration import vit_int8

    if vit_int8():
        return QuantDense(features, use_bias=use_bias, dtype=dtype, name=name)
    return nn.Dense(features, use_bias=use_bias, dtype=dtype, name=name)


class Attention(nn.Module):
    """`residual`/`ls_gamma` switch on the stats-threaded fused path: the
    output projection runs as the fused Pallas dense+LayerScale-residual op
    and the call returns (x + gamma*proj(o), mean, var) with the next
    LayerNorm's statistics (see ops/dense_stats_pallas.py)."""
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, rope: Optional[Tuple[jnp.ndarray, jnp.ndarray]],
                 residual: Optional[jnp.ndarray] = None,
                 ls_gamma: Optional[jnp.ndarray] = None):
        cfg = self.cfg
        B, N, C = x.shape
        M, Dh = cfg.num_heads, cfg.head_dim
        cdt = jnp.dtype(cfg.dtype)

        from dinounet_tpu.configuration import (
            use_fused_attention, use_fused_dense, vit_int8)

        if (use_fused_attention() and use_fused_dense()
                and residual is not None):
            # (requires the stats-threaded fused dense path: ~60% of the
            # premapped win is relayout cost that only pays off when the
            # channel-major fused projection consumes the kernel output
            # with the residual — SwiGLU/7B and DENSE_IMPL=jax configs keep
            # the row-major kernel below, which also keeps
            # DINOUNET_TPU_DENSE_IMPL=jax a clean A/B of the dense kernels)
            # Premapped fast path: the QKV projection emits the kernel's
            # per-head (B, 3, M, N, Dh) layout directly (the transposed write
            # folds into the matmul — the premapped-MSDA trick), the Pallas
            # kernel (RoPE + QK^T + softmax + PV in VMEM) returns the
            # attention output channel-major (B, M, Dh, N), and the output
            # projection consumes it via the channel-major fused
            # dense+LayerScale-residual+LN-stats kernel — no XLA-side
            # head-slice/transpose passes on either side of the kernel.
            # Forward-only kernels — valid because the backbone is frozen on
            # every DinoUNet path (custom VJPs differentiate the einsum
            # formulation for the linearization pass).
            from dinounet_tpu.configuration import (
                attn_premapped_layout, fused_dense_impl)
            from dinounet_tpu.ops.attention_pallas import (
                fused_rope_attention_premapped,
                fused_rope_attention_premapped_dmaj)

            interp = fused_dense_impl() == "interpret"
            k_q, b_q = _DenseParams(3 * C, cfg.qkv_bias, name="qkv")(C)
            sin, cos = rope if rope is not None else (None, None)
            if attn_premapped_layout() == "dmaj":
                # Dh-major layout: tokens in lanes — full 128-lane tiles on
                # the qkv write and the kernel's q/k/v reads (the ndh layout
                # below wastes half of every tile on the Dh=64 minor dim).
                # The int8 serving mode composes with it (round 4): the qkv
                # int8 einsum emits the same dmaj layout and the projection
                # runs the channel-major w8a8 kernel — without this the int8
                # mode forfeited the dmaj win and measured a net loss at
                # HEAD defaults (153.7 vs 160.9 p/s, ab_int8_r4.json).
                from dinounet_tpu.configuration import int8_qkv

                if vit_int8() and int8_qkv():
                    from dinounet_tpu.configuration import int8_qkv_impl

                    if int8_qkv_impl() == "kernel":
                        from dinounet_tpu.ops.dense_q8_pallas import (
                            qkv_q8_dmaj_fused)

                        qkv_t = qkv_q8_dmaj_fused(
                            x, k_q, b_q if cfg.qkv_bias else None, M, Dh,
                            interpret=interp)
                    else:
                        from dinounet_tpu.ops.dense_q8_pallas import (
                            qkv_q8_premapped_dmaj)

                        qkv_t = qkv_q8_premapped_dmaj(
                            x, k_q, b_q if cfg.qkv_bias else None, M, Dh)
                else:
                    qkv_t = jnp.einsum("bnc,cpmd->bpmdn", x,
                                       k_q.reshape(C, 3, M, Dh).astype(cdt))
                    if cfg.qkv_bias:
                        qkv_t = qkv_t + b_q.reshape(3, M, Dh, 1).astype(cdt)
                o_t = fused_rope_attention_premapped_dmaj(
                    qkv_t, sin, cos, interpret=interp)
                k_p, b_p = _DenseParams(C, cfg.proj_bias, name="proj")(C)
                if vit_int8():
                    from dinounet_tpu.ops.dense_q8_pallas import (
                        dense_cm_q8_residual_stats)

                    return dense_cm_q8_residual_stats(
                        o_t.reshape(B, C, N), k_p, b_p, residual, ls_gamma,
                        interpret=interp)
                from dinounet_tpu.ops.dense_stats_pallas import (
                    dense_cm_residual_stats)

                return dense_cm_residual_stats(
                    o_t.reshape(B, C, N), k_p, b_p, residual, ls_gamma,
                    interpret=interp)
            if vit_int8():
                # int8 serving mode on the premapped path: the qkv einsum
                # rides the MXU's double-rate int8 path (opt-out knob), the
                # attention kernel stays bf16, and the output projection runs
                # the channel-major w8a8 kernel (ops/dense_q8_pallas.py).
                from dinounet_tpu.configuration import int8_qkv
                from dinounet_tpu.ops.dense_q8_pallas import qkv_q8_premapped

                if int8_qkv():
                    qkv_t = qkv_q8_premapped(
                        x, k_q, b_q if cfg.qkv_bias else None, M, Dh)
                else:
                    qkv_t = jnp.einsum("bnc,cpmd->bpmnd", x,
                                       k_q.reshape(C, 3, M, Dh).astype(cdt))
                    if cfg.qkv_bias:
                        qkv_t = qkv_t + b_q.reshape(3, M, 1, Dh).astype(cdt)
            else:
                qkv_t = jnp.einsum("bnc,cpmd->bpmnd", x,
                                   k_q.reshape(C, 3, M, Dh).astype(cdt))
                if cfg.qkv_bias:
                    qkv_t = qkv_t + b_q.reshape(3, M, 1, Dh).astype(cdt)
            o_t = fused_rope_attention_premapped(qkv_t, sin, cos,
                                                 interpret=interp)
            k_p, b_p = _DenseParams(C, cfg.proj_bias, name="proj")(C)
            if vit_int8():
                from dinounet_tpu.ops.dense_q8_pallas import (
                    dense_cm_q8_residual_stats)

                return dense_cm_q8_residual_stats(
                    o_t.reshape(B, C, N), k_p, b_p, residual, ls_gamma,
                    interpret=interp)
            from dinounet_tpu.ops.dense_stats_pallas import (
                dense_cm_residual_stats)

            return dense_cm_residual_stats(
                o_t.reshape(B, C, N), k_p, b_p, residual, ls_gamma,
                interpret=interp)

        qkv = _backbone_dense(3 * C, cfg.qkv_bias, cdt, "qkv")(x)
        qkv = qkv.reshape(B, N, 3, M, Dh)

        if use_fused_attention():
            # Pallas kernel: RoPE + QK^T + softmax + PV in VMEM, no HBM
            # score matrices (ops/attention_pallas.py). Forward-only — valid
            # because the backbone is frozen on every DinoUNet path. (int8
            # serving mode lands here: QuantDense computes the projections,
            # the kernel consumes the row-major layout.)
            from dinounet_tpu.ops.attention_pallas import fused_rope_attention

            sin, cos = rope if rope is not None else (None, None)
            o = fused_rope_attention(qkv, sin, cos).reshape(B, N, C)
        else:
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, N, M, Dh)

            if rope is not None:
                # sin/cos are [N, Dh] with identity rows for the prefix
                # tokens; rope in fp32 (ref attention.py:66-85 uses the rope
                # dtype, fp32 for the published checkpoints), applied over the
                # whole sequence in (B, N, M, Dh) layout — no slicing, concat,
                # or transposes
                sin, cos = rope
                sin_b = sin[:, None, :]  # (N, 1, Dh)
                cos_b = cos[:, None, :]
                q = rope_apply(q.astype(jnp.float32), sin_b, cos_b).astype(q.dtype)
                k = rope_apply(k.astype(jnp.float32), sin_b, cos_b).astype(k.dtype)

            # SDPA with bf16 score/prob matrices + fp32 softmax: the N^2
            # matrices are HBM-bandwidth-bound at this sequence length, and
            # keeping them in bf16 (as torch autocast does, ref
            # attention.py:106-118) is ~25% faster end-to-end than
            # jax.nn.dot_product_attention's fp32 path.
            scores = jnp.einsum("bnmd,bkmd->bmnk", q, k) * (Dh ** -0.5)
            probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
            o = jnp.einsum("bmnk,bkmd->bnmd", probs, v)
            o = o.reshape(B, N, C)

        if residual is None:
            return _backbone_dense(C, cfg.proj_bias, cdt, "proj")(o)

        from dinounet_tpu.configuration import fused_dense_impl

        k_p, b_p = _DenseParams(C, cfg.proj_bias, name="proj")(C)
        if vit_int8():
            from dinounet_tpu.ops.dense_q8_pallas import (
                dense_q8_residual_stats)

            return dense_q8_residual_stats(
                o, k_p, b_p, residual, ls_gamma, prologue="none",
                interpret=fused_dense_impl() == "interpret")
        from dinounet_tpu.ops.dense_stats_pallas import dense_residual_stats

        return dense_residual_stats(
            o, k_p, b_p, residual, ls_gamma,
            apply_gelu=False, interpret=fused_dense_impl() == "interpret")


class Mlp(nn.Module):
    """`residual`/`ls_gamma` switch on the stats-threaded fused path: GELU +
    fc2 + LayerScale residual + next-LN stats run as one Pallas kernel and the
    call returns (x + gamma*fc2(gelu(h)), mean, var)."""
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x, residual: Optional[jnp.ndarray] = None,
                 ls_gamma: Optional[jnp.ndarray] = None):
        cfg = self.cfg
        cdt = jnp.dtype(cfg.dtype)
        if residual is None:
            h = _backbone_dense(cfg.ffn_hidden, cfg.ffn_bias, cdt, "fc1")(x)
            h = nn.gelu(h, approximate=False)
            return _backbone_dense(cfg.embed_dim, cfg.ffn_bias, cdt, "fc2")(h)

        from dinounet_tpu.configuration import fused_dense_impl, vit_int8

        interp = fused_dense_impl() == "interpret"
        k_p, b_p = _DenseParams(cfg.embed_dim, cfg.ffn_bias, name="fc2")(
            cfg.ffn_hidden)
        if vit_int8():
            # int8 fused path: fc1 quantizes in-kernel (no XLA quant passes),
            # fc2 runs GELU prologue + w8a8 dot + residual + next-LN stats
            from dinounet_tpu.ops.dense_q8_pallas import (
                dense_q8, dense_q8_residual_stats)

            k_1, b_1 = _DenseParams(cfg.ffn_hidden, cfg.ffn_bias,
                                    name="fc1")(cfg.embed_dim)
            h = dense_q8(x, k_1, b_1, prologue="none", interpret=interp)
            return dense_q8_residual_stats(
                h, k_p, b_p, residual, ls_gamma, prologue="gelu",
                interpret=interp)
        h = _backbone_dense(cfg.ffn_hidden, cfg.ffn_bias, cdt, "fc1")(x)
        from dinounet_tpu.configuration import mlp_gelu_impl
        from dinounet_tpu.ops.dense_stats_pallas import dense_residual_stats

        if mlp_gelu_impl() == "xla":
            # GELU fuses into fc1's XLA epilogue; the fused kernel then runs
            # matmul-only (its in-kernel erf/exp VPU work otherwise rivals
            # the fc2 matmul's MXU time — see configuration.mlp_gelu_impl)
            h = nn.gelu(h.astype(jnp.float32), approximate=False).astype(cdt)
            return dense_residual_stats(
                h, k_p, b_p, residual, ls_gamma,
                apply_gelu=False, interpret=interp)
        return dense_residual_stats(
            h, k_p, b_p, residual, ls_gamma,
            apply_gelu=True, interpret=interp)


class SwiGLU(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        cdt = jnp.dtype(cfg.dtype)
        x1 = _backbone_dense(cfg.ffn_hidden, cfg.ffn_bias, cdt, "w1")(x)
        x2 = _backbone_dense(cfg.ffn_hidden, cfg.ffn_bias, cdt, "w2")(x)
        return _backbone_dense(cfg.embed_dim, cfg.ffn_bias, cdt, "w3")(
            nn.silu(x1) * x2
        )


class Block(nn.Module):
    """Pre-norm attn + LayerScale residual, pre-norm FFN + LayerScale residual.

    ref: dinov3/layers/block.py:21-125 (eval path; the frozen backbone never uses
    the sample-level stochastic-depth branch).
    """
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x, rope, stats=None):
        cfg = self.cfg
        ls_init = nn.initializers.constant(cfg.layerscale_init)
        if stats is not None:
            # stats-threaded fused-dense path: each projection kernel emits
            # the next LayerNorm's statistics with its residual output, so no
            # standalone stats pass (or stats-reduce matmul epilogue) remains
            y = LayerNormFp32(cfg.norm_eps, name="norm1")(x, stats=stats)
            gamma1 = self.param("ls1_gamma", ls_init, (cfg.embed_dim,),
                                jnp.float32)
            x2, mu2, var2 = Attention(cfg, name="attn")(
                y, rope, residual=x, ls_gamma=gamma1)
            y2 = LayerNormFp32(cfg.norm_eps, name="norm2")(
                x2, stats=(mu2, var2))
            gamma2 = self.param("ls2_gamma", ls_init, (cfg.embed_dim,),
                                jnp.float32)
            x3, mu3, var3 = Mlp(cfg, name="mlp")(
                y2, residual=x2, ls_gamma=gamma2)
            return x3, (mu3, var3)
        y = LayerNormFp32(cfg.norm_eps, name="norm1")(x)
        y = Attention(cfg, name="attn")(y, rope)
        gamma1 = self.param("ls1_gamma", ls_init, (cfg.embed_dim,), jnp.float32)
        x = x + y * gamma1.astype(y.dtype)
        y = LayerNormFp32(cfg.norm_eps, name="norm2")(x)
        ffn = Mlp(cfg, name="mlp") if cfg.ffn_layer == "mlp" else SwiGLU(cfg, name="mlp")
        y = ffn(y)
        gamma2 = self.param("ls2_gamma", ls_init, (cfg.embed_dim,), jnp.float32)
        return x + y * gamma2.astype(y.dtype)


class DinoViT(nn.Module):
    """Returns normed (patch_tokens, cls_token) at the requested block indices.

    Equivalent of ref vision_transformer.py `get_intermediate_layers(n=[...],
    return_class_token=True)` (ref :281-318, norm=True, untied norms unused on the
    published s/b/l/7b eval path).

    Input: NHWC image (B, H, W, 3), H/W divisible by patch_size.
    """
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, take_indices: Sequence[int]):
        cfg = self.cfg
        # normalize to sorted-unique so the scanned path (emits in
        # take_indices order) and the unrolled path (emits in ascending
        # block order via a set) can never return differently
        # ordered/sized results (ADVICE r4)
        take_indices = tuple(sorted(set(int(i) for i in take_indices)))
        cdt = jnp.dtype(cfg.dtype)
        B, H, W, _ = x.shape
        p = cfg.patch_size
        h, w = H // p, W // p

        patches = PatchEmbed(cfg.embed_dim, p, name="patch_embed")(x.astype(cdt))
        tokens = patches.reshape(B, h * w, cfg.embed_dim)

        cls_token = self.param(
            "cls_token", nn.initializers.truncated_normal(0.02), (1, 1, cfg.embed_dim),
            jnp.float32,
        )
        storage_tokens = self.param(
            "storage_tokens", nn.initializers.truncated_normal(0.02),
            (1, cfg.n_storage_tokens, cfg.embed_dim), jnp.float32,
        )
        prefix = jnp.concatenate(
            [cls_token, storage_tokens], axis=1
        ).astype(cdt)
        tokens = jnp.concatenate(
            [jnp.broadcast_to(prefix, (B, cfg.n_prefix_tokens, cfg.embed_dim)), tokens],
            axis=1,
        )

        sin, cos = rope_sincos(h, w, cfg.head_dim, cfg.rope_base)
        # pad identity rows (sin 0, cos 1) for the cls/storage prefix tokens:
        # rope then applies to the whole sequence with no per-block
        # slice/concat (exactly equivalent to skipping the prefix,
        # ref attention.py:66-85)
        np_ = cfg.n_prefix_tokens
        sin = jnp.concatenate([jnp.zeros((np_, sin.shape[1]), sin.dtype), sin])
        cos = jnp.concatenate([jnp.ones((np_, cos.shape[1]), cos.dtype), cos])
        final_norm = LayerNormFp32(cfg.norm_eps, name="norm")

        from dinounet_tpu.configuration import use_fused_dense

        # stats-threaded fused-dense path (TPU): one entry stats pass, then
        # every block's projection kernels carry the next LN's statistics —
        # SwiGLU (7B) keeps the plain path (its gated FFN has no single
        # dense+residual tail)
        fused = use_fused_dense() and cfg.ffn_layer == "mlp"
        stats = None
        if fused:
            from dinounet_tpu.ops.dense_stats_pallas import row_stats

            stats = row_stats(tokens)

        from dinounet_tpu.configuration import vit_scan_threshold

        # structural condition only (ffn_layer, depth) — NOT `fused` — so
        # the param layout cannot silently change with the DENSE_IMPL knob
        # (ViT-L is depth 24 mlp and must keep its unrolled tree under
        # dense=jax A/Bs); mlp configs always unroll for the stats-threaded
        # chain, swiglu (7B) scans at depth >= the threshold
        if cfg.ffn_layer != "mlp" and cfg.depth >= vit_scan_threshold():
            # Scanned homogeneous block stack (configuration.
            # vit_scan_threshold): ONE traced block body, params stacked
            # (depth, ...) by nn.scan — the unrolled 40-block ViT-7B graph
            # is too large for the XLA:TPU compile service (round-4
            # bisection), and lax.scan is the idiomatic fix. take-index
            # outputs land in a carried slot buffer via a per-step select.
            take_arr = jnp.asarray(list(take_indices), jnp.int32)
            n_take = len(take_indices)
            buf0 = jnp.zeros((n_take,) + tokens.shape, tokens.dtype)

            class _ScanBody(nn.Module):
                cfg: ViTConfig

                @nn.compact
                def __call__(self, carry, _):
                    toks, buf, i = carry
                    toks = Block(self.cfg, name="block")(toks, (sin, cos))
                    write = (take_arr == i)[:, None, None, None]
                    buf = jnp.where(write, toks[None], buf)
                    return (toks, buf, i + 1), None

            scanned = nn.scan(
                _ScanBody,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=cfg.depth,
            )(cfg, name="blocks_scan")
            (_, buf, _), _ = scanned(
                (tokens, buf0, jnp.int32(0)), None)
            outputs = []
            for slot in range(n_take):
                normed = final_norm(buf[slot])
                outputs.append(
                    (normed[:, cfg.n_prefix_tokens:], normed[:, 0]))
            return outputs

        take = set(int(i) for i in take_indices)
        outputs = []
        for i in range(cfg.depth):
            if fused:
                tokens, stats = Block(cfg, name=f"block{i}")(
                    tokens, (sin, cos), stats=stats)
            else:
                tokens = Block(cfg, name=f"block{i}")(tokens, (sin, cos))
            if i in take:
                normed = final_norm(tokens, stats=stats)
                outputs.append(
                    (normed[:, cfg.n_prefix_tokens:], normed[:, 0])
                )
        return outputs
