"""TPU export-lowering audit of every Pallas kernel wrapper.

`jax.export(..., platforms=['tpu'])` runs the Pallas→Mosaic lowering and
BlockSpec legality checks WITHOUT a TPU device — catching on CPU an entire
class of kernel bugs that interpret-mode parity tests cannot see (interpret
mode never validates block shapes or Mosaic serialization). This caught a
real one: per-batch prologue operands with (1, C) blocks over (B, C) arrays,
illegal on TPU for B > 1 (block last-two dims must be tile-divisible or
equal the array dims), which would have knocked the whole decoder chain out
of the benchmark at lowering time.

Full Mosaic compilation (layout inference, vector lowering) still happens
inside XLA:TPU at compile time on the device — these tests are a necessary,
not sufficient, lowering gate. Shapes mirror the real model's (batch > 1
everywhere so per-batch block indexing is exercised).
"""

import jax
import jax.numpy as jnp
from jax import export

S = jax.ShapeDtypeStruct
BF, F32 = jnp.bfloat16, jnp.float32


def tpu_export(f, *args):
    return export.export(jax.jit(f), platforms=["tpu"])(*args)


class TestDecoderTailExports:
    def test_conv3x3_cm(self):
        from dinounet_tpu.ops.decoder_tail_pallas import conv3x3_cm

        tpu_export(lambda x, w, b, s, t: conv3x3_cm(x, w, b, prologue=(s, t)),
                   S((2, 16, 32, 128), BF), S((3, 3, 16, 8), F32),
                   S((8,), F32), S((2, 16), F32), S((2, 16), F32))

    def test_conv3x3_cm_no_stats_no_prologue(self):
        from dinounet_tpu.ops.decoder_tail_pallas import conv3x3_cm

        tpu_export(lambda x, w, b: conv3x3_cm(x, w, b, stats=False),
                   S((2, 16, 32, 128), BF), S((3, 3, 16, 16), F32),
                   S((16,), F32))

    def test_transpconv2x2_cm(self):
        from dinounet_tpu.ops.decoder_tail_pallas import transpconv2x2_cm

        tpu_export(
            lambda x, w, b, s, t: transpconv2x2_cm(x, w, b, prologue=(s, t)),
            S((2, 16, 16, 128), BF), S((2, 2, 16, 8), F32), S((8,), F32),
            S((2, 16), F32), S((2, 16), F32))

    def test_seg_head_cm(self):
        from dinounet_tpu.ops.decoder_tail_pallas import seg_head_cm

        tpu_export(lambda x, w, b, s, t: seg_head_cm(x, w, b, (s, t)),
                   S((2, 16, 32, 128), BF), S((16, 3), F32), S((3,), F32),
                   S((2, 16), F32), S((2, 16), F32))


class TestMSDAExports:
    shapes = ((16, 16),)  # S = 256

    def test_premapped_forward_and_grad(self):
        from dinounet_tpu.ops.msda_pallas import ms_deform_attn_pallas_premapped

        v = S((2, 2, 8, 256), BF)
        c = S((2, 2, 4, 256), F32)

        def f(v, xs, ys, aw):
            return ms_deform_attn_pallas_premapped(
                v, self.shapes, xs, ys, aw, False, jnp.bfloat16)

        tpu_export(f, v, c, c, c)

        def loss(v, xs, ys, aw):
            return jnp.sum(f(v, xs, ys, aw).astype(jnp.float32))

        tpu_export(jax.grad(loss, argnums=(0, 1, 2, 3)), v, c, c, c)

    def test_fused_prep_forward_and_grad(self):
        from dinounet_tpu.ops.msda_pallas import (
            ms_deform_attn_pallas_premapped_fused,
        )

        v = S((2, 2, 8, 256), BF)
        off = S((2, 2, 8, 256), BF)
        lg = S((2, 2, 4, 256), BF)
        base = S((8, 256), F32)

        def f(v, off, lg, base):
            return ms_deform_attn_pallas_premapped_fused(
                v, self.shapes, off, lg, base, False, jnp.bfloat16)

        tpu_export(f, v, off, lg, base)

        def loss(v, off, lg, base):
            return jnp.sum(f(v, off, lg, base).astype(jnp.float32))

        tpu_export(jax.grad(loss, argnums=(0, 1, 2)), v, off, lg, base)

    def test_merged_prep_forward_and_grad(self):
        """Round 5: the merged offsets+logits buffer variant (one packed
        (B, M, 3LP, Lq) operand consumed via sliced BlockSpecs)."""
        from dinounet_tpu.ops.msda_pallas import (
            ms_deform_attn_pallas_premapped_fused_merged,
        )

        v = S((2, 2, 8, 256), BF)
        packed = S((2, 2, 12, 256), BF)
        base = S((8, 256), F32)

        def f(v, packed, base):
            return ms_deform_attn_pallas_premapped_fused_merged(
                v, self.shapes, packed, base, False, jnp.bfloat16)

        tpu_export(f, v, packed, base)

        def loss(v, packed, base):
            return jnp.sum(f(v, packed, base).astype(jnp.float32))

        tpu_export(jax.grad(loss, argnums=(0, 1)), v, packed, base)

    def test_reference_layout(self):
        from dinounet_tpu.ops.msda_pallas import ms_deform_attn_pallas

        tpu_export(
            lambda v, loc, aw: ms_deform_attn_pallas(
                v, self.shapes, loc, aw),
            S((2, 256, 2, 8), F32), S((2, 64, 2, 1, 4, 2), F32),
            S((2, 64, 2, 1, 4), F32))


class TestDenseAttentionExports:
    def test_dense_residual_stats(self):
        from dinounet_tpu.ops.dense_stats_pallas import dense_residual_stats

        tpu_export(
            lambda h, w, b, r, g: dense_residual_stats(h, w, b, r, g,
                                                       apply_gelu=True),
            S((2, 256, 128), BF), S((128, 128), F32), S((128,), F32),
            S((2, 256, 128), BF), S((128,), F32))

    def test_dense_cm_residual_stats(self):
        from dinounet_tpu.ops.dense_stats_pallas import dense_cm_residual_stats

        tpu_export(
            lambda h, w, b, r, g: dense_cm_residual_stats(h, w, b, r, g),
            S((2, 128, 256), BF), S((128, 128), F32), S((128,), F32),
            S((2, 256, 128), BF), S((128,), F32))

    def test_dense_q8_family(self):
        """The w8a8 serving kernels (round 3): export-lower fwd + the grads
        that a whole-graph linearization would request."""
        from dinounet_tpu.ops.dense_q8_pallas import (
            dense_cm_q8_residual_stats,
            dense_q8,
            dense_q8_residual_stats,
        )

        tpu_export(
            lambda h, w, b: dense_q8(h, w, b, prologue="none"),
            S((2, 256, 128), BF), S((128, 128), F32), S((128,), F32))
        tpu_export(
            lambda h, w, b, r, g: dense_q8_residual_stats(
                h, w, b, r, g, prologue="gelu"),
            S((2, 256, 128), BF), S((128, 128), F32), S((128,), F32),
            S((2, 256, 128), BF), S((128,), F32))
        tpu_export(
            lambda h, w, b, r, g: dense_cm_q8_residual_stats(h, w, b, r, g),
            S((2, 128, 256), BF), S((128, 128), F32), S((128,), F32),
            S((2, 256, 128), BF), S((128,), F32))

        def loss(h, w, b, r, g):
            o, m, v = dense_q8_residual_stats(h, w, b, r, g, prologue="gelu")
            return jnp.sum(o.astype(jnp.float32)) + jnp.sum(m) + jnp.sum(v)

        tpu_export(jax.grad(loss, argnums=(3, 4)),
                   S((2, 256, 128), BF), S((128, 128), F32), S((128,), F32),
                   S((2, 256, 128), BF), S((128,), F32))

    def test_qkv_q8_dmaj_fused(self):
        """Round 5: the fused int8 dmaj qkv kernel (in-kernel quantize +
        rescale, VMEM scratch) — fwd at ViT-B-like shapes."""
        from dinounet_tpu.ops.dense_q8_pallas import qkv_q8_dmaj_fused

        tpu_export(
            lambda x, k, b: qkv_q8_dmaj_fused(x, k, b, 4, 32),
            S((2, 1029, 128), BF), S((128, 384), F32), S((384,), F32))

    def test_fused_rope_attention_both_layouts(self):
        from dinounet_tpu.ops.attention_pallas import (
            fused_rope_attention,
            fused_rope_attention_premapped,
        )

        N, Dh = 256, 64
        tpu_export(lambda qkv, s, c: fused_rope_attention(qkv, s, c),
                   S((2, N, 3, 2, Dh), BF), S((N, Dh), F32), S((N, Dh), F32))
        tpu_export(
            lambda qkv, s, c: fused_rope_attention_premapped(qkv, s, c),
            S((2, 3, 2, N, Dh), BF), S((N, Dh), F32), S((N, Dh), F32))

    def test_fused_rope_attention_dmaj(self):
        from dinounet_tpu.ops.attention_pallas import (
            fused_rope_attention_premapped_dmaj)

        N, Dh = 256, 64
        tpu_export(
            lambda qkv, s, c: fused_rope_attention_premapped_dmaj(qkv, s, c),
            S((2, 3, 2, Dh, N), BF), S((N, Dh), F32), S((N, Dh), F32))


def test_full_model_inference_export(monkeypatch):
    """Export the flagship inference forward in its full TPU configuration
    (all Pallas kernels + fused MSDA prep + decoder chain + SPM stem) at
    batch 2 — the whole-graph lowering gate for what bench.py runs."""
    monkeypatch.setenv("DINOUNET_TPU_MSDA_IMPL", "pallas")
    monkeypatch.setenv("DINOUNET_TPU_ATTN_IMPL", "pallas")
    monkeypatch.setenv("DINOUNET_TPU_DENSE_IMPL", "pallas")
    monkeypatch.setenv("DINOUNET_TPU_DECODER_TAIL", "pallas")
    monkeypatch.setenv("DINOUNET_TPU_SPM_CM", "pallas")
    monkeypatch.setenv("DINOUNET_TPU_MSDA_PREP", "fused")

    from dinounet_tpu.models.dinounet import (
        DINOV3_INTERACTION_INDEXES,
        DINOV3_MODEL_NAMES,
        DinoUNet,
        DinoUNetConfig,
    )
    from dinounet_tpu.models.vit import VIT_CONFIGS

    cfg = DinoUNetConfig(
        vit=VIT_CONFIGS[DINOV3_MODEL_NAMES["dinounet_s"]],
        interaction_indexes=DINOV3_INTERACTION_INDEXES["dinounet_s"],
        num_classes=3,
    )
    model = DinoUNet(cfg)
    x = S((2, 512, 512, 1), BF)
    variables = jax.eval_shape(
        lambda k, x: model.init(k, x, train=False),
        jax.random.PRNGKey(0), x)
    export.export(
        jax.jit(lambda v, x: model.apply(v, x, train=False)),
        platforms=["tpu"],
    )(variables, x)


def test_full_model_int8_inference_export(monkeypatch):
    """The int8 serving mode's whole-graph lowering gate: the w8a8 fused
    chain (int8 qkv einsum + bf16 attention kernel + q8 projections) through
    the full flagship forward."""
    monkeypatch.setenv("DINOUNET_TPU_MSDA_IMPL", "pallas")
    monkeypatch.setenv("DINOUNET_TPU_ATTN_IMPL", "pallas")
    monkeypatch.setenv("DINOUNET_TPU_DENSE_IMPL", "pallas")
    monkeypatch.setenv("DINOUNET_TPU_MSDA_PREP", "fused")
    monkeypatch.setenv("DINOUNET_TPU_VIT_INT8", "1")

    from dinounet_tpu.models.dinounet import (
        DINOV3_INTERACTION_INDEXES,
        DINOV3_MODEL_NAMES,
        DinoUNet,
        DinoUNetConfig,
    )
    from dinounet_tpu.models.vit import VIT_CONFIGS

    cfg = DinoUNetConfig(
        vit=VIT_CONFIGS[DINOV3_MODEL_NAMES["dinounet_s"]],
        interaction_indexes=DINOV3_INTERACTION_INDEXES["dinounet_s"],
        num_classes=3,
    )
    model = DinoUNet(cfg)
    x = S((2, 512, 512, 1), BF)
    variables = jax.eval_shape(
        lambda k, x: model.init(k, x, train=False),
        jax.random.PRNGKey(0), x)
    export.export(
        jax.jit(lambda v, x: model.apply(v, x, train=False)),
        platforms=["tpu"],
    )(variables, x)


def test_full_model_train_step_export(monkeypatch):
    """Export the training forward+backward (value_and_grad through the
    remat'd adapter and the Pallas custom VJPs) in the TPU kernel
    configuration — the lowering gate for the trainer's hot step."""
    monkeypatch.setenv("DINOUNET_TPU_MSDA_IMPL", "pallas")
    monkeypatch.setenv("DINOUNET_TPU_ATTN_IMPL", "pallas")
    monkeypatch.setenv("DINOUNET_TPU_DENSE_IMPL", "pallas")
    monkeypatch.setenv("DINOUNET_TPU_MSDA_PREP", "fused")

    from dinounet_tpu.models.dinounet import (
        DINOV3_INTERACTION_INDEXES,
        DINOV3_MODEL_NAMES,
        DinoUNet,
        DinoUNetConfig,
    )
    from dinounet_tpu.models.vit import VIT_CONFIGS
    from dinounet_tpu.training.losses import dc_and_ce_loss

    cfg = DinoUNetConfig(
        vit=VIT_CONFIGS[DINOV3_MODEL_NAMES["dinounet_s"]],
        interaction_indexes=DINOV3_INTERACTION_INDEXES["dinounet_s"],
        num_classes=3,
    )
    model = DinoUNet(cfg)
    x = S((2, 512, 512, 1), BF)
    seg = S((2, 512, 512), jnp.int32)
    variables = jax.eval_shape(
        lambda k, x: model.init(k, x, train=True),
        jax.random.PRNGKey(0), x)

    def step(variables, x, seg):
        def loss_of(params):
            out, mut = model.apply(
                {**variables, "params": params}, x, train=True,
                rngs={"dropout": jax.random.PRNGKey(1)},
                mutable=["batch_stats"],
            )
            if isinstance(out, (list, tuple)):
                out = out[0]
            return dc_and_ce_loss(out, seg), mut["batch_stats"]

        (loss, bs), grads = jax.value_and_grad(loss_of, has_aux=True)(
            variables["params"])
        return loss, grads, bs

    export.export(jax.jit(step), platforms=["tpu"])(variables, x, seg)


def test_dinounet_7b_inference_export(monkeypatch):
    """dinounet_7b exercises the kernel configurations the smaller models
    don't: head dim 128 in the attention kernel, SwiGLU FFN (plain dense
    path), 32 MSDA heads."""
    monkeypatch.setenv("DINOUNET_TPU_MSDA_IMPL", "pallas")
    monkeypatch.setenv("DINOUNET_TPU_ATTN_IMPL", "pallas")

    from dinounet_tpu.models.dinounet import (
        DINOV3_INTERACTION_INDEXES,
        DINOV3_MODEL_NAMES,
        DinoUNet,
        DinoUNetConfig,
    )
    from dinounet_tpu.models.vit import VIT_CONFIGS

    cfg = DinoUNetConfig(
        vit=VIT_CONFIGS[DINOV3_MODEL_NAMES["dinounet_7b"]],
        interaction_indexes=DINOV3_INTERACTION_INDEXES["dinounet_7b"],
        num_classes=3,
    )
    model = DinoUNet(cfg)
    x = S((1, 512, 512, 1), BF)
    variables = jax.eval_shape(
        lambda k, x: model.init(k, x, train=False),
        jax.random.PRNGKey(0), x)
    export.export(
        jax.jit(lambda v, x: model.apply(v, x, train=False)),
        platforms=["tpu"],
    )(variables, x)
