"""Parity of the fused RoPE+attention Pallas kernel (interpret mode on CPU)
against the XLA einsum formulation in models/vit.py."""

import numpy as np
import pytest


@pytest.mark.parametrize("N,M,Dh,n_prefix", [(68, 4, 64, 4), (37, 2, 32, 5)])
def test_fused_matches_xla_path(rng, N, M, Dh, n_prefix):
    import jax.numpy as jnp

    from dinounet_tpu.models.vit import rope_apply, rope_sincos
    from dinounet_tpu.ops.attention_pallas import fused_rope_attention

    B = 2
    qkv = jnp.asarray(rng.standard_normal((B, N, 3, M, Dh)), jnp.float32)
    # rope tables with identity rows for the prefix tokens (as DinoViT builds)
    n_patches = N - n_prefix
    H = 1
    sin, cos = rope_sincos(H, n_patches, Dh)
    sin = jnp.concatenate([jnp.zeros((n_prefix, Dh), jnp.float32), sin])
    cos = jnp.concatenate([jnp.ones((n_prefix, Dh), jnp.float32), cos])

    got = fused_rope_attention(qkv, sin, cos, interpret=True)

    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    q = rope_apply(q, sin[:, None, :], cos[:, None, :])
    k = rope_apply(k, sin[:, None, :], cos[:, None, :])
    scores = jnp.einsum("bnmd,bkmd->bmnk", q, k) * (Dh ** -0.5)
    probs = jnp.exp(scores - scores.max(-1, keepdims=True))
    probs = probs / probs.sum(-1, keepdims=True)
    want = jnp.einsum("bmnk,bkmd->bnmd", probs, v)

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_no_rope(rng):
    import jax.numpy as jnp

    from dinounet_tpu.ops.attention_pallas import fused_rope_attention

    B, N, M, Dh = 1, 24, 2, 32
    qkv = jnp.asarray(rng.standard_normal((B, N, 3, M, Dh)), jnp.float32)
    got = fused_rope_attention(qkv, None, None, interpret=True)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    scores = jnp.einsum("bnmd,bkmd->bmnk", q, k) * (Dh ** -0.5)
    probs = jnp.exp(scores - scores.max(-1, keepdims=True))
    probs = probs / probs.sum(-1, keepdims=True)
    want = jnp.einsum("bmnk,bkmd->bnmd", probs, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_grad_matches_xla_path(rng):
    """The custom VJP (recompute-based) must match grads of the einsum path —
    needed because jax.grad linearizes the whole graph even though every
    DinoUNet path stop_gradients the backbone outputs."""
    import jax
    import jax.numpy as jnp

    from dinounet_tpu.models.vit import rope_apply, rope_sincos
    from dinounet_tpu.ops.attention_pallas import fused_rope_attention

    B, N, M, Dh, n_prefix = 1, 21, 2, 32, 5
    qkv = jnp.asarray(rng.standard_normal((B, N, 3, M, Dh)), jnp.float32)
    sin, cos = rope_sincos(1, N - n_prefix, Dh)
    sin = jnp.concatenate([jnp.zeros((n_prefix, Dh), jnp.float32), sin])
    cos = jnp.concatenate([jnp.ones((n_prefix, Dh), jnp.float32), cos])

    def loss_fused(qkv):
        return jnp.sum(fused_rope_attention(qkv, sin, cos, interpret=True) ** 2)

    def loss_ref(qkv):
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q = rope_apply(q, sin[:, None, :], cos[:, None, :])
        k = rope_apply(k, sin[:, None, :], cos[:, None, :])
        s = jnp.einsum("bnmd,bkmd->bmnk", q, k) * (Dh ** -0.5)
        p = jnp.exp(s - s.max(-1, keepdims=True))
        p = p / p.sum(-1, keepdims=True)
        return jnp.sum(jnp.einsum("bmnk,bkmd->bnmd", p, v) ** 2)

    g1 = jax.grad(loss_fused)(qkv)
    g2 = jax.grad(loss_ref)(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("N,M,Dh,n_prefix", [(68, 4, 64, 4), (37, 2, 32, 5)])
def test_premapped_matches_legacy_kernel(rng, N, M, Dh, n_prefix):
    """The premapped kernel ((B,3,M,N,Dh) in, channel-major (B,M,Dh,N) out)
    must agree with the row-major kernel on relaid-out inputs."""
    import jax.numpy as jnp

    from dinounet_tpu.models.vit import rope_sincos
    from dinounet_tpu.ops.attention_pallas import (
        fused_rope_attention, fused_rope_attention_premapped)

    B = 2
    qkv = jnp.asarray(rng.standard_normal((B, N, 3, M, Dh)), jnp.float32)
    n_patches = N - n_prefix
    sin, cos = rope_sincos(1, n_patches, Dh)
    sin = jnp.concatenate([jnp.zeros((n_prefix, Dh), jnp.float32), sin])
    cos = jnp.concatenate([jnp.ones((n_prefix, Dh), jnp.float32), cos])

    want = fused_rope_attention(qkv, sin, cos, interpret=True)  # (B,N,M,Dh)

    qkv_t = jnp.transpose(qkv, (0, 2, 3, 1, 4))  # (B, 3, M, N, Dh)
    got = fused_rope_attention_premapped(qkv_t, sin, cos, interpret=True)
    got = jnp.transpose(got, (0, 3, 1, 2))  # (B,M,Dh,N) -> (B,N,M,Dh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_premapped_grad_matches_reference(rng):
    import jax
    import jax.numpy as jnp

    from dinounet_tpu.ops.attention_pallas import (
        _xla_reference_pm, fused_rope_attention_premapped)

    B, N, M, Dh = 1, 24, 2, 32
    qkv_t = jnp.asarray(rng.standard_normal((B, 3, M, N, Dh)), jnp.float32)
    sin = jnp.asarray(rng.standard_normal((N, Dh)) * 0.1, jnp.float32)
    cos = jnp.ones((N, Dh), jnp.float32)

    def loss_kernel(q):
        return jnp.sum(
            fused_rope_attention_premapped(q, None, None, interpret=True) ** 2)

    def loss_ref(q):
        return jnp.sum(_xla_reference_pm(
            q, jnp.zeros((N, Dh), jnp.float32), jnp.ones((N, Dh), jnp.float32)
        ) ** 2)

    g1 = jax.grad(loss_kernel)(qkv_t)
    g2 = jax.grad(loss_ref)(qkv_t)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               atol=1e-4, rtol=1e-3)


@pytest.mark.parametrize("N,M,Dh,n_prefix", [(68, 4, 64, 4), (37, 2, 32, 5)])
def test_dmaj_matches_legacy_kernel(rng, N, M, Dh, n_prefix):
    """The Dh-major premapped kernel ((B,3,M,Dh,N) in, (B,M,Dh,N) out) must
    agree with the row-major kernel on relaid-out inputs."""
    import jax.numpy as jnp

    from dinounet_tpu.models.vit import rope_sincos
    from dinounet_tpu.ops.attention_pallas import (
        fused_rope_attention, fused_rope_attention_premapped_dmaj)

    B = 2
    qkv = jnp.asarray(rng.standard_normal((B, N, 3, M, Dh)), jnp.float32)
    n_patches = N - n_prefix
    sin, cos = rope_sincos(1, n_patches, Dh)
    sin = jnp.concatenate([jnp.zeros((n_prefix, Dh), jnp.float32), sin])
    cos = jnp.concatenate([jnp.ones((n_prefix, Dh), jnp.float32), cos])

    want = fused_rope_attention(qkv, sin, cos, interpret=True)  # (B,N,M,Dh)

    qkv_t = jnp.transpose(qkv, (0, 2, 3, 4, 1))  # (B, 3, M, Dh, N)
    got = fused_rope_attention_premapped_dmaj(qkv_t, sin, cos, interpret=True)
    got = jnp.transpose(got, (0, 3, 1, 2))  # (B,M,Dh,N) -> (B,N,M,Dh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_dmaj_grad_matches_reference(rng):
    import jax
    import jax.numpy as jnp

    from dinounet_tpu.ops.attention_pallas import (
        _xla_reference_dmaj, fused_rope_attention_premapped_dmaj)

    B, N, M, Dh = 1, 24, 2, 32
    qkv_t = jnp.asarray(rng.standard_normal((B, 3, M, Dh, N)), jnp.float32)

    def loss_kernel(q):
        return jnp.sum(fused_rope_attention_premapped_dmaj(
            q, None, None, interpret=True) ** 2)

    def loss_ref(q):
        return jnp.sum(_xla_reference_dmaj(
            q, jnp.zeros((Dh, N), jnp.float32), jnp.ones((Dh, N), jnp.float32)
        ) ** 2)

    g1 = jax.grad(loss_kernel)(qkv_t)
    g2 = jax.grad(loss_ref)(qkv_t)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               atol=1e-4, rtol=1e-3)


def test_vit_block_dmaj_and_xla_gelu_match_defaults(rng, monkeypatch):
    """The dmaj attention layout and the xla GELU placement are pure layout/
    scheduling changes: a ViT block must produce (near-)identical outputs
    under them (f32 compute dtype; interpret-mode kernels on CPU)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from dinounet_tpu.models.vit import VIT_CONFIGS, DinoViT

    cfg = dataclasses.replace(
        VIT_CONFIGS["dinov3_vits16"], dtype="float32", depth=2)
    model = DinoViT(cfg)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
    take = [1]

    monkeypatch.setenv("DINOUNET_TPU_MSDA_IMPL", "jax")
    monkeypatch.setenv("DINOUNET_TPU_ATTN_IMPL", "pallas")
    monkeypatch.setenv("DINOUNET_TPU_DENSE_IMPL", "interpret")
    variables = model.init(jax.random.PRNGKey(0), x, take)

    ref = model.apply(variables, x, take)

    monkeypatch.setenv("DINOUNET_TPU_ATTN_LAYOUT", "dmaj")
    got_dmaj = model.apply(variables, x, take)
    monkeypatch.setenv("DINOUNET_TPU_ATTN_LAYOUT", "ndh")
    monkeypatch.setenv("DINOUNET_TPU_MLP_GELU", "xla")
    got_gelu = model.apply(variables, x, take)

    for got, name in [(got_dmaj, "dmaj"), (got_gelu, "xla-gelu")]:
        r = np.asarray(jax.tree_util.tree_leaves(ref)[0])
        g = np.asarray(jax.tree_util.tree_leaves(got)[0])
        np.testing.assert_allclose(g, r, atol=5e-5, rtol=1e-4, err_msg=name)
