"""Fused dense + LayerScale residual + LN-stats kernel (ops/dense_stats_pallas).

Runs the Pallas kernel in interpreter mode on CPU against the pure-jnp
reference formulation, and the stats-threaded DinoViT path against the plain
flax path (capability target: identical numerics to the unfused backbone,
ref dinov3/layers/block.py:83-125)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def _rand(rng, shape, dtype=jnp.bfloat16, scale=1.0):
    return jnp.asarray(rng.normal(size=shape) * scale, dtype)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


class TestKernel:
    @pytest.mark.parametrize("apply_gelu", [False, True])
    @pytest.mark.parametrize("shape", [(2, 21, 64, 48),   # row block > N
                                       (1, 48, 128, 64),  # divisible rows
                                       (2, 1029, 96, 64)])  # the tile N, ragged
    def test_matches_reference(self, rng, apply_gelu, shape):
        from dinounet_tpu.ops.dense_stats_pallas import (
            _reference, dense_residual_stats)

        B, N, K, D = shape
        h = _rand(rng, (B, N, K))
        w = _rand(rng, (K, D), jnp.float32, 0.1)
        b = _rand(rng, (D,), jnp.float32, 0.1)
        res = _rand(rng, (B, N, D))
        g = _rand(rng, (D,), jnp.float32, 0.01)
        out, mu, var = dense_residual_stats(h, w, b, res, g,
                                            apply_gelu=apply_gelu,
                                            interpret=True)
        ro, rmu, rvar = _reference(h, w, b, res, g, apply_gelu)
        # bf16 outputs must agree exactly (same rounding points)
        np.testing.assert_array_equal(np.asarray(out, np.float32),
                                      np.asarray(ro, np.float32))
        # stats may see pre-rounding values (compilers elide intermediate
        # bf16 rounds) — sub-ulp of the bf16 activations they describe
        np.testing.assert_allclose(np.asarray(mu), np.asarray(rmu), atol=2e-3)
        np.testing.assert_allclose(np.asarray(var), np.asarray(rvar), atol=4e-3)

    def test_chunked_gelu_matches_reference(self, rng, monkeypatch):
        """DINOUNET_TPU_MLP_GELU=chunked: K-chunked GELU+matmul unroll. The
        f32 accumulator regroups chunk partial sums, so the bf16 output may
        differ from the monolithic kernel by 1 ulp on rare elements — assert
        1-ulp closeness plus stats consistency with the stored output."""
        from dinounet_tpu.ops.dense_stats_pallas import (
            _reference, dense_residual_stats)

        monkeypatch.setenv("DINOUNET_TPU_MLP_GELU", "chunked")
        monkeypatch.setenv("DINOUNET_TPU_GELU_KBLK", "128")
        B, N, K, D = 2, 200, 256, 64  # 2 K-chunks of 128
        h = _rand(rng, (B, N, K))
        w = _rand(rng, (K, D), jnp.float32, 0.1)
        b = _rand(rng, (D,), jnp.float32, 0.1)
        res = _rand(rng, (B, N, D))
        g = _rand(rng, (D,), jnp.float32, 0.01)
        out, mu, var = dense_residual_stats(h, w, b, res, g,
                                            apply_gelu=True, interpret=True)
        ro, _, _ = _reference(h, w, b, res, g, True)
        of = np.asarray(out, np.float32)
        rf = np.asarray(ro, np.float32)
        np.testing.assert_allclose(of, rf, rtol=0.011, atol=1e-5)
        # the stats must still describe the *stored* tensor exactly
        np.testing.assert_allclose(np.asarray(mu), of.mean(-1), atol=2e-3)
        np.testing.assert_allclose(np.asarray(var), of.var(-1), atol=4e-3)

    def test_chunked_gelu_indivisible_k_falls_back(self, rng, monkeypatch):
        """K not divisible by any 128-multiple chunk -> monolithic kernel
        (bitwise-identical to the reference)."""
        from dinounet_tpu.ops.dense_stats_pallas import (
            _reference, dense_residual_stats)

        monkeypatch.setenv("DINOUNET_TPU_MLP_GELU", "chunked")
        h = _rand(rng, (1, 40, 96))
        w = _rand(rng, (96, 64), jnp.float32, 0.1)
        b = _rand(rng, (64,), jnp.float32, 0.1)
        res = _rand(rng, (1, 40, 64))
        g = _rand(rng, (64,), jnp.float32, 0.01)
        out, _, _ = dense_residual_stats(h, w, b, res, g,
                                         apply_gelu=True, interpret=True)
        ro, _, _ = _reference(h, w, b, res, g, True)
        np.testing.assert_array_equal(np.asarray(out, np.float32),
                                      np.asarray(ro, np.float32))

    def test_stats_describe_output(self, rng):
        """mean/var must be usable as LayerNorm stats of the returned tensor."""
        from dinounet_tpu.ops.dense_stats_pallas import dense_residual_stats

        h = _rand(rng, (2, 24, 32))
        w = _rand(rng, (32, 48), jnp.float32, 0.1)
        b = jnp.zeros((48,), jnp.float32)
        res = _rand(rng, (2, 24, 48))
        g = _rand(rng, (48,), jnp.float32, 0.01)
        out, mu, var = dense_residual_stats(h, w, b, res, g, interpret=True)
        of = np.asarray(out, np.float32)
        np.testing.assert_allclose(np.asarray(mu), of.mean(-1), atol=2e-3)
        np.testing.assert_allclose(np.asarray(var), of.var(-1), atol=4e-3)

    def test_erf_approximation(self):
        """The in-kernel A&S 7.1.26 erf tracks lax.erf to ~1.5e-7."""
        from dinounet_tpu.ops.dense_stats_pallas import _erf_as7126

        x = jnp.linspace(-6.0, 6.0, 4001, dtype=jnp.float32)
        got = np.asarray(_erf_as7126(x))
        want = np.asarray(jax.lax.erf(x))
        assert np.max(np.abs(got - want)) < 5e-7

    def test_custom_vjp_matches_reference(self, rng):
        from dinounet_tpu.ops.dense_stats_pallas import (
            _reference, dense_residual_stats)

        h = _rand(rng, (1, 16, 32))
        w = _rand(rng, (32, 24), jnp.float32, 0.1)
        b = _rand(rng, (24,), jnp.float32, 0.1)
        res = _rand(rng, (1, 16, 24))
        g = _rand(rng, (24,), jnp.float32, 0.01)

        def loss_kernel(h_, w_):
            o, m, v = dense_residual_stats(h_, w_, b, res, g,
                                           apply_gelu=True, interpret=True)
            return (jnp.sum(o.astype(jnp.float32) ** 2)
                    + jnp.sum(m) + jnp.sum(v))

        def loss_ref(h_, w_):
            o, m, v = _reference(h_, w_, b, res, g, True)
            return (jnp.sum(o.astype(jnp.float32) ** 2)
                    + jnp.sum(m) + jnp.sum(v))

        gh, gw = jax.grad(loss_kernel, argnums=(0, 1))(h, w)
        rh, rw = jax.grad(loss_ref, argnums=(0, 1))(h, w)
        np.testing.assert_allclose(np.asarray(gh, np.float32),
                                   np.asarray(rh, np.float32),
                                   rtol=0.05, atol=0.05)
        np.testing.assert_allclose(np.asarray(gw), np.asarray(rw),
                                   rtol=0.05, atol=0.05)


class TestModelPath:
    def test_fused_vit_matches_unfused(self, rng, monkeypatch):
        """DinoViT with the stats-threaded fused path (interpret mode) must
        match the plain flax path to bf16 ulp, with an identical param tree —
        the two paths share checkpoints."""
        from dinounet_tpu.models.vit import DinoViT, ViTConfig

        cfg = ViTConfig(embed_dim=64, depth=3, num_heads=2, ffn_ratio=2,
                        patch_size=16)
        model = DinoViT(cfg)
        x = _rand(rng, (2, 64, 64, 3), jnp.float32)

        monkeypatch.setenv("DINOUNET_TPU_DENSE_IMPL", "jax")
        v1 = model.init(jax.random.PRNGKey(0), x, (0, 1, 2))
        ref = model.apply(v1, x, (0, 1, 2))

        monkeypatch.setenv("DINOUNET_TPU_DENSE_IMPL", "interpret")
        v2 = model.init(jax.random.PRNGKey(0), x, (0, 1, 2))
        import jax.tree_util as jtu
        p1 = {jtu.keystr(k): a.shape for k, a in jtu.tree_leaves_with_path(v1)}
        p2 = {jtu.keystr(k): a.shape for k, a in jtu.tree_leaves_with_path(v2)}
        assert p1 == p2

        got = model.apply(v1, x, (0, 1, 2))
        for (pr, cr), (pg, cg) in zip(ref, got):
            np.testing.assert_allclose(np.asarray(pg, np.float32),
                                       np.asarray(pr, np.float32), atol=0.02)
            np.testing.assert_allclose(np.asarray(cg, np.float32),
                                       np.asarray(cr, np.float32), atol=0.02)

    def test_premapped_attention_path_matches_unfused(self, rng, monkeypatch):
        """The full premapped attention branch (qkv emitted (B,3,M,N,Dh),
        channel-major kernel output, cm fused projection) must match the
        plain flax path with an identical param tree."""
        from dinounet_tpu.models.vit import DinoViT, ViTConfig

        cfg = ViTConfig(embed_dim=64, depth=3, num_heads=2, ffn_ratio=2,
                        patch_size=16)
        model = DinoViT(cfg)
        x = _rand(rng, (2, 64, 64, 3), jnp.float32)

        monkeypatch.setenv("DINOUNET_TPU_ATTN_IMPL", "jax")
        monkeypatch.setenv("DINOUNET_TPU_DENSE_IMPL", "jax")
        v1 = model.init(jax.random.PRNGKey(0), x, (0, 1, 2))
        ref = model.apply(v1, x, (0, 1, 2))

        # ATTN pallas + DENSE interpret => the premapped branch with both
        # kernels in interpreter mode (CPU-runnable)
        monkeypatch.setenv("DINOUNET_TPU_ATTN_IMPL", "pallas")
        monkeypatch.setenv("DINOUNET_TPU_DENSE_IMPL", "interpret")
        v2 = model.init(jax.random.PRNGKey(0), x, (0, 1, 2))
        import jax.tree_util as jtu
        p1 = {jtu.keystr(k): a.shape for k, a in jtu.tree_leaves_with_path(v1)}
        p2 = {jtu.keystr(k): a.shape for k, a in jtu.tree_leaves_with_path(v2)}
        assert p1 == p2

        got = model.apply(v1, x, (0, 1, 2))
        for (pr, cr), (pg, cg) in zip(ref, got):
            np.testing.assert_allclose(np.asarray(pg, np.float32),
                                       np.asarray(pr, np.float32), atol=0.03)
            np.testing.assert_allclose(np.asarray(cg, np.float32),
                                       np.asarray(cr, np.float32), atol=0.03)

    def test_int8_mode_keeps_fused_path(self, monkeypatch):
        """Round 3: int8 serving mode no longer forces the unfused path — it
        swaps the w8a8 kernels (ops/dense_q8_pallas.py) into the fused chain;
        DINOUNET_TPU_DENSE_IMPL=jax remains the QuantDense fallback."""
        from dinounet_tpu import configuration

        monkeypatch.setenv("DINOUNET_TPU_DENSE_IMPL", "pallas")
        monkeypatch.setenv("DINOUNET_TPU_VIT_INT8", "1")
        assert configuration.fused_dense_impl() == "pallas"
        monkeypatch.setenv("DINOUNET_TPU_DENSE_IMPL", "jax")
        assert not configuration.use_fused_dense()


class TestChannelMajorKernel:
    @pytest.mark.parametrize("shape", [(2, 32, 48, 64),    # lane block > N
                                       (1, 64, 256, 128),  # divisible tokens
                                       (2, 48, 84, 96)])   # ragged tokens
    def test_matches_reference(self, rng, shape):
        from dinounet_tpu.ops.dense_stats_pallas import (
            _cm_reference, dense_cm_residual_stats)

        B, K, N, D = shape
        h_t = _rand(rng, (B, K, N))
        w = _rand(rng, (K, D), jnp.float32, 0.1)
        b = _rand(rng, (D,), jnp.float32, 0.1)
        res = _rand(rng, (B, N, D))
        g = _rand(rng, (D,), jnp.float32, 0.01)
        out, mu, var = dense_cm_residual_stats(h_t, w, b, res, g,
                                               interpret=True)
        ro, rmu, rvar = _cm_reference(h_t, w, b, res, g)
        np.testing.assert_array_equal(np.asarray(out, np.float32),
                                      np.asarray(ro, np.float32))
        np.testing.assert_allclose(np.asarray(mu), np.asarray(rmu), atol=2e-3)
        np.testing.assert_allclose(np.asarray(var), np.asarray(rvar), atol=4e-3)

    def test_agrees_with_row_major_kernel(self, rng):
        """The channel-major op must equal the row-major op on the transposed
        activations (unit LayerScale) — the two fused MSDA output-proj forms."""
        from dinounet_tpu.ops.dense_stats_pallas import (
            dense_cm_residual_stats, dense_residual_stats)

        B, K, N, D = 2, 32, 40, 48
        h_t = _rand(rng, (B, K, N))
        w = _rand(rng, (K, D), jnp.float32, 0.1)
        b = _rand(rng, (D,), jnp.float32, 0.1)
        res = _rand(rng, (B, N, D))
        g = _rand(rng, (D,), jnp.float32, 0.01)
        o1, m1, v1 = dense_cm_residual_stats(h_t, w, b, res, g, interpret=True)
        o2, m2, v2 = dense_residual_stats(
            jnp.swapaxes(h_t, 1, 2), w, b, res, g, interpret=True)
        np.testing.assert_array_equal(np.asarray(o1, np.float32),
                                      np.asarray(o2, np.float32))
        np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), atol=1e-6)
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-6)

    def test_custom_vjp_matches_reference(self, rng):
        from dinounet_tpu.ops.dense_stats_pallas import (
            _cm_reference, dense_cm_residual_stats)

        h_t = _rand(rng, (1, 32, 16))
        w = _rand(rng, (32, 24), jnp.float32, 0.1)
        b = _rand(rng, (24,), jnp.float32, 0.1)
        res = _rand(rng, (1, 16, 24))

        g = _rand(rng, (24,), jnp.float32, 0.5)

        def loss_kernel(h_, w_):
            o, m, v = dense_cm_residual_stats(h_, w_, b, res, g,
                                              interpret=True)
            return (jnp.sum(o.astype(jnp.float32) ** 2)
                    + jnp.sum(m) + jnp.sum(v))

        def loss_ref(h_, w_):
            o, m, v = _cm_reference(h_, w_, b, res, g)
            return (jnp.sum(o.astype(jnp.float32) ** 2)
                    + jnp.sum(m) + jnp.sum(v))

        gh, gw = jax.grad(loss_kernel, argnums=(0, 1))(h_t, w)
        rh, rw = jax.grad(loss_ref, argnums=(0, 1))(h_t, w)
        np.testing.assert_allclose(np.asarray(gh, np.float32),
                                   np.asarray(rh, np.float32),
                                   rtol=0.05, atol=0.05)
        np.testing.assert_allclose(np.asarray(gw), np.asarray(rw),
                                   rtol=0.05, atol=0.05)


class TestAdapterFusedPath:
    def test_fused_adapter_matches_unfused(self, rng, monkeypatch):
        """DINOv3Adapter with the stats-threaded fused extractor junctions
        (interpret mode, gather-core MSDA) must match the plain path closely,
        with an identical param tree (shared checkpoints)."""
        from dinounet_tpu.models.adapter import DINOv3Adapter

        E, B, H, W = 64, 2, 64, 64
        model = DINOv3Adapter(embed_dim=E, conv_inplane=16,
                              deform_num_heads=4, n_points=2,
                              drop_path_rate=0.0)
        x = _rand(rng, (B, H, W, 3), jnp.float32)
        n_tok = (H // 16) * (W // 16)
        outs = [( _rand(rng, (B, n_tok, E)), _rand(rng, (B, E)) )
                for _ in range(4)]

        monkeypatch.setenv("DINOUNET_TPU_DENSE_IMPL", "jax")
        v1 = model.init(jax.random.PRNGKey(0), x, outs)
        ref = model.apply(v1, x, outs)

        monkeypatch.setenv("DINOUNET_TPU_DENSE_IMPL", "interpret")
        v2 = model.init(jax.random.PRNGKey(0), x, outs)
        import jax.tree_util as jtu
        p1 = {jtu.keystr(k): a.shape for k, a in jtu.tree_leaves_with_path(v1)}
        p2 = {jtu.keystr(k): a.shape for k, a in jtu.tree_leaves_with_path(v2)}
        assert p1 == p2

        got = model.apply(v1, x, outs)
        for r, g in zip(ref, got):
            # a few bf16 ulps at O(2) magnitudes: the fused path's fp32 GELU
            # and stats-threaded LayerNorms round differently and the deltas
            # compound through the 6 chained extractors
            np.testing.assert_allclose(np.asarray(g, np.float32),
                                       np.asarray(r, np.float32),
                                       rtol=0.03, atol=0.04)

    def test_train_path_unchanged_by_dense_impl(self, rng, monkeypatch):
        """train=True never engages the fused junctions (drop_path semantics):
        outputs are identical whatever DINOUNET_TPU_DENSE_IMPL says."""
        from dinounet_tpu.models.adapter import DINOv3Adapter

        E, B, H, W = 64, 1, 64, 64
        model = DINOv3Adapter(embed_dim=E, conv_inplane=16,
                              deform_num_heads=4, n_points=2,
                              drop_path_rate=0.3)
        x = _rand(rng, (B, H, W, 3), jnp.float32)
        n_tok = (H // 16) * (W // 16)
        outs = [( _rand(rng, (B, n_tok, E)), _rand(rng, (B, E)) )
                for _ in range(4)]

        monkeypatch.setenv("DINOUNET_TPU_DENSE_IMPL", "jax")
        v1 = model.init(jax.random.PRNGKey(0), x, outs)

        def run():
            return model.apply(
                v1, x, outs, train=True,
                rngs={"dropout": jax.random.PRNGKey(7)},
                mutable=["batch_stats"])[0]

        ref = run()
        monkeypatch.setenv("DINOUNET_TPU_DENSE_IMPL", "interpret")
        got = run()
        for r, g in zip(ref, got):
            np.testing.assert_array_equal(np.asarray(g, np.float32),
                                          np.asarray(r, np.float32))
