"""int8 fused dense kernels (ops/dense_q8_pallas) — the w8a8 serving twins of
the dense+residual+LN-stats kernels.

Runs the Pallas kernels in interpreter mode on CPU against the pure-jnp
reference formulations, checks the channel-major and row-major forms agree,
and runs the full int8 fused DinoViT path against both the unfused QuantDense
int8 path (same quantization scheme — must agree closely) and the fp path
(bounded int8 deviation, same budget as tests/test_vit_parity.py::TestInt8Mode).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def _rand(rng, shape, dtype=jnp.bfloat16, scale=1.0):
    return jnp.asarray(rng.normal(size=shape) * scale, dtype)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


class TestRowMajorKernels:
    @pytest.mark.parametrize("prologue", ["none", "gelu"])
    @pytest.mark.parametrize("shape", [(2, 21, 64, 48),    # row block > N
                                       (1, 64, 128, 64),   # divisible rows
                                       (2, 1029, 96, 64)])  # the tile N, ragged
    def test_dense_q8_matches_reference(self, rng, prologue, shape):
        from dinounet_tpu.ops.dense_q8_pallas import _reference_q8, dense_q8

        B, N, K, D = shape
        h = _rand(rng, (B, N, K))
        w = _rand(rng, (K, D), jnp.float32, 0.1)
        b = _rand(rng, (D,), jnp.float32, 0.1)
        out = dense_q8(h, w, b, prologue=prologue, interpret=True)
        ref = _reference_q8(h, w, b, prologue)
        # quantization boundaries are knife-edge: a 1-ulp difference in the
        # in-kernel scale division (or the A&S-vs-lax erf for the gelu
        # prologue) can flip an int8 level, so the contract is a one-level
        # deviation bound, not bit equality (unlike the bf16 kernels)
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(ref, np.float32),
                                   rtol=0.05, atol=0.05)

    @pytest.mark.parametrize("prologue", ["none", "gelu"])
    def test_residual_stats_matches_reference(self, rng, prologue):
        from dinounet_tpu.ops.dense_q8_pallas import (
            _reference_q8_stats, dense_q8_residual_stats)

        B, N, K, D = 2, 45, 64, 48
        h = _rand(rng, (B, N, K))
        w = _rand(rng, (K, D), jnp.float32, 0.1)
        b = _rand(rng, (D,), jnp.float32, 0.1)
        res = _rand(rng, (B, N, D))
        g = _rand(rng, (D,), jnp.float32, 0.01)
        out, mu, var = dense_q8_residual_stats(h, w, b, res, g,
                                               prologue=prologue,
                                               interpret=True)
        ro, rmu, rvar = _reference_q8_stats(h, w, b, res, g, prologue)
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(ro, np.float32),
                                   rtol=0.05, atol=0.05)
        np.testing.assert_allclose(np.asarray(mu), np.asarray(rmu), atol=2e-3)
        np.testing.assert_allclose(np.asarray(var), np.asarray(rvar),
                                   atol=4e-3)

    def test_stats_describe_output(self, rng):
        """mean/var must be usable as LayerNorm stats of the returned tensor."""
        from dinounet_tpu.ops.dense_q8_pallas import dense_q8_residual_stats

        h = _rand(rng, (2, 24, 32))
        w = _rand(rng, (32, 48), jnp.float32, 0.1)
        b = jnp.zeros((48,), jnp.float32)
        res = _rand(rng, (2, 24, 48))
        g = _rand(rng, (48,), jnp.float32, 0.01)
        out, mu, var = dense_q8_residual_stats(h, w, b, res, g,
                                               interpret=True)
        of = np.asarray(out, np.float32)
        np.testing.assert_allclose(np.asarray(mu), of.mean(-1), atol=2e-3)
        np.testing.assert_allclose(np.asarray(var), of.var(-1), atol=4e-3)

    def test_quantization_matches_quantdense(self, rng):
        """Same w8a8 scheme as models/vit.py::QuantDense — the fused and
        unfused int8 paths must produce the same linear-layer output."""
        from dinounet_tpu.models.vit import QuantDense
        from dinounet_tpu.ops.dense_q8_pallas import dense_q8

        x = jnp.asarray(rng.standard_normal((2, 37, 96)), jnp.float32)
        qd = QuantDense(48, dtype=jnp.float32)
        variables = qd.init(jax.random.PRNGKey(0), x)
        want = np.asarray(qd.apply(variables, x))
        got = np.asarray(dense_q8(
            x, variables["params"]["kernel"], variables["params"]["bias"],
            prologue="none", interpret=True))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    def test_custom_vjp_matches_reference(self, rng):
        from dinounet_tpu.ops.dense_q8_pallas import (
            _reference_q8_stats, dense_q8_residual_stats)

        h = _rand(rng, (1, 16, 32))
        w = _rand(rng, (32, 24), jnp.float32, 0.1)
        b = _rand(rng, (24,), jnp.float32, 0.1)
        res = _rand(rng, (1, 16, 24))
        g = _rand(rng, (24,), jnp.float32, 0.01)

        def loss_kernel(res_, g_):
            o, m, v = dense_q8_residual_stats(h, w, b, res_, g_,
                                              prologue="gelu", interpret=True)
            return (jnp.sum(o.astype(jnp.float32) ** 2)
                    + jnp.sum(m) + jnp.sum(v))

        def loss_ref(res_, g_):
            o, m, v = _reference_q8_stats(h, w, b, res_, g_, "gelu")
            return (jnp.sum(o.astype(jnp.float32) ** 2)
                    + jnp.sum(m) + jnp.sum(v))

        gr, gg = jax.grad(loss_kernel, argnums=(0, 1))(res, g)
        rr, rg = jax.grad(loss_ref, argnums=(0, 1))(res, g)
        np.testing.assert_allclose(np.asarray(gr, np.float32),
                                   np.asarray(rr, np.float32),
                                   rtol=0.05, atol=0.05)
        np.testing.assert_allclose(np.asarray(gg), np.asarray(rg),
                                   rtol=0.05, atol=0.05)


class TestChannelMajorKernel:
    @pytest.mark.parametrize("shape", [(2, 32, 48, 64),    # lane block > N
                                       (1, 64, 256, 128),  # divisible tokens
                                       (2, 48, 84, 96)])   # ragged tokens
    def test_matches_reference(self, rng, shape):
        from dinounet_tpu.ops.dense_q8_pallas import (
            _reference_cm_q8_stats, dense_cm_q8_residual_stats)

        B, K, N, D = shape
        h_t = _rand(rng, (B, K, N))
        w = _rand(rng, (K, D), jnp.float32, 0.1)
        b = _rand(rng, (D,), jnp.float32, 0.1)
        res = _rand(rng, (B, N, D))
        g = _rand(rng, (D,), jnp.float32, 0.01)
        out, mu, var = dense_cm_q8_residual_stats(h_t, w, b, res, g,
                                                  interpret=True)
        ro, rmu, rvar = _reference_cm_q8_stats(h_t, w, b, res, g)
        np.testing.assert_array_equal(np.asarray(out, np.float32),
                                      np.asarray(ro, np.float32))
        np.testing.assert_allclose(np.asarray(mu), np.asarray(rmu), atol=2e-3)
        np.testing.assert_allclose(np.asarray(var), np.asarray(rvar),
                                   atol=4e-3)

    def test_agrees_with_row_major_kernel(self, rng):
        """Channel-major (XLA-side quant) and row-major (in-kernel quant) see
        the same f32 activations, so their int8 levels — and outputs — must
        be identical on the transposed input."""
        from dinounet_tpu.ops.dense_q8_pallas import (
            dense_cm_q8_residual_stats, dense_q8_residual_stats)

        B, K, N, D = 2, 32, 40, 48
        h_t = _rand(rng, (B, K, N))
        w = _rand(rng, (K, D), jnp.float32, 0.1)
        b = _rand(rng, (D,), jnp.float32, 0.1)
        res = _rand(rng, (B, N, D))
        g = _rand(rng, (D,), jnp.float32, 0.01)
        o1, m1, v1 = dense_cm_q8_residual_stats(h_t, w, b, res, g,
                                                interpret=True)
        o2, m2, v2 = dense_q8_residual_stats(
            jnp.swapaxes(h_t, 1, 2), w, b, res, g, prologue="none",
            interpret=True)
        # XLA-side vs in-kernel quantization: same formulation, but 1-ulp
        # scale-division differences can flip knife-edge int8 levels
        np.testing.assert_allclose(np.asarray(o1, np.float32),
                                   np.asarray(o2, np.float32),
                                   rtol=0.05, atol=0.05)
        np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), atol=2e-3)
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=4e-3)


class TestQkvPremapped:
    def test_matches_quantdense_layout(self, rng):
        """The int8 premapped qkv must equal QuantDense's output rearranged
        into the attention kernel's (B, 3, M, N, Dh) layout (same scheme,
        modulo f32-vs-compute-dtype bias-add rounding)."""
        from dinounet_tpu.models.vit import QuantDense
        from dinounet_tpu.ops.dense_q8_pallas import qkv_q8_premapped

        B, N, C, M = 2, 21, 64, 4
        Dh = C // M
        x = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
        qd = QuantDense(3 * C, dtype=jnp.float32)
        variables = qd.init(jax.random.PRNGKey(0), x)
        flat = qd.apply(variables, x)  # (B, N, 3C)
        want = np.asarray(flat).reshape(B, N, 3, M, Dh).transpose(0, 2, 3, 1, 4)
        got = np.asarray(qkv_q8_premapped(
            x, variables["params"]["kernel"], variables["params"]["bias"],
            M, Dh))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_dmaj_is_ndh_transposed(self, rng):
        """qkv_q8_premapped_dmaj must be exactly the (B, 3, M, N, Dh) int8
        premapped output with its last two axes swapped (same quantization,
        same rescale — only the emitted layout differs), with and without
        bias. Round 4: this is what lets the int8 serving mode keep the
        dmaj attention layout default."""
        from dinounet_tpu.ops.dense_q8_pallas import (
            qkv_q8_premapped, qkv_q8_premapped_dmaj)

        B, N, C, M = 2, 21, 64, 4
        Dh = C // M
        x = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((C, 3 * C)), jnp.float32)
        b = jnp.asarray(rng.standard_normal((3 * C,)), jnp.float32)
        for bias in (b, None):
            ndh = np.asarray(qkv_q8_premapped(x, k, bias, M, Dh))
            dmaj = np.asarray(qkv_q8_premapped_dmaj(x, k, bias, M, Dh))
            np.testing.assert_array_equal(dmaj, ndh.transpose(0, 1, 2, 4, 3))

    def test_fused_kernel_matches_xla_dmaj(self, rng):
        """qkv_q8_dmaj_fused (in-kernel quantize + int8 dot + rescale,
        interpret mode) vs the XLA dmaj formulation: same rounding points
        and multiply order, so the int8 tensors are identical and the f32
        rescale agrees to ulp level (interpret vs XLA eager differ by FMA
        contraction only) — round 5."""
        from dinounet_tpu.ops.dense_q8_pallas import (
            qkv_q8_dmaj_fused, qkv_q8_premapped_dmaj)

        B, N, C, M = 2, 21, 64, 4
        Dh = C // M
        x = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((C, 3 * C)), jnp.float32)
        b = jnp.asarray(rng.standard_normal((3 * C,)), jnp.float32)
        for bias in (b, None):
            want = np.asarray(qkv_q8_premapped_dmaj(x, k, bias, M, Dh))
            got = np.asarray(qkv_q8_dmaj_fused(x, k, bias, M, Dh,
                                               interpret=True))
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_fused_kernel_bf16_matches_xla_dmaj(self, rng):
        """Same parity at the serving dtype (bf16 activations); the bf16
        output rounding may flip at f32-ulp ties, so compare at 1-bf16-ulp
        tolerance."""
        from dinounet_tpu.ops.dense_q8_pallas import (
            qkv_q8_dmaj_fused, qkv_q8_premapped_dmaj)

        B, N, C, M = 2, 37, 64, 4
        Dh = C // M
        x = jnp.asarray(rng.standard_normal((B, N, C)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((C, 3 * C)), jnp.float32)
        b = jnp.asarray(rng.standard_normal((3 * C,)), jnp.float32)
        want = np.asarray(qkv_q8_premapped_dmaj(x, k, b, M, Dh), np.float32)
        got = np.asarray(qkv_q8_dmaj_fused(x, k, b, M, Dh, interpret=True),
                         np.float32)
        np.testing.assert_allclose(got, want, rtol=8e-3, atol=8e-3)

    def test_fused_kernel_grads_finite(self, rng):
        """The custom VJP (reference-formulation pullback) produces finite
        grads of the right shapes — the backbone is frozen on every DinoUNet
        path, but jax.grad linearizes the whole graph first."""
        from dinounet_tpu.ops.dense_q8_pallas import qkv_q8_dmaj_fused

        B, N, C, M = 1, 16, 32, 2
        Dh = C // M
        x = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((C, 3 * C)), jnp.float32)
        b = jnp.asarray(rng.standard_normal((3 * C,)), jnp.float32)

        def loss(x_, k_, b_):
            return jnp.sum(qkv_q8_dmaj_fused(x_, k_, b_, M, Dh,
                                             interpret=True) ** 2)

        gx, gk, gb = jax.grad(loss, argnums=(0, 1, 2))(x, k, b)
        assert gx.shape == x.shape and gk.shape == k.shape
        assert gb.shape == b.shape
        for g in (gx, gk, gb):
            assert np.all(np.isfinite(np.asarray(g)))


class TestModelPath:
    def _setup(self, rng):
        from dinounet_tpu.models.vit import DinoViT, ViTConfig

        cfg = ViTConfig(embed_dim=64, depth=3, num_heads=2, ffn_ratio=2,
                        patch_size=16)
        model = DinoViT(cfg)
        x = _rand(rng, (2, 64, 64, 3), jnp.float32)
        return model, x

    def test_int8_fused_matches_int8_unfused(self, rng, monkeypatch):
        """Full int8 premapped fused chain (qkv int8 einsum + bf16 attention
        kernel + cm w8a8 projection + w8a8 fc1/fc2, interpret mode) vs the
        unfused QuantDense path: same quantization scheme, so they must agree
        to a few bf16 ulps. Param trees identical (shared checkpoints)."""
        model, x = self._setup(rng)

        monkeypatch.setenv("DINOUNET_TPU_VIT_INT8", "1")
        monkeypatch.setenv("DINOUNET_TPU_ATTN_IMPL", "jax")
        monkeypatch.setenv("DINOUNET_TPU_DENSE_IMPL", "jax")
        v1 = model.init(jax.random.PRNGKey(0), x, (0, 1, 2))
        ref = model.apply(v1, x, (0, 1, 2))

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
                                       np.asarray(pr, np.float32),
                                       rtol=0.05, atol=0.05)
            np.testing.assert_allclose(np.asarray(cg, np.float32),
                                       np.asarray(cr, np.float32),
                                       rtol=0.05, atol=0.05)

    def test_int8_fused_close_to_fp(self, rng, monkeypatch):
        """Same deviation budget as TestInt8Mode: cosine > 0.995 vs the fp
        fused path on random weights."""
        model, x = self._setup(rng)

        monkeypatch.setenv("DINOUNET_TPU_VIT_INT8", "0")
        monkeypatch.setenv("DINOUNET_TPU_ATTN_IMPL", "pallas")
        monkeypatch.setenv("DINOUNET_TPU_DENSE_IMPL", "interpret")
        variables = model.init(jax.random.PRNGKey(0), x, (2,))
        (ref_tokens, _), = model.apply(variables, x, (2,))

        monkeypatch.setenv("DINOUNET_TPU_VIT_INT8", "1")
        (q_tokens, _), = model.apply(variables, x, (2,))

        a = np.asarray(ref_tokens, np.float32).ravel()
        b = np.asarray(q_tokens, np.float32).ravel()
        assert np.all(np.isfinite(b))
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert cos > 0.995, cos

    def test_int8_qkv_optout(self, rng, monkeypatch):
        """DINOUNET_TPU_INT8_QKV=0 keeps the qkv einsum bf16 inside the int8
        fused path — output stays finite and close to the full-int8 variant."""
        model, x = self._setup(rng)

        monkeypatch.setenv("DINOUNET_TPU_VIT_INT8", "1")
        monkeypatch.setenv("DINOUNET_TPU_ATTN_IMPL", "pallas")
        monkeypatch.setenv("DINOUNET_TPU_DENSE_IMPL", "interpret")
        variables = model.init(jax.random.PRNGKey(0), x, (2,))
        (full, _), = model.apply(variables, x, (2,))

        monkeypatch.setenv("DINOUNET_TPU_INT8_QKV", "0")
        (mixed, _), = model.apply(variables, x, (2,))
        a = np.asarray(full, np.float32).ravel()
        b = np.asarray(mixed, np.float32).ravel()
        assert np.all(np.isfinite(b))
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert cos > 0.995, cos

    def test_int8_no_longer_forces_unfused(self, monkeypatch):
        from dinounet_tpu import configuration

        monkeypatch.setenv("DINOUNET_TPU_DENSE_IMPL", "pallas")
        monkeypatch.setenv("DINOUNET_TPU_VIT_INT8", "1")
        assert configuration.fused_dense_impl() == "pallas"
        assert configuration.use_fused_dense()


class TestAdapterInt8:
    """Round 4 (VERDICT r3 item 2b): the adapter extractors' fused junctions —
    MSDA output projection and ConvFFN GELU-fc2 — can swap to the w8a8 kernels.
    Since the round-4 perf verdict the extension is OPT-IN
    (DINOUNET_TPU_INT8_ADAPTER=1 in addition to VIT_INT8=1; default off because
    those matmuls are HBM-bound and dynamic quant there is pure overhead).
    Parity vs the bf16 fused path, identical param trees."""

    def _msda_args(self, rng):
        from dinounet_tpu.models.adapter import reference_points_for_grids

        B, Lq, C = 1, 80, 64  # queries = 8x8 + 4x4 pyramid = 80
        q = _rand(rng, (B, Lq, C))
        res = _rand(rng, (B, Lq, C))
        vals = _rand(rng, (B, 36, C))  # 6x6 value grid
        # already (1, Lq, 1, 2)
        ref_pts = jnp.asarray(reference_points_for_grids([(8, 8), (4, 4)]))
        return q, ref_pts, vals, [(6, 6)], res

    def test_msda_outproj_int8_close_to_bf16(self, rng, monkeypatch):
        from dinounet_tpu.models.adapter import MSDeformAttn

        monkeypatch.setenv("DINOUNET_TPU_MSDA_IMPL", "jax")
        monkeypatch.setenv("DINOUNET_TPU_DENSE_IMPL", "interpret")
        q, ref_pts, vals, shapes, res = self._msda_args(rng)
        attn = MSDeformAttn(d_model=64, n_heads=4, n_points=2)

        monkeypatch.setenv("DINOUNET_TPU_VIT_INT8", "0")
        v = attn.init(jax.random.PRNGKey(0), q, ref_pts, vals, shapes,
                      residual=res)
        out_fp, mu_fp, var_fp = attn.apply(v, q, ref_pts, vals, shapes,
                                           residual=res)

        monkeypatch.setenv("DINOUNET_TPU_VIT_INT8", "1")
        monkeypatch.setenv("DINOUNET_TPU_INT8_ADAPTER", "1")
        v8 = attn.init(jax.random.PRNGKey(0), q, ref_pts, vals, shapes,
                       residual=res)
        import jax.tree_util as jtu
        assert ({jtu.keystr(k): a.shape for k, a in jtu.tree_leaves_with_path(v)}
                == {jtu.keystr(k): a.shape
                    for k, a in jtu.tree_leaves_with_path(v8)})
        out_q8, mu_q8, var_q8 = attn.apply(v, q, ref_pts, vals, shapes,
                                           residual=res)
        # guard against a silent bf16 fallback: the w8a8 path must actually
        # perturb the output (quantization is not bit-exact)
        assert not np.array_equal(np.asarray(out_q8, np.float32),
                                  np.asarray(out_fp, np.float32))
        # int8 deviation budget: per-layer w8a8 rel-L2 is ~0.5%
        # (tools/int8_accuracy_experiment.py); the residual stream dominates
        # the output so the junction's absolute deviation stays small
        np.testing.assert_allclose(np.asarray(out_q8, np.float32),
                                   np.asarray(out_fp, np.float32),
                                   atol=0.05, rtol=0.05)
        np.testing.assert_allclose(np.asarray(mu_q8), np.asarray(mu_fp),
                                   atol=5e-3)
        np.testing.assert_allclose(np.asarray(var_q8), np.asarray(var_fp),
                                   atol=1e-2)

        # opt-out knob restores the bf16 kernels exactly
        monkeypatch.setenv("DINOUNET_TPU_INT8_ADAPTER", "0")
        out_opt, _, _ = attn.apply(v, q, ref_pts, vals, shapes, residual=res)
        np.testing.assert_array_equal(np.asarray(out_opt, np.float32),
                                      np.asarray(out_fp, np.float32))

    def test_convffn_fc2_int8_close_to_bf16(self, rng, monkeypatch):
        from dinounet_tpu.models.adapter import ConvFFN

        monkeypatch.setenv("DINOUNET_TPU_DENSE_IMPL", "interpret")
        B, C = 1, 64
        H, W = 8, 8  # the 1/16 grid; tokens live on 2Hx2W + HxW + H/2xW/2
        n = 21 * (H * W // 4)  # 336: DWConvMS's 21n token layout
        x = _rand(rng, (B, n, C))
        res = _rand(rng, (B, n, C))
        ffn = ConvFFN(dim=C, hidden=2 * C)

        monkeypatch.setenv("DINOUNET_TPU_VIT_INT8", "0")
        v = ffn.init(jax.random.PRNGKey(0), x, H, W, residual=res)
        out_fp, mu_fp, var_fp = ffn.apply(v, x, H, W, residual=res)

        monkeypatch.setenv("DINOUNET_TPU_VIT_INT8", "1")
        monkeypatch.setenv("DINOUNET_TPU_INT8_ADAPTER", "1")
        v8 = ffn.init(jax.random.PRNGKey(0), x, H, W, residual=res)
        import jax.tree_util as jtu
        assert ({jtu.keystr(k): a.shape for k, a in jtu.tree_leaves_with_path(v)}
                == {jtu.keystr(k): a.shape
                    for k, a in jtu.tree_leaves_with_path(v8)})
        out_q8, mu_q8, var_q8 = ffn.apply(v, x, H, W, residual=res)
        assert not np.array_equal(np.asarray(out_q8, np.float32),
                                  np.asarray(out_fp, np.float32))
        np.testing.assert_allclose(np.asarray(out_q8, np.float32),
                                   np.asarray(out_fp, np.float32),
                                   atol=0.05, rtol=0.05)
        np.testing.assert_allclose(np.asarray(mu_q8), np.asarray(mu_fp),
                                   atol=5e-3)
        np.testing.assert_allclose(np.asarray(var_q8), np.asarray(var_fp),
                                   atol=1e-2)
