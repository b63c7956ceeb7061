"""MSDeformAttn parity + gradient tests.

Port of the reference's only real test
(ref: dinounet/dinov3/eval/segmentation/models/utils/ops/test.py:36-121):
forward parity against an independent oracle and gradient checks, adapted to
the TPU stack: torch.grid_sample is the external oracle for the pure-JAX core,
and the Pallas kernel (interpret mode on CPU) is checked against that core.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dinounet_tpu.ops.msda import ms_deform_attn_core
from dinounet_tpu.ops.msda_pallas import ms_deform_attn_pallas


def _random_inputs(rng, B=2, M=4, D=8, P=4, shapes=((6, 7), (3, 4)), Lq=11):
    S = sum(h * w for h, w in shapes)
    L = len(shapes)
    value = rng.standard_normal((B, S, M, D)).astype(np.float32)
    loc = rng.uniform(-0.2, 1.2, (B, Lq, M, L, P, 2)).astype(np.float32)
    attn = rng.uniform(0, 1, (B, Lq, M, L, P)).astype(np.float32)
    attn /= attn.reshape(B, Lq, M, -1).sum(-1).reshape(B, Lq, M, 1, 1)
    return value, loc, attn, shapes


def _torch_oracle(value, shapes, loc, attn):
    """Independent re-statement of the reference pytorch core
    (ref: ms_deform_attn.py:71-92) using torch.grid_sample."""
    import torch
    import torch.nn.functional as F

    value = torch.from_numpy(value)
    loc = torch.from_numpy(loc)
    attn = torch.from_numpy(attn)
    N_, S_, M_, D_ = value.shape
    _, Lq_, _, L_, P_, _ = loc.shape
    value_list = value.split([h * w for h, w in shapes], dim=1)
    grids = 2 * loc - 1
    sampled = []
    for lid, (H, W) in enumerate(shapes):
        v = value_list[lid].flatten(2).transpose(1, 2).reshape(N_ * M_, D_, H, W)
        g = grids[:, :, :, lid].transpose(1, 2).flatten(0, 1)
        s = F.grid_sample(v, g, mode="bilinear", padding_mode="zeros", align_corners=False)
        sampled.append(s)
    aw = attn.transpose(1, 2).reshape(N_ * M_, 1, Lq_, L_ * P_)
    out = (torch.stack(sampled, dim=-2).flatten(-2) * aw).sum(-1).view(N_, M_ * D_, Lq_)
    return out.transpose(1, 2).contiguous().numpy()


class TestForwardParity:
    def test_jax_core_vs_torch_grid_sample(self, rng):
        torch = pytest.importorskip("torch")  # noqa: F841
        value, loc, attn, shapes = _random_inputs(rng)
        ref = _torch_oracle(value, shapes, loc, attn)
        got = np.asarray(
            ms_deform_attn_core(jnp.array(value), shapes, jnp.array(loc), jnp.array(attn))
        )
        np.testing.assert_allclose(ref, got, rtol=1e-5, atol=1e-5)

    def test_pallas_vs_jax_core(self, rng):
        value, loc, attn, shapes = _random_inputs(rng, B=2, M=3, D=8, Lq=37,
                                                  shapes=((8, 16), (4, 8)))
        ref = ms_deform_attn_core(jnp.array(value), shapes, jnp.array(loc), jnp.array(attn))
        got = ms_deform_attn_pallas(jnp.array(value), shapes, jnp.array(loc),
                                    jnp.array(attn), True)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got), rtol=1e-5, atol=1e-5)

    def test_single_level(self, rng):
        """DinoUNet's operating point: one value level (the ViT token grid)."""
        value, loc, attn, shapes = _random_inputs(rng, B=1, M=2, D=4, Lq=21,
                                                  shapes=((4, 4),))
        ref = ms_deform_attn_core(jnp.array(value), shapes, jnp.array(loc), jnp.array(attn))
        got = ms_deform_attn_pallas(jnp.array(value), shapes, jnp.array(loc),
                                    jnp.array(attn), True)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got), rtol=1e-5, atol=1e-5)


class TestGradients:
    def test_core_grads_numerical(self, rng):
        """check_grads equivalent of the reference gradcheck (test.py:92-121)."""
        from jax.test_util import check_grads

        value, loc, attn, shapes = _random_inputs(rng, B=1, M=2, D=4, Lq=5,
                                                  shapes=((5, 5),))
        # keep locations away from the bilinear kinks (integer grid lines)
        loc = np.round(loc * 20) / 20 + 0.013
        f = lambda v, l, a: ms_deform_attn_core(v, shapes, l, a)
        check_grads(f, (jnp.array(value), jnp.array(loc), jnp.array(attn)),
                    order=1, modes=["rev"], atol=1e-2, rtol=1e-2)

    def test_pallas_custom_vjp_matches_core(self, rng):
        value, loc, attn, shapes = _random_inputs(rng, B=2, M=3, D=8, Lq=37,
                                                  shapes=((8, 16), (4, 8)))
        args = (jnp.array(value), jnp.array(loc), jnp.array(attn))
        f1 = lambda v, l, a: (ms_deform_attn_pallas(v, shapes, l, a, True) ** 2).sum()
        f2 = lambda v, l, a: (ms_deform_attn_core(v, shapes, l, a) ** 2).sum()
        g1 = jax.grad(f1, argnums=(0, 1, 2))(*args)
        g2 = jax.grad(f2, argnums=(0, 1, 2))(*args)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


class TestPallasBackwardKernel:
    """The col2im-equivalent Pallas backward (grad_value/grad_loc/grad_attn)
    against the gather core's autodiff VJP (ref backward semantics:
    ms_deform_im2col_cuda.cuh:307-928)."""

    def test_vjp_outputs_match_core_vjp(self, rng):
        from dinounet_tpu.ops.msda_pallas import _pallas_backward

        value, loc, attn, shapes = _random_inputs(rng, B=2, M=3, D=8, Lq=29,
                                                  shapes=((8, 16), (4, 8)))
        g = rng.standard_normal((2, 29, 3 * 8)).astype(np.float32)
        args = (jnp.array(value), jnp.array(loc), jnp.array(attn))
        _, vjp = jax.vjp(lambda v, l, a: ms_deform_attn_core(v, shapes, l, a), *args)
        gv_c, gl_c, ga_c = vjp(jnp.array(g))
        gv_p, gl_p, ga_p = _pallas_backward(*args[:1], shapes, *args[1:],
                                            jnp.array(g), interpret=True)
        np.testing.assert_allclose(np.asarray(gv_p), np.asarray(gv_c),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gl_p), np.asarray(gl_c),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(ga_p), np.asarray(ga_c),
                                   rtol=1e-4, atol=1e-5)

    def test_query_block_boundary(self, rng):
        """Lq > BLK_Q exercises padding + multi-block grad_value accumulation."""
        from dinounet_tpu.ops.msda_pallas import BLK_Q, _pallas_backward

        Lq = BLK_Q + 17
        value, loc, attn, shapes = _random_inputs(rng, B=1, M=2, D=4, Lq=Lq,
                                                  shapes=((6, 8),), P=2)
        g = rng.standard_normal((1, Lq, 2 * 4)).astype(np.float32)
        args = (jnp.array(value), jnp.array(loc), jnp.array(attn))
        _, vjp = jax.vjp(lambda v, l, a: ms_deform_attn_core(v, shapes, l, a), *args)
        gv_c, gl_c, ga_c = vjp(jnp.array(g))
        gv_p, gl_p, ga_p = _pallas_backward(*args[:1], shapes, *args[1:],
                                            jnp.array(g), interpret=True)
        np.testing.assert_allclose(np.asarray(gv_p), np.asarray(gv_c),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gl_p), np.asarray(gl_c),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(ga_p), np.asarray(ga_c),
                                   rtol=1e-4, atol=1e-5)


class TestPremappedLayout:
    """ms_deform_attn_pallas_premapped (kernel-native layouts, coords in pixel
    space, no padding when Lq divides a lane-aligned block) vs the gather
    core — forward and custom-VJP gradients."""

    @staticmethod
    def _premap(value, shapes, loc, attn):
        B, S, M, D = value.shape
        _, Lq, _, L, P, _ = loc.shape
        sizes = np.array([[w, h] for (h, w) in shapes], np.float32)
        unnorm = loc * sizes[None, None, None, :, None, :] - 0.5
        xs = unnorm[..., 0].transpose(0, 2, 3, 4, 1).reshape(B, M, L * P, Lq)
        ys = unnorm[..., 1].transpose(0, 2, 3, 4, 1).reshape(B, M, L * P, Lq)
        aw = attn.transpose(0, 2, 3, 4, 1).reshape(B, M, L * P, Lq)
        v = value.transpose(0, 2, 3, 1)
        return v, xs, ys, aw

    @pytest.mark.parametrize("Lq", [37, 128, 256])
    def test_forward_matches_core(self, rng, Lq):
        from dinounet_tpu.ops.msda_pallas import ms_deform_attn_pallas_premapped

        value, loc, attn, shapes = _random_inputs(
            rng, B=2, M=3, D=8, Lq=Lq, shapes=((8, 16), (4, 8)))
        ref = np.asarray(ms_deform_attn_core(
            jnp.array(value), shapes, jnp.array(loc), jnp.array(attn)))
        v, xs, ys, aw = self._premap(value, shapes, loc, attn)
        out_t = ms_deform_attn_pallas_premapped(
            jnp.array(v), shapes, jnp.array(xs), jnp.array(ys),
            jnp.array(aw), True)
        B, M, D, _ = v.shape
        got = np.asarray(out_t).transpose(0, 3, 1, 2).reshape(2, Lq, M * D)
        np.testing.assert_allclose(ref, got, rtol=1e-5, atol=1e-5)

    def test_grads_match_core(self, rng):
        from dinounet_tpu.ops.msda_pallas import ms_deform_attn_pallas_premapped

        value, loc, attn, shapes = _random_inputs(
            rng, B=1, M=2, D=4, Lq=29, shapes=((6, 8),), P=2)
        v, xs, ys, aw = self._premap(value, shapes, loc, attn)
        B, M, D, _ = v.shape
        Lq = 29

        def f_pre(v_, xs_, ys_, aw_):
            out = ms_deform_attn_pallas_premapped(v_, shapes, xs_, ys_, aw_, True)
            return (out ** 2).sum()

        def f_core(v_, xs_, ys_, aw_):
            # rebuild reference layouts from premapped ones (pure jnp ops)
            sizes = np.array([[w, h] for (h, w) in shapes], np.float32)
            L, P = len(shapes), xs_.shape[2] // len(shapes)
            val = v_.transpose(0, 3, 1, 2)
            x_n = ((xs_ + 0.5).reshape(B, M, L, P, Lq)
                   / sizes[None, None, :, None, 0:1])
            y_n = ((ys_ + 0.5).reshape(B, M, L, P, Lq)
                   / sizes[None, None, :, None, 1:2])
            loc_ = jnp.stack([x_n, y_n], -1).transpose(0, 4, 1, 2, 3, 5)
            attn_ = aw_.reshape(B, M, L, P, Lq).transpose(0, 4, 1, 2, 3)
            return (ms_deform_attn_core(val, shapes, loc_, attn_) ** 2).sum()

        args = (jnp.array(v), jnp.array(xs), jnp.array(ys), jnp.array(aw))
        g_pre = jax.grad(f_pre, argnums=(0, 1, 2, 3))(*args)
        g_core = jax.grad(f_core, argnums=(0, 1, 2, 3))(*args)
        for a, b in zip(g_pre, g_core):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)

    def test_blk_q_selection(self):
        from dinounet_tpu.ops.msda_pallas import BLK_Q, _pick_blk_q

        assert _pick_blk_q(5376) == 384   # DinoUNet 512^2: 21*(512/32)^2, exact
        assert _pick_blk_q(1024) == 512
        assert _pick_blk_q(768) == 384
        assert _pick_blk_q(37) == BLK_Q   # generic: pad path


class TestModuleBranchParity:
    """The adapter's MSDeformAttn premapped (TPU) branch and the Dense/gather
    (CPU) branch must produce identical outputs from identical params."""

    def test_premapped_branch_matches_dense_branch(self, rng, monkeypatch):
        from dinounet_tpu.models.adapter import (
            MSDeformAttn,
            reference_points_for_grids,
        )
        from dinounet_tpu.ops import msda_pallas

        # route the premapped kernels through interpret mode on CPU (both
        # entries: DINOUNET_TPU_MSDA_PREP defaults to "fused" since round 3)
        orig = msda_pallas._forward_premapped
        monkeypatch.setattr(
            msda_pallas, "_forward_premapped",
            lambda v, s, xs, ys, aw, interp=False, out_dtype=jnp.float32:
                orig(v, s, xs, ys, aw, True, out_dtype))
        orig_fused = msda_pallas._forward_premapped_fused
        monkeypatch.setattr(
            msda_pallas, "_forward_premapped_fused",
            lambda v, s, off, logits, base, interp=False,
            out_dtype=jnp.float32:
                orig_fused(v, s, off, logits, base, True, out_dtype))
        orig_merged = msda_pallas._forward_premapped_fused_merged
        monkeypatch.setattr(
            msda_pallas, "_forward_premapped_fused_merged",
            lambda v, s, packed, base, interp=False, out_dtype=jnp.float32:
                orig_merged(v, s, packed, base, True, out_dtype))

        B, Lq, E = 2, 21, 32
        shapes = ((4, 4),)
        query = jnp.asarray(rng.standard_normal((B, Lq, E)), jnp.float32)
        tokens = jnp.asarray(rng.standard_normal((B, 16, E)), jnp.float32)
        ref_pts = jnp.asarray(
            reference_points_for_grids([(4, 4), (2, 2), (1, 1)]))  # 21 pts
        mod = MSDeformAttn(d_model=E, n_heads=4, n_points=2, ratio=0.5,
                           dtype=jnp.float32)

        monkeypatch.setenv("DINOUNET_TPU_MSDA_IMPL", "jax")
        variables = mod.init(jax.random.PRNGKey(0), query, ref_pts, tokens, shapes)
        out_dense = mod.apply(variables, query, ref_pts, tokens, shapes)

        monkeypatch.setenv("DINOUNET_TPU_MSDA_IMPL", "pallas")
        # param trees must be interchangeable between branches
        variables_p = mod.init(jax.random.PRNGKey(0), query, ref_pts, tokens, shapes)
        assert jax.tree_util.tree_structure(variables) == \
            jax.tree_util.tree_structure(variables_p)
        out_pre = mod.apply(variables, query, ref_pts, tokens, shapes)

        np.testing.assert_allclose(np.asarray(out_dense), np.asarray(out_pre),
                                   rtol=2e-5, atol=2e-5)


def test_bf16_build_parity(rng, monkeypatch):
    """Opt-in bf16 W-build (DINOUNET_TPU_MSDA_BF16=1): parity with the core at
    the reference test's own fp tolerance (ref ops/test.py:36-89 uses rtol
    1e-2 / atol 1e-3 for the sub-fp32 path)."""
    from dinounet_tpu.ops.msda_pallas import ms_deform_attn_pallas_premapped

    value, loc, attn, shapes = _random_inputs(
        rng, B=2, M=3, D=8, Lq=128, shapes=((8, 16), (4, 8)))
    ref = np.asarray(ms_deform_attn_core(
        jnp.array(value), shapes, jnp.array(loc), jnp.array(attn)))
    v, xs, ys, aw = TestPremappedLayout._premap(value, shapes, loc, attn)
    monkeypatch.setenv("DINOUNET_TPU_MSDA_BF16", "1")
    out_t = ms_deform_attn_pallas_premapped(
        jnp.array(v), shapes, jnp.array(xs), jnp.array(ys), jnp.array(aw), True)
    got = np.asarray(out_t).transpose(0, 3, 1, 2).reshape(2, 128, 3 * 8)
    np.testing.assert_allclose(ref, got, rtol=2e-2, atol=2e-2)


class TestFusedPrep:
    """ms_deform_attn_pallas_premapped_fused (in-kernel cast + base add +
    softmax over raw projection outputs) vs the XLA-prep premapped path —
    forward and custom-VJP gradients, including the analytic softmax chain."""

    @staticmethod
    def _fused_inputs(rng, B=2, M=3, D=8, Lq=128, shapes=((8, 16), (4, 8)),
                      P=2, dtype=jnp.float32):
        S = sum(h * w for h, w in shapes)
        L = len(shapes)
        v = jnp.asarray(rng.standard_normal((B, M, D, S)), dtype)
        off = jnp.asarray(
            rng.uniform(-2.0, 2.0, (B, M, 2 * L * P, Lq)), dtype)
        logits = jnp.asarray(rng.standard_normal((B, M, L * P, Lq)), dtype)
        # base: per level, a plausible in-range reference grid fold
        rows = []
        for (h, w) in shapes:
            bx = rng.uniform(0, w - 1, (Lq,))
            by = rng.uniform(0, h - 1, (Lq,))
            for _ in range(P):
                rows.append(bx)
                rows.append(by)
        # order must be (level, point) major with x/y interleaved
        base = np.empty((2 * L * P, Lq), np.float32)
        idx = 0
        for lvl in range(L):
            bx = rows[2 * lvl * P]
            by = rows[2 * lvl * P + 1]
            for p in range(P):
                base[idx] = bx
                base[idx + 1] = by
                idx += 2
        return v, off, logits, jnp.asarray(base), shapes

    @staticmethod
    def _xla_prep(off, logits, base):
        xs = off[:, :, 0::2, :].astype(jnp.float32) + base[0::2]
        ys = off[:, :, 1::2, :].astype(jnp.float32) + base[1::2]
        aw = jax.nn.softmax(logits.astype(jnp.float32), axis=2)
        return xs, ys, aw

    @pytest.mark.parametrize("Lq", [37, 128])
    def test_forward_matches_unfused(self, rng, Lq):
        from dinounet_tpu.ops.msda_pallas import (
            ms_deform_attn_pallas_premapped,
            ms_deform_attn_pallas_premapped_fused,
        )

        v, off, logits, base, shapes = self._fused_inputs(rng, Lq=Lq)
        xs, ys, aw = self._xla_prep(off, logits, base)
        ref = ms_deform_attn_pallas_premapped(v, shapes, xs, ys, aw, True)
        got = ms_deform_attn_pallas_premapped_fused(
            v, shapes, off, logits, base, True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_forward_matches_unfused_bf16_inputs(self, rng):
        """bf16 offsets/logits (the adapter's projection dtype): the fused
        kernel's in-VMEM f32 cast must match the XLA-side cast exactly."""
        from dinounet_tpu.ops.msda_pallas import (
            ms_deform_attn_pallas_premapped,
            ms_deform_attn_pallas_premapped_fused,
        )

        v, off, logits, base, shapes = self._fused_inputs(
            rng, Lq=128, dtype=jnp.bfloat16)
        xs, ys, aw = self._xla_prep(off, logits, base)
        ref = ms_deform_attn_pallas_premapped(
            v, shapes, xs, ys, aw, True, jnp.bfloat16)
        got = ms_deform_attn_pallas_premapped_fused(
            v, shapes, off, logits, base, True, jnp.bfloat16)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            rtol=0, atol=0)

    def test_grads_match_composed_chain(self, rng):
        """d/d{value, off, logits} through the fused custom_vjp must equal
        JAX differentiating the XLA prep + unfused premapped custom_vjp."""
        from dinounet_tpu.ops.msda_pallas import (
            ms_deform_attn_pallas_premapped,
            ms_deform_attn_pallas_premapped_fused,
        )

        v, off, logits, base, shapes = self._fused_inputs(
            rng, B=1, M=2, D=4, Lq=29, shapes=((6, 8),), P=2)

        def f_fused(v_, off_, logits_):
            out = ms_deform_attn_pallas_premapped_fused(
                v_, shapes, off_, logits_, base, True)
            return (out ** 2).sum()

        def f_chain(v_, off_, logits_):
            xs, ys, aw = self._xla_prep(off_, logits_, base)
            out = ms_deform_attn_pallas_premapped(v_, shapes, xs, ys, aw, True)
            return (out ** 2).sum()

        g_fused = jax.grad(f_fused, argnums=(0, 1, 2))(v, off, logits)
        g_chain = jax.grad(f_chain, argnums=(0, 1, 2))(v, off, logits)
        for a, b in zip(g_fused, g_chain):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("merged", ["0", "1"])
    def test_module_fused_branch_matches_dense_branch(self, rng, monkeypatch,
                                                      merged):
        """MSDeformAttn with DINOUNET_TPU_MSDA_PREP=fused == the Dense/gather
        branch from identical params (the fused analogue of
        TestModuleBranchParity) — with and without the round-5 merged
        offsets+logits projection, which must keep the param tree and output
        identical."""
        from dinounet_tpu.models.adapter import (
            MSDeformAttn,
            reference_points_for_grids,
        )
        from dinounet_tpu.ops import msda_pallas

        orig = msda_pallas._forward_premapped_fused
        monkeypatch.setattr(
            msda_pallas, "_forward_premapped_fused",
            lambda v, s, off, logits, base, interp=False,
                   out_dtype=jnp.float32:
                orig(v, s, off, logits, base, True, out_dtype))
        orig_m = msda_pallas._forward_premapped_fused_merged
        monkeypatch.setattr(
            msda_pallas, "_forward_premapped_fused_merged",
            lambda v, s, packed, base, interp=False, out_dtype=jnp.float32:
                orig_m(v, s, packed, base, True, out_dtype))

        B, Lq, E = 2, 21, 32
        shapes = ((4, 4),)
        query = jnp.asarray(rng.standard_normal((B, Lq, E)), jnp.float32)
        tokens = jnp.asarray(rng.standard_normal((B, 16, E)), jnp.float32)
        ref_pts = jnp.asarray(
            reference_points_for_grids([(4, 4), (2, 2), (1, 1)]))
        mod = MSDeformAttn(d_model=E, n_heads=4, n_points=2, ratio=0.5,
                           dtype=jnp.float32)

        monkeypatch.setenv("DINOUNET_TPU_MSDA_IMPL", "jax")
        variables = mod.init(jax.random.PRNGKey(0), query, ref_pts, tokens,
                             shapes)
        out_dense = mod.apply(variables, query, ref_pts, tokens, shapes)

        monkeypatch.setenv("DINOUNET_TPU_MSDA_IMPL", "pallas")
        monkeypatch.setenv("DINOUNET_TPU_MSDA_PREP", "fused")
        monkeypatch.setenv("DINOUNET_TPU_MSDA_MERGED_PROJ", merged)
        variables_f = mod.init(jax.random.PRNGKey(0), query, ref_pts, tokens,
                               shapes)
        assert jax.tree_util.tree_structure(variables) == \
            jax.tree_util.tree_structure(variables_f)
        out_fused = mod.apply(variables, query, ref_pts, tokens, shapes)

        np.testing.assert_allclose(np.asarray(out_dense),
                                   np.asarray(out_fused),
                                   rtol=2e-5, atol=2e-5)

    @staticmethod
    def _pack(off, logits):
        B, M, LP2, Lq = off.shape
        LP = logits.shape[2]
        return jnp.concatenate([off, logits], axis=2)

    @pytest.mark.parametrize("Lq", [37, 128])
    def test_merged_forward_matches_unmerged(self, rng, Lq):
        """The merged-buffer kernel == the separate-buffer fused kernel,
        bitwise (same in-VMEM prep, only the BlockSpec source differs)."""
        from dinounet_tpu.ops.msda_pallas import (
            ms_deform_attn_pallas_premapped_fused,
            ms_deform_attn_pallas_premapped_fused_merged,
        )

        v, off, logits, base, shapes = self._fused_inputs(rng, Lq=Lq)
        ref = ms_deform_attn_pallas_premapped_fused(
            v, shapes, off, logits, base, True)
        got = ms_deform_attn_pallas_premapped_fused_merged(
            v, shapes, self._pack(off, logits), base, True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=0, atol=0)

    def test_merged_grads_match_unmerged(self, rng):
        """d/d{value, packed} through the merged custom_vjp must equal the
        separate-buffer fused custom_vjp's grads, re-packed."""
        from dinounet_tpu.ops.msda_pallas import (
            ms_deform_attn_pallas_premapped_fused,
            ms_deform_attn_pallas_premapped_fused_merged,
        )

        v, off, logits, base, shapes = self._fused_inputs(
            rng, B=1, M=2, D=4, Lq=29, shapes=((6, 8),), P=2)
        packed = self._pack(off, logits)

        def f_merged(v_, packed_):
            out = ms_deform_attn_pallas_premapped_fused_merged(
                v_, shapes, packed_, base, True)
            return (out ** 2).sum()

        def f_sep(v_, packed_):
            LP = packed_.shape[2] // 3
            out = ms_deform_attn_pallas_premapped_fused(
                v_, shapes, packed_[:, :, :2 * LP], packed_[:, :, 2 * LP:],
                base, True)
            return (out ** 2).sum()

        g_m = jax.grad(f_merged, argnums=(0, 1))(v, packed)
        g_s = jax.grad(f_sep, argnums=(0, 1))(v, packed)
        for a, b in zip(g_m, g_s):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-5)
