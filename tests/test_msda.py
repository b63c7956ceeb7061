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
