"""ResidualEncoderUNet + ResEncUNetPlanner tests."""

import jax
import jax.numpy as jnp
import numpy as np

from dinounet_tpu.models.residual_unet import ResidualEncoderUNet, ResidualUNetConfig
from dinounet_tpu.planning.resenc_planner import ResEncUNetPlanner


def _tiny_cfg(**overrides):
    base = dict(
        num_classes=3,
        features_per_stage=(8, 16, 32),
        kernel_sizes=((3, 3),) * 3,
        strides=((1, 1), (2, 2), (2, 2)),
        n_blocks_per_stage=(1, 3, 4),
        n_conv_per_stage_decoder=(1, 1),
        dtype="float32",
    )
    base.update(overrides)
    return ResidualUNetConfig(**base)


class TestResidualEncoderUNet:
    def test_forward_shape(self):
        model = ResidualEncoderUNet(_tiny_cfg())
        x = jnp.zeros((2, 32, 32, 1))
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        out = model.apply(variables, x, train=False)
        assert out.shape == (2, 32, 32, 3)
        assert np.isfinite(np.asarray(out)).all()

    def test_block_counts(self):
        """Each encoder stage carries its planned number of residual blocks."""
        model = ResidualEncoderUNet(_tiny_cfg())
        x = jnp.zeros((1, 32, 32, 1))
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        params = variables["params"]
        for s, n in enumerate((1, 3, 4)):
            blocks = [k for k in params if k.startswith(f"enc{s}_block")]
            assert len(blocks) == n

    def test_from_plans_arch(self):
        arch = {
            "n_stages": 3,
            "features_per_stage": [8, 16, 32],
            "kernel_sizes": [[3, 3]] * 3,
            "strides": [[1, 1], [2, 2], [2, 2]],
            "n_conv_per_stage": [1, 3, 4],
            "n_conv_per_stage_decoder": [1, 1],
            "conv_bias": True,
            "norm_op": "torch.nn.modules.instancenorm.InstanceNorm2d",
            "norm_op_kwargs": {"eps": 1e-5, "affine": True},
            "nonlin": "torch.nn.LeakyReLU",
            "nonlin_kwargs": {"inplace": True},
        }
        cfg = ResidualUNetConfig.from_plans_arch(arch, num_classes=2)
        assert cfg.n_blocks_per_stage == (1, 3, 4)
        assert cfg.norm == "instancenorm"

    def test_gradients_flow(self):
        model = ResidualEncoderUNet(_tiny_cfg())
        x = jnp.ones((1, 16, 16, 1))
        variables = model.init(jax.random.PRNGKey(0), x, train=True)

        def loss(p):
            out = model.apply({"params": p}, x, train=True)
            if isinstance(out, (list, tuple)):
                out = out[0]
            return (out.astype(jnp.float32) ** 2).mean()

        grads = jax.grad(loss)(variables["params"])
        norms = [float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads)]
        assert any(n > 0 for n in norms)


class TestResEncPlannerConstants:
    def test_constants(self):
        # constructor requires a dataset on disk; check class-level deltas via
        # a bare instance
        planner = object.__new__(ResEncUNetPlanner)
        # simulate the attribute assignments from __init__ without dataset IO
        ExperimentPlannerInitDefaults = {
            "UNet_reference_val_3d": 680000000,
            "UNet_reference_val_2d": 135000000,
        }
        # verify via the class source instead: the subclass must override these
        import inspect

        src = inspect.getsource(ResEncUNetPlanner)
        for k, v in ExperimentPlannerInitDefaults.items():
            assert str(v) in src and k in src
        assert "ResidualEncoderUNet" in src

    def test_data_identifier_reuse(self, tmp_path, monkeypatch):
        planner = object.__new__(ResEncUNetPlanner)
        planner.plans_identifier = "nnUNetResEncUNetPlans"
        assert planner.generate_data_identifier("2d") == "nnUNetPlans_2d"
        assert planner.generate_data_identifier("3d_fullres") == "nnUNetPlans_3d_fullres"
        assert (planner.generate_data_identifier("3d_lowres")
                == "nnUNetResEncUNetPlans_3d_lowres")
