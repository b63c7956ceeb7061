"""Scanned ViT block stack (round 4): the 40-block 7B graph exceeds the XLA
compile service's limits when unrolled (round-4 bisection: depth 4 compiles
in 13 s, depth 40 dies with an opaque compiler crash), so DinoViT runs deep
swiglu configs as ONE nn.scan body with depth-stacked params
(configuration.vit_scan_threshold, DINOUNET_TPU_VIT_SCAN).

ref: the torch reference unrolls its 40 blocks in Python
(/root/reference/dinounet/dinov3/models/vision_transformer.py:281-318) —
scan is the TPU/XLA-idiomatic equivalent, not a behavioral change.
"""

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import numpy as np
import pytest


def _cfg(**kw):
    from dinounet_tpu.models.vit import ViTConfig

    base = dict(embed_dim=64, depth=5, num_heads=2, ffn_ratio=2,
                patch_size=16, ffn_layer="swiglu")
    base.update(kw)
    return ViTConfig(**base)


@pytest.fixture
def x():
    return jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 64, 64, 3)), jnp.float32)


class TestScanParity:
    def test_matches_unrolled(self, x, monkeypatch):
        """Stacking the unrolled per-block params reproduces the unrolled
        outputs (bf16-ulp tolerance: fusion boundaries differ)."""
        from dinounet_tpu.models.vit import DinoViT

        model = DinoViT(_cfg())
        take = (1, 4)

        monkeypatch.setenv("DINOUNET_TPU_VIT_SCAN", "off")
        v = model.init(jax.random.PRNGKey(0), x, take)
        ref = model.apply(v, x, take)

        monkeypatch.setenv("DINOUNET_TPU_VIT_SCAN", "1")
        p = dict(v["params"])
        blocks = [p.pop(f"block{i}") for i in range(5)]
        p["blocks_scan"] = {
            "block": jtu.tree_map(lambda *ls: jnp.stack(ls), *blocks)}
        got = model.apply({"params": p}, x, take)
        for (rp, rc), (gp, gc) in zip(ref, got):
            np.testing.assert_allclose(np.asarray(gp, np.float32),
                                       np.asarray(rp, np.float32),
                                       atol=4e-3, rtol=4e-3)
            np.testing.assert_allclose(np.asarray(gc, np.float32),
                                       np.asarray(rc, np.float32),
                                       atol=4e-3, rtol=4e-3)

    def test_init_tree_matches_stacked_unrolled(self, x, monkeypatch):
        """The scan model's own init produces exactly the stacked tree
        shape (so checkpoints converted via stack_scan_blocks load)."""
        from dinounet_tpu.models.vit import DinoViT

        model = DinoViT(_cfg())
        take = (4,)
        monkeypatch.setenv("DINOUNET_TPU_VIT_SCAN", "off")
        v_unroll = jax.eval_shape(
            lambda k: model.init(k, x, take), jax.random.PRNGKey(0))
        monkeypatch.setenv("DINOUNET_TPU_VIT_SCAN", "1")
        v_scan = jax.eval_shape(
            lambda k: model.init(k, x, take), jax.random.PRNGKey(0))

        from dinounet_tpu.models.convert import stack_scan_blocks

        p = jtu.tree_map(lambda s: np.zeros(s.shape, s.dtype),
                         v_unroll["params"])
        stacked = stack_scan_blocks(p, 5)
        s1 = {jtu.keystr(k): v.shape
              for k, v in jtu.tree_leaves_with_path(v_scan["params"])}
        s2 = {jtu.keystr(k): v.shape
              for k, v in jtu.tree_leaves_with_path(stacked)}
        assert s1 == s2

    def test_mlp_configs_never_scan(self, x, monkeypatch):
        """Depth-24 mlp (ViT-L) keeps its unrolled tree even when the
        fused-dense knob is off — the layout must not depend on A/B knobs."""
        from dinounet_tpu.models.vit import DinoViT

        monkeypatch.setenv("DINOUNET_TPU_VIT_SCAN", "auto")
        monkeypatch.setenv("DINOUNET_TPU_DENSE_IMPL", "jax")
        model = DinoViT(_cfg(ffn_layer="mlp", depth=24))
        v = jax.eval_shape(
            lambda k: model.init(k, x, (23,)), jax.random.PRNGKey(0))
        assert "block23" in v["params"] and "blocks_scan" not in v["params"]

    def test_7b_config_scans_by_default(self):
        """The published 7B config lands on the scan path at default knobs."""
        from dinounet_tpu.configuration import vit_scan_threshold
        from dinounet_tpu.models.vit import VIT_CONFIGS

        cfg = VIT_CONFIGS["dinov3_vit7b16"]
        assert cfg.ffn_layer != "mlp"
        assert cfg.depth >= vit_scan_threshold()


class TestScanSharding:
    def test_megatron_specs_on_stacked_leaves(self):
        """The 7B megatron specs must shard the SAME dims on the scanned
        (depth-stacked) layout, with the depth axis replicated — a 2-D-only
        name match would silently replicate 13.5 GiB per chip."""
        import numpy as np
        from jax.sharding import PartitionSpec as P

        from dinounet_tpu.parallel.sharding import param_spec_tree

        D, E = 5, 64
        params = {"backbone": {"blocks_scan": {"block": {
            "attn": {"qkv": {"kernel": np.zeros((D, E, 3 * E)),
                             "bias": np.zeros((D, 3 * E))},
                     "proj": {"kernel": np.zeros((D, E, E)),
                              "bias": np.zeros((D, E))}},
            "mlp": {"w1": {"kernel": np.zeros((D, E, 2 * E))},
                    "w3": {"kernel": np.zeros((D, 2 * E, E))}},
        }}}}
        specs = param_spec_tree(params)
        blk = specs["backbone"]["blocks_scan"]["block"]
        assert blk["attn"]["qkv"]["kernel"] == P(None, None, "model")
        assert blk["attn"]["qkv"]["bias"] == P(None, "model")
        assert blk["attn"]["proj"]["kernel"] == P(None, "model", None)
        assert blk["attn"]["proj"]["bias"] == P(None)
        assert blk["mlp"]["w1"]["kernel"] == P(None, None, "model")
        assert blk["mlp"]["w3"]["kernel"] == P(None, "model", None)

    def test_unrolled_specs_unchanged(self):
        import numpy as np
        from jax.sharding import PartitionSpec as P

        from dinounet_tpu.parallel.sharding import param_spec_tree

        params = {"backbone": {"block0": {"attn": {"qkv": {
            "kernel": np.zeros((64, 192)), "bias": np.zeros((192,))}}}}}
        specs = param_spec_tree(params)
        q = specs["backbone"]["block0"]["attn"]["qkv"]
        assert q["kernel"] == P(None, "model")
        assert q["bias"] == P("model")


class TestScanExport:
    def test_tpu_export_scanned_small(self, x, monkeypatch):
        """Mosaic-serialization legality of the scanned graph (incl. the
        fused attention kernel inside the scan body)."""
        monkeypatch.setenv("DINOUNET_TPU_VIT_SCAN", "1")
        from dinounet_tpu.models.vit import DinoViT

        model = DinoViT(_cfg())
        take = (4,)
        v = jax.eval_shape(
            lambda k: model.init(k, x, take), jax.random.PRNGKey(0))
        S = jax.ShapeDtypeStruct
        jax.export.export(
            jax.jit(lambda p, a: model.apply(p, a, take)),
            platforms=["tpu"],
        )(jtu.tree_map(lambda s: S(s.shape, s.dtype), v),
          S(x.shape, x.dtype))
