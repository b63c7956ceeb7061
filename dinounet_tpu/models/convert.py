"""DINOv3 torch checkpoint -> flax params conversion.

Covers the reference's pretrained-weight loading path
(ref: dinounet_training.py:51-75 load_dinov3_model + hub/backbones.py weight
loading): converts a published DINOv3 ``.pth`` state dict into this framework's
backbone parameter tree, saved as msgpack for fast loading.

Key mappings (torch -> flax):
  patch_embed.proj.{weight,bias}      -> patch_embed.{kernel (kh,kw,in,out), bias}
  cls_token / storage_tokens          -> same names
  blocks.N.norm1.{weight,bias}        -> blockN.norm1.{scale,bias}
  blocks.N.attn.qkv.{weight,bias}     -> blockN.attn.qkv.{kernel (in,out)=W.T, bias}
    (the `mask_k_bias` trick folds in here: effective bias = bias * bias_mask,
     zeroing the k section once at conversion — ref layers/attention.py:30-40)
  blocks.N.attn.proj                  -> blockN.attn.proj
  blocks.N.ls{1,2}.gamma              -> blockN.ls{1,2}_gamma
  blocks.N.mlp.{fc1,fc2}|{w1,w2,w3}   -> blockN.mlp.{fc1,fc2}|{w1,w2,w3}
  norm.{weight,bias}                  -> norm.{scale,bias}
  rope_embed.periods                  -> recomputed analytically (verified equal)
"""

import json
import os
import pickle
from typing import Dict, Mapping, Optional, Sequence

import numpy as np

from dinounet_tpu.models.vit import VIT_CONFIGS, ViTConfig

# State-dict keys that are legitimately NOT converted:
#   mask_token        — SSL masking only, never used on the DinoUNet path
#   rope_embed.periods — recomputed analytically (verified equal, test_vit_parity)
#   local_cls_norm.*  — untied local-crop cls norm (7B/SAT-L); the adapter path
#                       goes through get_intermediate_layers, which applies the
#                       global `norm` (ref vision_transformer.py:281-318)
IGNORED_CHECKPOINT_KEYS = ("mask_token", "rope_embed.periods",
                           "local_cls_norm.weight", "local_cls_norm.bias")

_MANIFEST_PATH = os.path.join(os.path.dirname(__file__), "checkpoint_manifest.json")


def checkpoint_manifest(model_name: str) -> Dict[str, list]:
    """Golden key→shape map of the published checkpoint for `model_name`
    (generated from the reference model definitions by
    tools/gen_checkpoint_manifest.py; hyperparams from
    ref hub/backbones.py:201-237,279-317,318-373,452-494)."""
    with open(_MANIFEST_PATH) as f:
        manifest = json.load(f)
    if model_name not in manifest:
        raise KeyError(f"no manifest for {model_name}; have {sorted(manifest)}")
    return manifest[model_name]


def verify_state_dict_against_manifest(
        shapes: Mapping[str, Sequence[int]], model_name: str) -> None:
    """Validate a checkpoint's key/shape table against the golden manifest.

    `shapes`: key -> shape (e.g. {k: v.shape for k, v in state_dict.items()}).
    Raises ValueError listing missing / unexpected / mis-shaped keys, so a
    broken or truncated download is caught before conversion."""
    expected = checkpoint_manifest(model_name)
    missing = sorted(set(expected) - set(shapes))
    unexpected = sorted(set(shapes) - set(expected))
    mis_shaped = sorted(
        k for k in set(expected) & set(shapes)
        if list(shapes[k]) != list(expected[k]))
    if missing or unexpected or mis_shaped:
        msgs = []
        if missing:
            msgs.append(f"missing keys: {missing[:10]}{'...' if len(missing) > 10 else ''}")
        if unexpected:
            msgs.append(f"unexpected keys: {unexpected[:10]}{'...' if len(unexpected) > 10 else ''}")
        if mis_shaped:
            msgs.append("mis-shaped: " + ", ".join(
                f"{k} {list(shapes[k])}!={expected[k]}" for k in mis_shaped[:10]))
        raise ValueError(
            f"checkpoint does not match the published {model_name} layout: "
            + "; ".join(msgs))


def _dense(sd, torch_name: str, use_bias: bool = True) -> Dict[str, np.ndarray]:
    out = {"kernel": np.ascontiguousarray(sd[torch_name + ".weight"].T)}
    if use_bias and torch_name + ".bias" in sd:
        out["bias"] = sd[torch_name + ".bias"]
    return out


class _TrackingDict(dict):
    """Records key accesses so conversion can prove it consumed everything."""

    def __init__(self, d):
        super().__init__(d)
        self.accessed = set()

    def __getitem__(self, k):
        self.accessed.add(k)
        return super().__getitem__(k)


def convert_dinov3_state_dict(sd: Dict[str, np.ndarray], cfg: ViTConfig,
                              strict: bool = False) -> dict:
    """torch state dict (numpy values) -> flax backbone params subtree.

    strict=True raises if any checkpoint key outside IGNORED_CHECKPOINT_KEYS
    is left unconsumed (a key-map drift would otherwise silently drop
    pretrained weights)."""
    if not isinstance(sd, _TrackingDict):
        sd = _TrackingDict({k: np.asarray(v) for k, v in sd.items()})
    params = {}

    w = sd["patch_embed.proj.weight"]  # (E, 3, p, p)
    params["patch_embed"] = {
        "kernel": np.ascontiguousarray(w.transpose(2, 3, 1, 0)),
        "bias": sd["patch_embed.proj.bias"],
    }
    params["cls_token"] = sd["cls_token"]
    params["storage_tokens"] = sd["storage_tokens"]

    for i in range(cfg.depth):
        p = f"blocks.{i}."
        blk = {}
        blk["norm1"] = {"scale": sd[p + "norm1.weight"], "bias": sd[p + "norm1.bias"]}
        blk["norm2"] = {"scale": sd[p + "norm2.weight"], "bias": sd[p + "norm2.bias"]}

        qkv = _dense(sd, p + "attn.qkv", use_bias=cfg.qkv_bias)
        mask_name = p + "attn.qkv.bias_mask"
        if cfg.qkv_bias and mask_name in sd and "bias" in qkv:
            mask = sd[mask_name]
            if np.all(np.isfinite(mask)):
                qkv["bias"] = qkv["bias"] * mask
        attn = {"qkv": qkv, "proj": _dense(sd, p + "attn.proj")}
        blk["attn"] = attn
        blk["ls1_gamma"] = sd[p + "ls1.gamma"]
        blk["ls2_gamma"] = sd[p + "ls2.gamma"]
        if cfg.ffn_layer == "mlp":
            blk["mlp"] = {
                "fc1": _dense(sd, p + "mlp.fc1"),
                "fc2": _dense(sd, p + "mlp.fc2"),
            }
        else:
            blk["mlp"] = {
                "w1": _dense(sd, p + "mlp.w1"),
                "w2": _dense(sd, p + "mlp.w2"),
                "w3": _dense(sd, p + "mlp.w3"),
            }
        params[f"block{i}"] = blk

    params["norm"] = {"scale": sd["norm.weight"], "bias": sd["norm.bias"]}

    unused = set(sd) - sd.accessed - set(IGNORED_CHECKPOINT_KEYS)
    if unused and strict:
        raise ValueError(
            f"{len(unused)} checkpoint key(s) were not converted (key-map "
            f"drift would drop pretrained weights): {sorted(unused)[:10]}")
    return params


def _torch_to_numpy(t):
    """torch tensor -> numpy, keeping bf16 as ml_dtypes.bfloat16 (no fp32
    blow-up: the 7B checkpoint stays ~14 GB instead of ~28 GB through the
    conversion — SURVEY.md §7 hard part 7)."""
    import torch

    if t.dtype == torch.bfloat16:
        import ml_dtypes

        return t.view(torch.uint16).numpy().view(ml_dtypes.bfloat16)
    return t.numpy()


def stack_scan_blocks(params: dict, depth: int) -> dict:
    """Re-layout unrolled per-block params (block0..block{depth-1}) into the
    scanned-backbone layout (blocks_scan/block with a leading depth axis) —
    the param tree DinoViT uses when configuration.vit_scan_threshold puts
    the model on the lax.scan path (the 40-block 7B graph; round 4).
    Exactly inverse-free: stacking the unrolled leaves reproduces the
    scanned model's outputs bit-for-bit (tests/test_vit_scan.py)."""
    import jax.tree_util as jtu

    out = {k: v for k, v in params.items() if not k.startswith("block")}
    blocks = [params[f"block{i}"] for i in range(depth)]
    out["blocks_scan"] = {
        "block": jtu.tree_map(lambda *ls: np.stack(ls), *blocks)}
    return out


def unstack_scan_blocks(params: dict) -> dict:
    """Inverse of stack_scan_blocks: blocks_scan/block (leading depth axis)
    back to unrolled block0..block{depth-1}. Lets a checkpoint converted in
    the stacked layout load into an unrolled model (and vice versa via
    stack_scan_blocks) — the layout is a runtime choice, never baked into
    the artifact (ADVICE r4)."""
    import jax.tree_util as jtu

    out = {k: v for k, v in params.items() if k != "blocks_scan"}
    stacked = params["blocks_scan"]["block"]
    depth = jtu.tree_leaves(stacked)[0].shape[0]
    for i in range(depth):
        out[f"block{i}"] = jtu.tree_map(lambda l, i=i: np.asarray(l[i]),
                                        stacked)
    return out


def adapt_backbone_layout(loaded: dict, current: dict) -> dict:
    """Re-layout loaded backbone params (stacked blocks_scan vs unrolled
    blockN) to match the layout the current model instance uses. Both
    layouts hold identical leaves (tests/test_vit_scan.py), so this is a
    pure restructuring; checkpoints stay loadable regardless of the
    DINOUNET_TPU_VIT_SCAN env they were converted under."""
    loaded_stacked = "blocks_scan" in loaded
    current_stacked = "blocks_scan" in current
    if loaded_stacked and not current_stacked:
        return unstack_scan_blocks(loaded)
    if current_stacked and not loaded_stacked:
        depth = sum(1 for k in loaded if k.startswith("block")
                    and k != "blocks_scan")
        return stack_scan_blocks(loaded, depth)
    return loaded


def convert_torch_checkpoint(pth_path: str, model_name: str, out_path: str,
                             verify: bool = True,
                             scan_layout: Optional[bool] = None) -> None:
    """Convert a published DINOv3 .pth into our msgpack backbone params.
    model_name: dinov3_vits16 | dinov3_vitb16 | dinov3_vitl16 | dinov3_vit7b16.

    verify=True first validates every key/shape against the golden manifest
    (checkpoint_manifest.json) and then requires the converter to consume all
    non-ignored keys — a broken download or key-map drift fails loudly instead
    of producing a silently-partial conversion.

    scan_layout=None emits the layout the runtime will use (stacked
    blocks_scan when the model's depth reaches configuration.
    vit_scan_threshold on the non-fused path — i.e. the 7B); True/False
    force the stacked/unrolled layout. Either layout loads into either
    model layout: load_dinov3_params_into re-layouts on demand via
    adapt_backbone_layout, so the conversion-time env never bakes an
    unloadable artifact."""
    import torch

    cfg = VIT_CONFIGS[model_name]
    # mmap keeps tensor data on disk until each is touched (7B-friendly)
    try:
        state_dict = torch.load(pth_path, map_location="cpu", weights_only=True,
                                mmap=True)
    except (TypeError, RuntimeError):
        state_dict = torch.load(pth_path, map_location="cpu", weights_only=True)
    if verify:
        verify_state_dict_against_manifest(
            {k: tuple(v.shape) for k, v in state_dict.items()}, model_name)
    sd = {k: _torch_to_numpy(v) for k, v in state_dict.items()}
    params = convert_dinov3_state_dict(sd, cfg, strict=verify)
    if scan_layout is None:
        from dinounet_tpu.configuration import vit_scan_threshold

        scan_layout = (cfg.ffn_layer != "mlp"
                       and cfg.depth >= vit_scan_threshold())
    if scan_layout:
        params = stack_scan_blocks(params, cfg.depth)
    save_backbone_params(params, out_path)


def save_backbone_params(params: dict, out_path: str) -> None:
    from flax import serialization

    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with open(out_path, "wb") as f:
        f.write(serialization.msgpack_serialize(params))


def load_backbone_params(path: str) -> dict:
    from flax import serialization

    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def main(argv=None) -> None:
    """CLI: python -m dinounet_tpu.models.convert <pth> <model_name> <out>
    (add --verify-only to just validate a .pth against the golden manifest).

    Replaces the reference's load-time conversion (ref dinounet_training.py:51-75
    + hub URL loading, backbones.py:45-141) with an offline, verifiable step."""
    import argparse

    p = argparse.ArgumentParser(
        description="Convert a published DINOv3 .pth checkpoint to msgpack "
                    "backbone params (with golden-manifest verification).")
    p.add_argument("pth", help="path to the downloaded .pth checkpoint")
    p.add_argument("model_name",
                   choices=["dinov3_vits16", "dinov3_vitb16", "dinov3_vitl16",
                            "dinov3_vit7b16"])
    p.add_argument("out", nargs="?", default=None,
                   help="output .msgpack path (omit with --verify-only)")
    p.add_argument("--verify-only", action="store_true",
                   help="only check keys/shapes against the manifest")
    p.add_argument("--no-verify", action="store_true",
                   help="skip manifest verification (fine-tuned/custom ckpts)")
    args = p.parse_args(argv)

    if args.verify_only:
        import torch

        try:  # mmap: shapes only, no tensor data read
            state_dict = torch.load(args.pth, map_location="cpu",
                                    weights_only=True, mmap=True)
        except (TypeError, RuntimeError):
            state_dict = torch.load(args.pth, map_location="cpu",
                                    weights_only=True)
        verify_state_dict_against_manifest(
            {k: tuple(v.shape) for k, v in state_dict.items()},
            args.model_name)
        print(f"{args.pth}: matches the published {args.model_name} layout "
              f"({len(state_dict)} keys)")
        return
    if args.out is None:
        p.error("out path required unless --verify-only")
    convert_torch_checkpoint(args.pth, args.model_name, args.out,
                             verify=not args.no_verify)
    print(f"wrote {args.out}")


def load_dinov3_params_into(variables: dict, path: str) -> dict:
    """Replace variables['params']['backbone'] with the converted checkpoint
    (shape-checked)."""
    import jax

    loaded = load_backbone_params(path)
    current = variables["params"]["backbone"]
    # a checkpoint may have been converted under a different
    # DINOUNET_TPU_VIT_SCAN setting than this process runs with — re-layout
    # (stack/unstack) instead of failing with an opaque KeyError
    loaded = adapt_backbone_layout(loaded, current)

    def check(cur, new):
        cur_flat = jax.tree_util.tree_flatten_with_path(cur)[0]
        new_map = dict(jax.tree_util.tree_flatten_with_path(new)[0])
        for path_, leaf in cur_flat:
            if path_ not in new_map:
                raise KeyError(f"Missing backbone param {path_} in checkpoint")
            if tuple(new_map[path_].shape) != tuple(leaf.shape):
                raise ValueError(
                    f"Shape mismatch for {path_}: ckpt {new_map[path_].shape} vs model {leaf.shape}"
                )

    check(current, loaded)
    new_backbone = jax.tree.map(
        lambda cur, new: np.asarray(new, dtype=cur.dtype), current, loaded
    )
    params = dict(variables["params"])
    params["backbone"] = new_backbone
    out = dict(variables)
    out["params"] = params
    return out


if __name__ == "__main__":
    main()
