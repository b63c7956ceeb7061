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

import os
import pickle
from typing import Dict

import numpy as np

from dinounet_tpu.models.vit import VIT_CONFIGS, ViTConfig


def _dense(sd, torch_name: str, use_bias: bool = True) -> Dict[str, np.ndarray]:
    out = {"kernel": np.ascontiguousarray(sd[torch_name + ".weight"].T)}
    if use_bias and torch_name + ".bias" in sd:
        out["bias"] = sd[torch_name + ".bias"]
    return out


def convert_dinov3_state_dict(sd: Dict[str, np.ndarray], cfg: ViTConfig) -> dict:
    """torch state dict (numpy values) -> flax backbone params subtree."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
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


def convert_torch_checkpoint(pth_path: str, model_name: str, out_path: str) -> None:
    """Convert a published DINOv3 .pth into our msgpack backbone params.
    model_name: dinov3_vits16 | dinov3_vitb16 | dinov3_vitl16 | dinov3_vit7b16."""
    import torch

    cfg = VIT_CONFIGS[model_name]
    # mmap keeps tensor data on disk until each is touched (7B-friendly)
    try:
        state_dict = torch.load(pth_path, map_location="cpu", weights_only=True,
                                mmap=True)
    except (TypeError, RuntimeError):
        state_dict = torch.load(pth_path, map_location="cpu", weights_only=True)
    sd = {k: _torch_to_numpy(v) for k, v in state_dict.items()}
    params = convert_dinov3_state_dict(sd, cfg)
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


def load_dinov3_params_into(variables: dict, path: str) -> dict:
    """Replace variables['params']['backbone'] with the converted checkpoint
    (shape-checked)."""
    import jax

    loaded = load_backbone_params(path)
    current = variables["params"]["backbone"]

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
