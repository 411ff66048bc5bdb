"""torch checkpoint → flax param-pytree converters.

Replaces the reference's in-framework loading (main_linprobe.py:373-411 +
models_simmim.py:430-468): instead of nn.Module.load_state_dict, the torch
``.pth`` state dict (MAE / timm / SimMIM / DeiT layouts) is mapped onto the
template pytree of our VisionTransformer, with:
  * conv/linear weight layout transposition (torch OIHW / (out,in) → flax
    HWIO / (in,out)),
  * 'encoder.' / 'module.' prefix stripping (SimMIM, models_simmim.py:459),
  * split q/k/v → fused qkv concatenation,
  * head-shape-mismatch key dropping (main_linprobe.py:392-395),
  * pos-embed bicubic interpolation (util/pos_embed.py:66-87),
  * an assertion that only head/oracle/fc keys stay missing
    (main_linprobe.py:408-411).

torch is imported lazily and only on the conversion path — never in the
training hot path.
"""
from __future__ import annotations

from pathlib import Path
from typing import Any, Dict

import numpy as np

from ep_tpu.utils.pos_embed import interpolate_pos_embed


def _np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def load_torch_state_dict(path: str, checkpoint_key: str = "model") -> Dict[str, np.ndarray]:
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and checkpoint_key in ckpt:
        ckpt = ckpt[checkpoint_key]
    elif isinstance(ckpt, dict) and "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    sd = {}
    for k, v in ckpt.items():
        for pref in ("encoder.", "module.", "backbone."):
            if k.startswith(pref):
                k = k[len(pref):]
        if k.startswith(("decoder", "mask_token")):
            continue
        sd[k] = _np(v)
    return sd


def torch_vit_to_flax(sd: Dict[str, np.ndarray], template: Dict[str, Any],
                      backbone_cfg) -> Dict[str, Any]:
    """Map a ViT torch state dict onto our backbone param template.

    Returns a new params dict; raises if a non-head torch tensor has no home
    or a template leaf outside head/norm stays uninitialized.
    """
    import jax

    if "blocks" in template:  # scan layout: convert via the loop layout
        from ep_tpu.models.vit import stack_block_params, unstack_block_params
        loop_template = unstack_block_params(
            jax.tree_util.tree_map(np.asarray, template), backbone_cfg.depth)
        converted = torch_vit_to_flax(sd, loop_template, backbone_cfg)
        return stack_block_params(converted, backbone_cfg.depth)

    out = jax.tree_util.tree_map(np.asarray, template)
    used = set()

    def put(path, arr):
        node = out
        for p in path[:-1]:
            node = node[p]
        tgt = node[path[-1]]
        assert tgt.shape == arr.shape, (path, tgt.shape, arr.shape)
        node[path[-1]] = arr.astype(tgt.dtype)

    def take(key):
        used.add(key)
        return sd[key]

    depth = backbone_cfg.depth

    # --- embeddings ----------------------------------------------------------
    if "patch_embed.proj.weight" in sd:
        w = take("patch_embed.proj.weight")  # (D, 3, p, p)
        put(("patch_embed", "kernel"), w.transpose(2, 3, 1, 0))
        put(("patch_embed", "bias"), take("patch_embed.proj.bias"))
    if "cls_token" in sd and "cls_token" in out:
        put(("cls_token",), take("cls_token"))
    if "register_tokens" in sd and "reg_tokens" in out:
        put(("reg_tokens",), take("register_tokens"))
    if "pos_embed" in sd and "pos_embed" in out:
        pe = take("pos_embed")
        tgt = out["pos_embed"]
        if pe.shape != tgt.shape:
            n_extra = tgt.shape[1] - backbone_cfg.num_patches
            print(f"Position interpolate {pe.shape} -> {tgt.shape}")
            pe = np.asarray(interpolate_pos_embed(
                pe, backbone_cfg.num_patches, n_extra))
        put(("pos_embed",), pe)
    if "rel_pos_bias.relative_position_bias_table" in sd and "rel_pos_bias" in out:
        put(("rel_pos_bias", "relative_position_bias_table"),
            take("rel_pos_bias.relative_position_bias_table"))

    # --- blocks ----------------------------------------------------------------
    for i in range(depth):
        tp = f"blocks.{i}."
        fp = f"blocks_{i}"
        if tp + "norm1.weight" not in sd:
            continue
        put((fp, "norm1", "scale"), take(tp + "norm1.weight"))
        put((fp, "norm1", "bias"), take(tp + "norm1.bias"))
        put((fp, "norm2", "scale"), take(tp + "norm2.weight"))
        put((fp, "norm2", "bias"), take(tp + "norm2.bias"))

        if tp + "attn.qkv.weight" in sd:
            qkv_w = take(tp + "attn.qkv.weight")  # (3D, D)
        else:  # split q/k/v (DINO heads etc.)
            qkv_w = np.concatenate(
                [take(tp + f"attn.{n}.weight") for n in ("q", "k", "v")], 0)
        put((fp, "attn", "qkv", "kernel"), qkv_w.T)

        attn = out[fp]["attn"]
        if tp + "attn.qkv.bias" in sd and "bias" in attn["qkv"]:
            put((fp, "attn", "qkv", "bias"), take(tp + "attn.qkv.bias"))
        if tp + "attn.q_bias" in sd and "q_bias" in attn:
            put((fp, "attn", "q_bias"), take(tp + "attn.q_bias"))
            put((fp, "attn", "v_bias"), take(tp + "attn.v_bias"))
        put((fp, "attn", "proj", "kernel"), take(tp + "attn.proj.weight").T)
        if tp + "attn.proj.bias" in sd:
            put((fp, "attn", "proj", "bias"), take(tp + "attn.proj.bias"))
        if tp + "attn.relative_position_bias_table" in sd and \
                f"rel_pos_bias_{i}" in out:
            put((f"rel_pos_bias_{i}", "relative_position_bias_table"),
                take(tp + "attn.relative_position_bias_table"))

        if tp + "mlp.fc1.weight" in sd:
            put((fp, "mlp", "fc1", "kernel"), take(tp + "mlp.fc1.weight").T)
            put((fp, "mlp", "fc1", "bias"), take(tp + "mlp.fc1.bias"))
            put((fp, "mlp", "fc2", "kernel"), take(tp + "mlp.fc2.weight").T)
            put((fp, "mlp", "fc2", "bias"), take(tp + "mlp.fc2.bias"))
        elif tp + "mlp.w12.weight" in sd:  # SwiGLU
            put((fp, "mlp", "w12", "kernel"), take(tp + "mlp.w12.weight").T)
            put((fp, "mlp", "w12", "bias"), take(tp + "mlp.w12.bias"))
            put((fp, "mlp", "w3", "kernel"), take(tp + "mlp.w3.weight").T)
            put((fp, "mlp", "w3", "bias"), take(tp + "mlp.w3.bias"))

        for g_torch, ls, g_flax in (("gamma_1", "ls1", "gamma_1"),
                                    ("gamma_2", "ls2", "gamma_2")):
            if tp + g_torch in sd and ls in out[fp]:
                put((fp, ls, g_flax), take(tp + g_torch))
            # DINOv2 naming: blocks.i.ls1.gamma
            if tp + f"{ls}.gamma" in sd and ls in out[fp]:
                put((fp, ls, g_flax), take(tp + f"{ls}.gamma"))

    if "norm.weight" in sd and "norm" in out:
        put(("norm", "scale"), take("norm.weight"))
        put(("norm", "bias"), take("norm.bias"))

    leftovers = [k for k in sd if k not in used
                 and not k.startswith(("head", "fc_norm", "oracle", "fc."))]
    if leftovers:
        print(f"[convert] unused checkpoint keys: {sorted(leftovers)[:10]}"
              f"{' ...' if len(leftovers) > 10 else ''}")
    return out


def load_pretrained_backbone(cfg, backbone_cfg, variables):
    """Load cfg.finetune into variables['params']['backbone'] in place of the
    random init (main_linprobe.py:373-411). Accepts either a torch .pth or an
    ep_tpu msgpack produced by tools/convert_checkpoint.py."""
    path = cfg.finetune
    if not Path(path).exists():
        raise FileNotFoundError(
            f"--finetune {path}: timm-hub name resolution needs network "
            f"access; convert the checkpoint to a local .pth first")
    print(f"Interpreting {path} as path")

    backbone = _try_msgpack(path, variables["params"]["backbone"])
    if backbone is None:
        sd = load_torch_state_dict(path, cfg.checkpoint_key)
        backbone = torch_vit_to_flax(sd, variables["params"]["backbone"],
                                     backbone_cfg)
    new_params = dict(variables["params"])
    new_params["backbone"] = backbone
    return {**variables, "params": new_params}


def _try_msgpack(path: str, template):
    """Restore an already-converted flax backbone checkpoint, or None."""
    import flax.serialization as fser
    try:
        with open(path, "rb") as f:
            payload = fser.msgpack_restore(f.read())
    except Exception:
        return None
    if not isinstance(payload, dict) or "backbone" not in payload:
        return None
    print("[convert] loading pre-converted flax backbone checkpoint")
    return fser.from_state_dict(template, payload["backbone"])
