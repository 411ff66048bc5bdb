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
    if any(k.startswith("visual.") for k in ckpt):
        # full CLIP checkpoint: keep the vision tower only — the text tower
        # has its own 'transformer.resblocks' that would collide after the
        # prefix strip (models_more.py:43-60 wraps backbone.visual)
        ckpt = {k[len("visual."):]: v for k, v in ckpt.items()
                if k.startswith("visual.")}
    sd = {}
    for k, v in ckpt.items():
        for pref in ("encoder.", "module.", "backbone."):
            if k.startswith(pref):
                k = k[len(pref):]
        if k.startswith(("decoder", "mask_token")):
            continue
        sd[k] = _np(v)
    return sd


def _remap_openclip(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """OpenCLIP visual-tower keys → canonical timm-style keys
    (open_clip VisionTransformer: conv1/class_embedding/positional_embedding/
    ln_pre/transformer.resblocks.{i}/ln_post/proj; reference loads these via
    open_clip.create_model_and_transforms, main_linprobe.py:352-359)."""
    top = {"conv1.weight": "patch_embed.proj.weight",
           "ln_pre.weight": "norm_pre.weight",
           "ln_pre.bias": "norm_pre.bias",
           "ln_post.weight": "norm.weight",
           "ln_post.bias": "norm.bias",
           "proj": "visual_proj"}
    block = {"ln_1.weight": "norm1.weight", "ln_1.bias": "norm1.bias",
             "attn.in_proj_weight": "attn.qkv.weight",
             "attn.in_proj_bias": "attn.qkv.bias",
             "attn.out_proj.weight": "attn.proj.weight",
             "attn.out_proj.bias": "attn.proj.bias",
             "ln_2.weight": "norm2.weight", "ln_2.bias": "norm2.bias",
             "mlp.c_fc.weight": "mlp.fc1.weight",
             "mlp.c_fc.bias": "mlp.fc1.bias",
             "mlp.c_proj.weight": "mlp.fc2.weight",
             "mlp.c_proj.bias": "mlp.fc2.bias"}
    out = {}
    for k, v in sd.items():
        if k == "class_embedding":
            out["cls_token"] = v.reshape(1, 1, -1)
        elif k == "positional_embedding":
            out["pos_embed"] = v[None]
        elif k in top:
            out[top[k]] = v
        elif k.startswith("transformer.resblocks."):
            parts = k.split(".")
            rest = ".".join(parts[3:])
            if rest in block:
                out[f"blocks.{parts[2]}.{block[rest]}"] = v
            else:
                out[k] = v
        else:
            out[k] = v
    return out


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

    if any(k.startswith("transformer.resblocks.") or k == "class_embedding"
           for k in sd):
        sd = _remap_openclip(sd)
    if "storage_tokens" in sd and "register_tokens" not in sd:
        # CAPI names its register tokens 'storage_tokens' (hub layout,
        # models_capi.py wraps facebookresearch/capi)
        sd = dict(sd)
        sd["register_tokens"] = sd.pop("storage_tokens")

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
        if "patch_embed.proj.bias" in sd:  # CLIP conv1 has no bias
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
    if "norm_pre.weight" in sd and "norm_pre" in out:  # OpenCLIP ln_pre
        put(("norm_pre", "scale"), take("norm_pre.weight"))
        put(("norm_pre", "bias"), take("norm_pre.bias"))
    if "visual_proj" in sd and "proj" in out:
        # (D, proj_dim), used as x @ proj in open_clip — no transpose
        put(("proj",), take("visual_proj"))

    leftovers = [k for k in sd if k not in used
                 and not k.startswith(("head", "fc_norm", "oracle", "fc.",
                                       "visual_proj"))]
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


def load_oracle(cfg, backbone_cfg, variables):
    """Fill params['oracle'] (the frozen DINO teacher of the `dino` feature
    mode) from --oracle_ckpt. Counterpart of models_vit.py:462-476
    `_timm_oracle` (timm vit_base_patch16_224.dino) — zero-egress version:
    the user supplies a local .pth/.msgpack in timm/DINO layout."""
    from ep_tpu.models.assembly import oracle_config

    params = variables["params"]
    if "oracle" not in params:
        raise ValueError("--oracle_ckpt given but the model has no oracle "
                         "(use --cls_features dino)")
    ocfg = oracle_config(backbone_cfg)
    oracle = _try_msgpack(cfg.oracle_ckpt, params["oracle"])
    if oracle is None:
        sd = load_torch_state_dict(cfg.oracle_ckpt, cfg.checkpoint_key)
        oracle = torch_vit_to_flax(sd, params["oracle"], ocfg)
    print(f"[convert] loaded oracle weights from {cfg.oracle_ckpt}")
    new_params = dict(params)
    new_params["oracle"] = oracle
    return {**variables, "params": new_params}


def _try_msgpack(path: str, template, key: str = "backbone"):
    """Restore an already-converted flax backbone checkpoint, or None."""
    import flax.serialization as fser
    try:
        with open(path, "rb") as f:
            payload = fser.msgpack_restore(f.read())
    except Exception:
        return None
    if not isinstance(payload, dict) or key not in payload:
        return None
    print(f"[convert] loading pre-converted flax {key} checkpoint")
    return fser.from_state_dict(template, payload[key])
