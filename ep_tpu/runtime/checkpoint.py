"""Checkpoint / resume with the reference's head-only semantics.

Mirrors util/misc.py:304-359 + main_linprobe.py:639-653,706-713,764-773:
  * during probing only the HEAD params (+ BN stats + optimizer + epoch) are
    saved; --finetuning saves everything;
  * resume tries a strict full restore and falls back to params-only when the
    checkpoint holds just the head;
  * --auto_resume picks the newest ``checkpoint*`` in --output_dir.

Serialization is flax msgpack (dense numpy trees, no pickle of live objects);
metadata (epoch, test_stats, config) rides in the same msgpack dict.
"""
from __future__ import annotations

import glob
import json
import os
import re
from pathlib import Path
from typing import Any, Dict, Optional

import flax.serialization as fser
import jax
import numpy as np

from ep_tpu.utils.logging import is_main_process

CKPT_SUFFIX = ".msgpack"


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_model(cfg, epoch: int, state, test_stats: Optional[Dict] = None,
               include_epoch_in_filename: bool = False) -> Optional[str]:
    if not cfg.output_dir or not is_main_process():
        return None
    epoch_name = (f"{cfg.suffix}_{epoch}" if include_epoch_in_filename
                  else cfg.suffix)
    path = Path(cfg.output_dir) / f"checkpoint-{epoch_name}{CKPT_SUFFIX}"
    payload = {
        "model": _to_host(state.trainable),
        "batch_stats": _to_host(state.batch_stats),
        "optimizer": fser.to_state_dict(_to_host(state.opt_state)),
        "epoch": epoch,
        "step": int(state.step),
        "test_stats": json.dumps(_jsonable(test_stats or {})),
        "config": json.dumps(_jsonable(vars(cfg) if not hasattr(cfg, "__dataclass_fields__")
                                       else {f: getattr(cfg, f) for f in cfg.__dataclass_fields__})),
    }
    Path(cfg.output_dir).mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as f:
        f.write(fser.msgpack_serialize(payload))
    return str(path)


def _jsonable(d: Dict) -> Dict:
    out = {}
    for k, v in d.items():
        if isinstance(v, (str, int, float, bool, type(None))):
            out[k] = v
        elif isinstance(v, Path):
            out[k] = str(v)
        elif isinstance(v, (np.floating, np.integer)):
            out[k] = v.item()
        elif isinstance(v, dict):
            out[k] = _jsonable(v)
    return out


def load_model(cfg, state):
    """Resume from cfg.resume. Returns (state, start_epoch, test_stats)."""
    if not cfg.resume:
        return state, cfg.start_epoch, None
    with open(cfg.resume, "rb") as f:
        payload = fser.msgpack_restore(f.read())

    try:
        trainable = fser.from_state_dict(state.trainable, payload["model"])
        strict_ok = True
    except Exception as err:  # head-only / shape-mismatch fallback
        print(f"[load_model] strict restore failed: {err}\n→ retrying leniently")
        trainable = _merge_lenient(state.trainable, payload["model"])
        strict_ok = False

    batch_stats = state.batch_stats
    if payload.get("batch_stats"):
        try:
            batch_stats = fser.from_state_dict(state.batch_stats,
                                               payload["batch_stats"])
        except Exception:
            pass

    state = state.replace(trainable=trainable, batch_stats=batch_stats)
    start_epoch = cfg.start_epoch
    test_stats = None
    if "optimizer" in payload and not cfg.eval and not cfg.knn_eval:
        try:
            opt_state = fser.from_state_dict(state.opt_state,
                                             payload["optimizer"])
            state = state.replace(
                opt_state=opt_state,
                step=np.asarray(payload.get("step", 0), np.int32))
            start_epoch = int(payload["epoch"]) + 1
            test_stats = json.loads(payload.get("test_stats", "{}"))
            print("With optim & sched!")
        except Exception as err:
            if strict_ok:
                raise
            print(f"[load_model] optimizer restore skipped: {err}")
    print(f"Resume checkpoint {cfg.resume}")
    return state, start_epoch, test_stats


def _merge_lenient(template, loaded):
    """Copy leaves whose path+shape match; keep template values elsewhere."""
    flat_t = fser.to_state_dict(template)

    def merge(t, l):
        if isinstance(t, dict):
            return {k: merge(t[k], l[k]) if isinstance(l, dict) and k in l
                    else t[k] for k in t}
        if hasattr(t, "shape") and hasattr(l, "shape") and t.shape == np.shape(l):
            return np.asarray(l)
        return t

    merged = merge(flat_t, loaded)
    return fser.from_state_dict(template, merged)


def find_auto_resume(output_dir: str) -> Optional[str]:
    """Newest checkpoint* file (main_linprobe.py:764-773).

    Sorted by natural (numeric-aware) name order so checkpoint-9 < \
checkpoint-10 even though no current CLI path writes numbered names;
    mtime breaks ties.
    """
    if not output_dir or not os.path.isdir(output_dir):
        return None

    def key(path):
        name = os.path.basename(path)
        natural = tuple(int(tok) if tok.isdigit() else tok
                        for tok in re.split(r"(\d+)", name))
        return (natural, os.path.getmtime(path))

    ckpts = sorted(glob.glob(os.path.join(output_dir, "checkpoint*")), key=key)
    return ckpts[-1] if ckpts else None
