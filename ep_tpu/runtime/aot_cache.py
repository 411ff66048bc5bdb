"""On-disk AOT executable cache for jitted steps.

The remote-compile relay on this TPU setup makes every fresh-process jit
cost 2–5 minutes, and JAX's persistent compilation cache does not hit
across processes here (measured r2: second process recompiled, 88s). What
DOES work is `jax.experimental.serialize_executable`: a compiled executable
serialized in one process deserializes and runs in another in ~0.1 s.

``AOTCache.wrap`` makes that transparent: the first call of a wrapped
jitted function looks for a serialized executable keyed by (jax version,
backend, donate signature, user key, input avals); on a hit it runs the
deserialized executable, on a miss it lowers+compiles, stores, and runs.
Any failure (version skew, device mismatch, corrupt file) falls back to the
normal jit path — the cache can never break a run, only speed it up.

No counterpart in the reference (torch caches kernels in-process only);
this is TPU-runtime infrastructure the relay environment makes necessary.
"""
from __future__ import annotations

import hashlib
import os
import pickle
from pathlib import Path
from typing import Any, Callable, Optional

import jax


def _avals_key(args) -> str:
    leaves = jax.tree_util.tree_leaves(args)
    parts = []
    for leaf in leaves:
        shape = getattr(leaf, "shape", ())
        dtype = getattr(leaf, "dtype", type(leaf).__name__)
        parts.append(f"{shape}:{dtype}")
    return ";".join(parts)


_CODE_KEY = None


def _code_key() -> str:
    """Best-effort code identity (git HEAD of the package repo): a changed
    tree must never silently reuse an executable compiled from old code."""
    global _CODE_KEY
    if _CODE_KEY is None:
        import subprocess
        try:
            root = Path(__file__).resolve().parents[2]
            _CODE_KEY = subprocess.run(
                ["git", "-C", str(root), "rev-parse", "HEAD"],
                capture_output=True, text=True, timeout=10,
            ).stdout.strip() or "nogit"
        except Exception:
            _CODE_KEY = "nogit"
    return _CODE_KEY


def _backend_key() -> str:
    d = jax.devices()[0]
    return (f"{d.platform}:{getattr(d, 'device_kind', '?')}:"
            f"{jax.__version__}:{_code_key()}")


class AOTCache:
    """Directory-backed cache of serialized compiled executables."""

    def __init__(self, cache_dir: str):
        self.dir = Path(cache_dir)
        self.dir.mkdir(parents=True, exist_ok=True)

    def wrap(self, jitted, key: str) -> Callable:
        """Wrap an already-jitted function. ``key`` should identify the
        computation (config repr etc.); input shapes/dtypes are added
        automatically on first call."""
        state = {"compiled": None, "sig": None}

        def call(*args):
            sig = _avals_key(args)
            if state["compiled"] is None or state["sig"] != sig:
                state["compiled"] = self._get(jitted, args, key, sig)
                state["sig"] = sig
            try:
                return state["compiled"](*args)
            except Exception:
                # deserialized executable rejected at run time (device or
                # layout skew) — recompile fresh and overwrite the entry
                state["compiled"] = self._compile_store(jitted, args,
                                                        key, sig)
                return state["compiled"](*args)

        return call

    def _path(self, key: str, sig: str) -> Path:
        h = hashlib.sha256(
            f"{_backend_key()}|{key}|{sig}".encode()).hexdigest()[:24]
        return self.dir / f"aot_{h}.pkl"

    def _get(self, jitted, args, key: str, sig: str):
        path = self._path(key, sig)
        if path.exists():
            try:
                from jax.experimental.serialize_executable import (
                    deserialize_and_load)
                with open(path, "rb") as f:
                    payload, in_tree, out_tree = pickle.load(f)
                print(f"[aot-cache] loaded {path.name}")
                return deserialize_and_load(payload, in_tree, out_tree)
            except Exception as err:  # corrupt / stale — recompile
                print(f"[aot-cache] reload failed ({type(err).__name__}); "
                      f"recompiling")
        return self._compile_store(jitted, args, key, sig)

    def _compile_store(self, jitted, args, key: str, sig: str):
        compiled = jitted.lower(*args).compile()
        try:
            from jax.experimental.serialize_executable import serialize
            payload, in_tree, out_tree = serialize(compiled)
            path = self._path(key, sig)
            tmp = path.with_suffix(f".tmp{os.getpid()}")
            with open(tmp, "wb") as f:
                pickle.dump((payload, in_tree, out_tree), f)
            tmp.replace(path)
            print(f"[aot-cache] stored {path.name} "
                  f"({len(payload) / 1e6:.1f} MB)")
        except Exception as err:
            print(f"[aot-cache] store failed ({type(err).__name__}): {err}")
        return compiled


def maybe_wrap(jitted, key: str, cache_dir: Optional[str]):
    """wrap with an AOTCache when cache_dir is set, else return as-is."""
    if not cache_dir:
        return jitted
    return AOTCache(cache_dir).wrap(jitted, key)
