#!/usr/bin/env python3
"""Host input-pipeline microbench: native C++ fast path vs the PIL path.

Measures the per-image train transform (TF-style RandomResizedCrop +
hflip + normalize, data/transforms.py::TrainTransform) on synthetic
uint8 frames, with the fused native crop-resize-normalize
(native/fastpath.cpp via ctypes) and with PIL (the fallback every
install has). CPU-side only — no TPU involved.

    python scripts/input_pipeline_bench.py [--n 300] [--hw 500,400]
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def run(transform, frames, rng):
    t0 = time.perf_counter()
    for f in frames:
        transform(f, rng)
    return len(frames) / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=300)
    ap.add_argument("--hw", default="500,400")
    args = ap.parse_args()
    h, w = (int(x) for x in args.hw.split(","))

    from ep_tpu.data import _native
    from ep_tpu.data.transforms import TrainTransform

    r = np.random.default_rng(0)
    frames = [r.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
              for _ in range(args.n)]
    t = TrainTransform(image_size=224)

    if not _native.available():
        print("native lib not built (make -C native) — PIL only")
    else:
        # warmup + measure native
        run(t, frames[:20], np.random.default_rng(1))
        native = run(t, frames, np.random.default_rng(2))
        print(f"native fused crop+bicubic+normalize: {native:,.0f} img/s/core")

    # disable the native path -> PIL fallback (same math)
    avail, _native.available = _native.available, lambda: False
    try:
        run(t, frames[:20], np.random.default_rng(1))
        pil = run(t, frames, np.random.default_rng(2))
        print(f"PIL fallback:                         {pil:,.0f} img/s/core")
    finally:
        _native.available = avail
    if _native.available():
        print(f"native/PIL speedup: {native / pil:.2f}x")

    # --device_aug host side: ONE deterministic staging resize to u8 — the
    # random crop/flip/normalize move into the jitted step
    from ep_tpu.data.device_aug import StagedImageCache, StageTrainTransform
    st = StageTrainTransform(256)
    run(st, frames[:20], np.random.default_rng(1))
    stage = run(st, frames, np.random.default_rng(2))
    print(f"--device_aug staging resize (u8 out):  {stage:,.0f} img/s/core")

    # epoch ≥2 with --device_aug_cache: memmap reads only
    import tempfile

    class _DS:
        def __len__(self):
            return len(frames)

        def __getitem__(self, i):
            return frames[i], 0

    with tempfile.TemporaryDirectory() as d:
        cache = StagedImageCache(_DS(), st, d, "bench")
        for i in range(len(frames)):  # epoch 1: fill
            cache[i]
        t0 = time.perf_counter()
        reps = 10
        for _ in range(reps):
            for i in range(len(frames)):
                cache[i]
        cached = reps * len(frames) / (time.perf_counter() - t0)
    print(f"--device_aug_cache epoch>=2 read:      {cached:,.0f} img/s/core")


if __name__ == "__main__":
    main()
