"""Device-side augmentation (``--device_aug``): ship u8 staged batches and
run RandomResizedCrop + hflip + normalize INSIDE the jitted train step.

Why: the host pipeline costs ~11 CPU cores per chip at ViT-B probing speed
(PERFORMANCE.md "Host input pipeline") because every epoch re-runs
decode + random-crop + bicubic resize + normalize per image in
PIL/numpy/native-C++. With --device_aug the host does only decode plus ONE
deterministic staging resize (a cacheable, epoch-invariant pass) and ships
uint8 — a quarter of the f32 bytes and half of the bf16 host cast — while
the randomized crop/resize/flip/normalize runs on the TPU as part of the
step.

Reference counterpart: the TF/BYOL crop sampler the reference vendored
*specifically for TPU parity* (util/crop.py:9-35) and the train/val
transforms (main_linprobe.py:214-234).

Design notes (TPU-first):
  * The crop-resample is expressed as two batched interpolation-matrix
    matmuls (separable bicubic, PIL-style support scaling when
    minifying), NOT per-pixel gathers: (B,out,S)@(B,S,S·3) then the
    transposed x-pass — clean MXU work, ~84 GFLOP at bs512/S=256/out=224
    ≈ 1% of the ViT-B forward. Weights are built on device from the
    per-image crop boxes with pure broadcasting (VPU, ~30 M cubics).
  * Crop parameters are sampled ON DEVICE with jax.random, keyed by
    fold_in(seed, global_step) and split per global batch index — no
    host RNG round-trip, identical results at any process count, and
    resume-deterministic (the step counter lives in TrainState). The
    sampler mirrors transforms.tf_random_resized_crop_params; its
    distribution is pinned against the host sampler in
    tests/test_device_aug.py.
  * Matmuls run with bf16 operands and f32 accumulation (u8 values and
    the crop weights are exact / near-exact in bf16; measured ≤2 u8
    levels vs PIL).

Known, documented protocol difference: the random crop samples over the
SQUARE staged image (stage×stage) rather than the original rectangle —
static device shapes require a fixed staging geometry. The staged image is
an aspect-distorting bicubic resize of the original (the same distortion
RRC's final resize applies). Measured (r5, scripts/device_aug_study.py →
DEVICE_AUG_STUDY.json): on the synthetic margin task with 150x200
rectangles, the square-staged protocol is never worse — +1.45pp mean,
worst seed +0.58pp over 5 seeds vs true-rectangle crop boxes.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .transforms import (CLIP_MEAN, CLIP_STD, IMAGENET_MEAN, IMAGENET_STD,
                         ValTransform)


# ---------------------------------------------------------------------------
# host-side staging transforms (deterministic, u8 out)
# ---------------------------------------------------------------------------

class StageTrainTransform:
    """Decode → bicubic resize to (stage, stage) → uint8.

    The only per-image host work left in --device_aug train mode. Epoch-
    invariant, so a staged-image cache (loader-level) makes epochs ≥2
    decode-free."""

    def __init__(self, stage_size: int):
        self.stage_size = stage_size

    def __call__(self, img, rng=None) -> np.ndarray:
        s = self.stage_size
        from ep_tpu.data import _native
        if isinstance(img, np.ndarray) and _native.available():
            h, w = img.shape[:2]
            return _native.resize_bicubic_crop_u8(img, (0, 0, h, w), s)
        from PIL import Image
        if isinstance(img, np.ndarray):
            img = Image.fromarray(img)
        img = img.convert("RGB")
        return np.asarray(img.resize((s, s), 3))  # 3 = PIL BICUBIC


class StageValTransform(ValTransform):
    """The reference val transform minus normalization: short-side resize +
    center crop, uint8 out. The device normalizes (normalize_u8_batch)."""

    def __call__(self, img, rng=None) -> np.ndarray:
        from PIL import Image
        if isinstance(img, np.ndarray):
            img = Image.fromarray(img)
        img = img.convert("RGB")
        w, h = img.size
        short = min(w, h)
        nw = int(round(w * self.resize_to / short))
        nh = int(round(h * self.resize_to / short))
        img = img.resize((nw, nh), 3)
        s = self.image_size
        left = (nw - s) // 2
        top = (nh - s) // 2
        return np.asarray(img.crop((left, top, left + s, top + s)))


class IdentityTransform:
    """Loader-facing no-op for datasets that already serve staged u8."""

    def __call__(self, img, rng=None) -> np.ndarray:
        return img


class StagedImageCache:
    """Dataset wrapper that stages each image ONCE and serves u8 from a
    memmap afterwards.

    Staging (decode + one deterministic resize) costs MORE per image than
    the host RRC (which crops a small window before resizing) — measured
    268 vs 375 img/s/core on 500×400 frames — so --device_aug only wins
    end-to-end because staging is epoch-invariant: epoch 1 fills this
    cache, every later epoch reads ~150 kB/image off the page cache
    instead of re-running decode+resize+augment. Labels are cached
    alongside so repeat epochs never touch the underlying dataset.

    Thread-safe by idempotence: concurrent loader workers may stage the
    same index twice, writing identical bytes; the done flag flips last.
    """

    def __init__(self, dataset, transform, cache_dir: str, split: str):
        import os
        self.dataset = dataset
        self.transform = transform
        n = len(dataset)
        probe = np.asarray(transform(dataset[0][0]))
        assert probe.dtype == np.uint8, probe.dtype
        self.shape = probe.shape
        os.makedirs(cache_dir, exist_ok=True)
        tag = f"{split}_{n}x{'x'.join(map(str, probe.shape))}"
        def mm(name, dtype, shape):
            path = f"{cache_dir}/{name}_{tag}.npy"
            mode = "r+" if os.path.exists(path) else "w+"
            return np.lib.format.open_memmap(path, mode=mode, dtype=dtype,
                                             shape=shape)
        self._imgs = mm("staged", np.uint8, (n,) + probe.shape)
        self._labels = mm("labels", np.int64, (n,))
        self._done = mm("done", np.uint8, (n,))

    def __len__(self) -> int:
        return len(self.dataset)

    def __getitem__(self, i: int):
        if not self._done[i]:
            img, label = self.dataset[i]
            self._imgs[i] = self.transform(img)
            self._labels[i] = label
            self._done[i] = 1
        return np.array(self._imgs[i]), int(self._labels[i])

    def __repr__(self):
        return (f"StagedImageCache({self.dataset!r}, staged "
                f"{int(self._done.sum())}/{len(self)})")


# ---------------------------------------------------------------------------
# device-side pieces (all jittable)
# ---------------------------------------------------------------------------

def _cubic(x: jnp.ndarray, a: float = -0.5) -> jnp.ndarray:
    """PIL's bicubic filter (a = -0.5, support 2)."""
    ax = jnp.abs(x)
    inner = ((a + 2.0) * ax - (a + 3.0)) * ax * ax + 1.0
    outer = (((ax - 5.0) * ax + 8.0) * ax - 4.0) * a
    return jnp.where(ax < 1.0, inner, jnp.where(ax < 2.0, outer, 0.0))


def resample_weights(start: jnp.ndarray, length: jnp.ndarray, src: int,
                     out: int) -> jnp.ndarray:
    """Per-image (out, src) bicubic interpolation matrix for resampling the
    half-open source span [start, start+length) onto `out` pixels.

    PIL semantics: filter support scales with the minification factor;
    rows renormalize over in-bounds source pixels (PIL clamps its window
    at the image edge, which the renormalization reproduces up to the
    clamp-vs-drop treatment of sub-pixel tails).

    start/length: (B,) float32. Returns (B, out, src) float32.
    """
    scale = length[:, None] / out  # (B, 1)
    fscale = jnp.maximum(scale, 1.0)
    centers = start[:, None] + (jnp.arange(out, dtype=jnp.float32)[None, :]
                                + 0.5) * scale  # (B, out)
    ss = jnp.arange(src, dtype=jnp.float32) + 0.5  # (src,)
    t = (ss[None, None, :] - centers[:, :, None]) / fscale[:, :, None]
    w = _cubic(t)
    return w / jnp.sum(w, axis=-1, keepdims=True)


def sample_crop_params(key: jax.Array, batch: int, stage: int,
                       scale: Tuple[float, float],
                       ratio: Tuple[float, float]):
    """Device-side mirror of transforms.tf_random_resized_crop_params
    (BYOL/TF sampling: one draw, clamped, no retry loop — util/crop.py:16-35),
    vectorized over the batch. Returns i, j, h, w as (B,) float32 (whole
    numbers)."""
    k_area, k_ar, k_i, k_j = jax.random.split(key, 4)
    area = stage * stage * jax.random.uniform(
        k_area, (batch,), minval=scale[0], maxval=scale[1])
    log_r = (np.log(ratio[0]), np.log(ratio[1]))
    ar = jnp.exp(jax.random.uniform(k_ar, (batch,), minval=log_r[0],
                                    maxval=log_r[1]))
    w = jnp.clip(jnp.round(jnp.sqrt(area * ar)), 1.0, float(stage))
    h = jnp.clip(jnp.round(jnp.sqrt(area / ar)), 1.0, float(stage))
    # integers uniform over [0, stage - h] inclusive, like rng.integers
    i = jnp.floor(jax.random.uniform(k_i, (batch,)) * (stage - h + 1.0))
    j = jnp.floor(jax.random.uniform(k_j, (batch,)) * (stage - w + 1.0))
    return i, j, h, w


def resample_crop(images_u8: jnp.ndarray, i, j, h, w, out: int,
                  ) -> jnp.ndarray:
    """Batched separable bicubic crop-resize: (B,H,W,3) u8 + per-image
    boxes → (B,out,out,3) float32 in [0,255]. bf16 operands, f32 accum.
    The source may be rectangular (the train path stages square, but
    scripts/device_aug_study.py resamples true rectangles through this)."""
    B, H_src, W_src, C = images_u8.shape
    wy = resample_weights(i, h, H_src, out).astype(jnp.bfloat16)
    wx = resample_weights(j, w, W_src, out).astype(jnp.bfloat16)
    x = images_u8.astype(jnp.bfloat16)  # 0..255 exact in bf16
    # y-pass: contract source rows -> (B, out, S, C)
    x = jnp.einsum("bos,bswc->bowc", wy, x,
                   preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    # x-pass: contract source cols -> (B, out, out, C)
    x = jnp.einsum("bot,bhtc->bhoc", wx, x,
                   preferred_element_type=jnp.float32)
    return x


def _norm_affine(mean: Sequence[float], std: Sequence[float]):
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)
    scale = (1.0 / (255.0 * std)).astype(np.float32)
    bias = (-mean / std).astype(np.float32)
    return jnp.asarray(scale), jnp.asarray(bias)


def normalize_u8_batch(images_u8: jnp.ndarray, mean, std,
                       dtype=jnp.bfloat16) -> jnp.ndarray:
    """u8 (B,H,W,3) → normalized compute-dtype batch: x/255 sub-mean
    div-std fused into one scale+bias (the device half of the val
    transform; the eval/extract steps call this on u8 inputs)."""
    scale, bias = _norm_affine(mean, std)
    return (images_u8.astype(jnp.float32) * scale + bias).astype(dtype)


def augment_train_batch(key: jax.Array, images_u8: jnp.ndarray, out: int,
                        scale: Tuple[float, float],
                        ratio: Tuple[float, float], mean, std,
                        dtype=jnp.bfloat16, hflip: bool = True
                        ) -> jnp.ndarray:
    """The full device-side train transform: RandomResizedCrop(TF-style)
    + hflip(0.5) + normalize. images_u8: (B, stage, stage, 3)."""
    B, S = images_u8.shape[0], images_u8.shape[1]
    k_crop, k_flip = jax.random.split(key)
    i, j, h, w = sample_crop_params(k_crop, B, S, scale, ratio)
    x = resample_crop(images_u8, i, j, h, w, out)  # (B,out,out,3) f32 0..255
    if hflip:
        flip = jax.random.bernoulli(k_flip, 0.5, (B,))
        x = jnp.where(flip[:, None, None, None], x[:, :, ::-1, :], x)
    nscale, nbias = _norm_affine(mean, std)
    # resampling can slightly over/undershoot [0,255] (bicubic lobes);
    # PIL clamps to u8 — match it before normalizing
    x = jnp.clip(x, 0.0, 255.0)
    return (x * nscale + nbias).astype(dtype)


# ---------------------------------------------------------------------------
# config plumbing
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class DeviceAug:
    """Everything the jitted steps need to augment on device. Built once
    from the TrainConfig (from_cfg); passed to make_train_step /
    make_eval_step / make_extract_step."""

    out_size: int
    stage_size: int
    scale: Tuple[float, float] = (0.08, 1.0)
    ratio: Tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0)
    mean: Tuple[float, ...] = tuple(IMAGENET_MEAN.tolist())
    std: Tuple[float, ...] = tuple(IMAGENET_STD.tolist())
    seed: int = 0
    hflip: bool = True
    dtype: Any = jnp.bfloat16

    @staticmethod
    def stage_for(image_size: int, override: int = 0) -> int:
        return override if override else int(round(image_size * 256 / 224))

    @classmethod
    def from_cfg(cls, cfg) -> "DeviceAug":
        mean, std = ((CLIP_MEAN, CLIP_STD) if getattr(cfg, "openclip", False)
                     else (IMAGENET_MEAN, IMAGENET_STD))
        dtype = jnp.bfloat16 if cfg.amp in ("bfloat16", "float16") \
            else jnp.float32
        return cls(out_size=cfg.image_size,
                   stage_size=cls.stage_for(
                       cfg.image_size, getattr(cfg, "device_aug_stage", 0)),
                   mean=tuple(np.asarray(mean).tolist()),
                   std=tuple(np.asarray(std).tolist()),
                   seed=cfg.seed, dtype=dtype)

    def train_fn(self, step: jnp.ndarray, images: jnp.ndarray) -> jnp.ndarray:
        """Augment a u8 staged batch; `step` (the TrainState counter) keys
        the randomness, so the schedule is resume-deterministic."""
        key = jax.random.fold_in(jax.random.key(self.seed), step)
        return augment_train_batch(key, images, self.out_size, self.scale,
                                   self.ratio, self.mean, self.std,
                                   self.dtype, self.hflip)

    def eval_fn(self, images: jnp.ndarray) -> jnp.ndarray:
        return normalize_u8_batch(images, self.mean, self.std, self.dtype)


def build_staging_transforms(cfg):
    """--device_aug replacement for transforms.build_transforms: both
    splits yield uint8; randomness moves into the jitted step."""
    stage = DeviceAug.stage_for(cfg.image_size,
                                getattr(cfg, "device_aug_stage", 0))
    train = StageTrainTransform(stage)
    val = StageValTransform(cfg.image_size)
    if cfg.knn_eval:  # kNN evaluates train images deterministically
        train = val
    return train, val
