"""Image transforms, numpy/PIL-based (no torchvision at runtime).

Train: TF/TPU-style RandomResizedCrop — the BYOL algorithm without the
torchvision retry loop, which the reference already adopted *specifically for
TPU parity* (util/crop.py:9-35) — + horizontal flip + ImageNet
normalization (main_linprobe.py:214-228). Optional aimv2 recipe adds
ColorJitter(0.3) and an IMAGENET AutoAugment-equivalent policy.

Val: Resize(image_size·256/224, bicubic) + CenterCrop (main_linprobe.py:230-234).
"""
from __future__ import annotations

import numpy as np

try:
    from PIL import Image
    HAVE_PIL = True
except ImportError:  # pragma: no cover
    HAVE_PIL = False

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)
# OpenCLIP towers ship their own normalization (main_linprobe.py:210-211
# pulls the transforms from open_clip; these are its constants)
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)
BICUBIC = 3  # PIL.Image.BICUBIC


def tf_random_resized_crop_params(
    rng: np.random.Generator, width: int, height: int,
    scale=(0.08, 1.0), ratio=(3.0 / 4.0, 4.0 / 3.0),
):
    """BYOL/TF crop sampling: one draw, clamped — no retry loop
    (util/crop.py:16-35)."""
    area = height * width
    target_area = area * rng.uniform(scale[0], scale[1])
    log_ratio = (np.log(ratio[0]), np.log(ratio[1]))
    aspect_ratio = np.exp(rng.uniform(log_ratio[0], log_ratio[1]))
    w = int(round(np.sqrt(target_area * aspect_ratio)))
    h = int(round(np.sqrt(target_area / aspect_ratio)))
    w = min(w, width)
    h = min(h, height)
    i = int(rng.integers(0, height - h + 1))
    j = int(rng.integers(0, width - w + 1))
    return i, j, h, w


def normalize(img: np.ndarray, mean=IMAGENET_MEAN, std=IMAGENET_STD
              ) -> np.ndarray:
    """uint8 (H,W,3) -> float32 normalized (fused native pass when built)."""
    from ep_tpu.data import _native
    return _native.normalize_u8(img, mean, std)


class TrainTransform:
    """RandomResizedCrop(TF-style) + hflip + normalize → float32 (S,S,3)."""

    def __init__(self, image_size: int = 224, scale=(0.08, 1.0),
                 ratio=(3.0 / 4.0, 4.0 / 3.0), color_jitter: float = 0.0,
                 hflip: bool = True, autoaugment: bool = False,
                 mean=IMAGENET_MEAN, std=IMAGENET_STD):
        self.mean, self.std = mean, std
        self.image_size = image_size
        self.scale = scale
        self.ratio = ratio
        self.color_jitter = color_jitter
        self.hflip = hflip
        self.autoaugment = autoaugment

    def __call__(self, img, rng: np.random.Generator) -> np.ndarray:
        from ep_tpu.data import _native
        s = self.image_size
        if isinstance(img, np.ndarray) and _native.available():
            # native fast path: crop+bicubic resize fused, no PIL round trip
            h, w = img.shape[:2]
            i, j, hh, ww = tf_random_resized_crop_params(
                rng, w, h, self.scale, self.ratio)
            arr = _native.resize_bicubic_crop_u8(img, (i, j, hh, ww), s)
        else:
            if isinstance(img, np.ndarray):
                img = Image.fromarray(img)
            img = img.convert("RGB")
            w, h = img.size
            i, j, hh, ww = tf_random_resized_crop_params(
                rng, w, h, self.scale, self.ratio)
            img = img.resize((s, s), BICUBIC, box=(j, i, j + ww, i + hh))
            arr = np.asarray(img)
        if self.hflip and rng.random() < 0.5:
            arr = arr[:, ::-1]
        if self.color_jitter > 0:
            arr = _color_jitter(np.ascontiguousarray(arr), rng,
                                self.color_jitter)
        if self.autoaugment:
            from .autoaugment import autoaugment_imagenet
            arr = autoaugment_imagenet(np.ascontiguousarray(arr), rng)
        return normalize(arr, self.mean, self.std)


class ValTransform:
    """Resize(short side = image_size*256/224) + CenterCrop + normalize."""

    def __init__(self, image_size: int = 224, mean=IMAGENET_MEAN,
                 std=IMAGENET_STD):
        self.mean, self.std = mean, std
        self.image_size = image_size
        self.resize_to = int(round(image_size * 256 / 224))

    def __call__(self, img, rng=None) -> np.ndarray:
        if isinstance(img, np.ndarray):
            img = Image.fromarray(img)
        img = img.convert("RGB")
        w, h = img.size
        short = min(w, h)
        nw = int(round(w * self.resize_to / short))
        nh = int(round(h * self.resize_to / short))
        img = img.resize((nw, nh), BICUBIC)
        s = self.image_size
        left = (nw - s) // 2
        top = (nh - s) // 2
        img = img.crop((left, top, left + s, top + s))
        return normalize(np.asarray(img), self.mean, self.std)


def _color_jitter(arr: np.ndarray, rng: np.random.Generator,
                  strength: float) -> np.ndarray:
    """Brightness/contrast/saturation jitter by ±strength (aimv2 recipe,
    main_linprobe.py:224: ColorJitter(0.3))."""
    x = arr.astype(np.float32)
    b = rng.uniform(1 - strength, 1 + strength)
    x = x * b
    c = rng.uniform(1 - strength, 1 + strength)
    mean = x.mean()
    x = (x - mean) * c + mean
    s = rng.uniform(1 - strength, 1 + strength)
    gray = x @ np.array([0.299, 0.587, 0.114], np.float32)
    x = (x - gray[..., None]) * s + gray[..., None]
    return np.clip(x, 0, 255).astype(np.uint8)


def build_transforms(cfg):
    """Train/val transform pair from a TrainConfig (main_linprobe.py:210-237).
    OpenCLIP towers use CLIP's own normalization constants (:210-211)."""
    mean, std = ((CLIP_MEAN, CLIP_STD) if getattr(cfg, "openclip", False)
                 else (IMAGENET_MEAN, IMAGENET_STD))
    if cfg.train_aug == "aimv2":
        train = TrainTransform(cfg.image_size, scale=(0.08, 1.0),
                               ratio=(0.75, 1.33), color_jitter=0.3,
                               autoaugment=True, mean=mean, std=std)
    else:
        train = TrainTransform(cfg.image_size, mean=mean, std=std)
    val = ValTransform(cfg.image_size, mean=mean, std=std)
    if cfg.knn_eval:  # kNN mode evaluates train images deterministically
        train = val
    return train, val
