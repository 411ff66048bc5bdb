"""Device-side augmentation (--device_aug, data/device_aug.py):

  * the on-device crop-parameter sampler is pinned DISTRIBUTIONALLY against
    the host TF/BYOL sampler (transforms.tf_random_resized_crop_params —
    the algorithm the reference vendored for TPU parity, util/crop.py);
  * the matrix-resample matches PIL bicubic within u8 rounding;
  * staged-u8 val + device normalize equals the host ValTransform exactly;
  * the augmented step is deterministic in the step counter;
  * the full --device_aug training path learns the synthetic task.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from ep_tpu.data import device_aug as da
from ep_tpu.data.transforms import (IMAGENET_MEAN, IMAGENET_STD, ValTransform,
                                    normalize, tf_random_resized_crop_params)


def test_crop_param_distribution_matches_host():
    stage, n = 64, 8192
    scale, ratio = (0.08, 1.0), (3.0 / 4.0, 4.0 / 3.0)
    i_d, j_d, h_d, w_d = jax.jit(
        lambda k: da.sample_crop_params(k, n, stage, scale, ratio)
    )(jax.random.key(0))
    dev = np.stack([np.asarray(x) for x in (i_d, j_d, h_d, w_d)])

    rng = np.random.default_rng(0)
    host = np.array([
        tf_random_resized_crop_params(rng, stage, stage, scale, ratio)
        for _ in range(n)], np.float64).T  # rows: i, j, h, w

    # whole numbers within bounds
    assert np.all(dev == np.round(dev))
    assert dev[2].min() >= 1 and dev[2].max() <= stage
    assert np.all(dev[0] + dev[2] <= stage) and np.all(dev[1] + dev[3] <= stage)
    # distribution moments agree within a few percent of the staging side
    for d_row, h_row in zip(dev, host):
        assert abs(d_row.mean() - h_row.mean()) < 0.03 * stage, \
            (d_row.mean(), h_row.mean())
        assert abs(d_row.std() - h_row.std()) < 0.05 * stage, \
            (d_row.std(), h_row.std())
    # areas too (the quantity the scale range constrains directly)
    a_dev = (dev[2] * dev[3]).mean() / stage ** 2
    a_host = (host[2] * host[3]).mean() / stage ** 2
    assert abs(a_dev - a_host) < 0.03, (a_dev, a_host)


@pytest.mark.parametrize("box", [
    (0, 0, 64, 64),        # full-image resize (minify)
    (8, 12, 40, 32),       # interior crop
    (0, 0, 12, 12),        # strong magnification
    (30, 0, 34, 64),       # touches the bottom edge
])
def test_resample_matches_pil_bicubic(box):
    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, (64, 64, 3), np.uint8)
    out = 24
    i, j, h, w = box

    ref = np.asarray(Image.fromarray(img).resize(
        (out, out), 3, box=(j, i, j + w, i + h))).astype(np.float32)

    got = np.asarray(da.resample_crop(
        jnp.asarray(img[None]),
        jnp.asarray([float(i)]), jnp.asarray([float(j)]),
        jnp.asarray([float(h)]), jnp.asarray([float(w)]), out))[0]
    got = np.clip(got, 0, 255)

    diff = np.abs(got - ref)
    # PIL rounds to u8 between its two passes and clamps its window at the
    # image edge; with bf16 matmul operands on top, a few u8 levels of
    # difference is the expected envelope
    assert diff.mean() < 1.5, diff.mean()
    assert np.percentile(diff, 99) < 6.0, np.percentile(diff, 99)


def test_val_staging_plus_device_normalize_is_exact():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (50, 70, 3), np.uint8)
    host = ValTransform(image_size=32)(img)
    staged = da.StageValTransform(image_size=32)(img)
    assert staged.dtype == np.uint8 and staged.shape == (32, 32, 3)
    dev = np.asarray(da.normalize_u8_batch(
        jnp.asarray(staged[None]), IMAGENET_MEAN, IMAGENET_STD,
        dtype=jnp.float32))[0]
    np.testing.assert_allclose(dev, host, atol=2e-6)


def test_augment_train_batch_shapes_and_determinism():
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 256, (4, 37, 37, 3), np.uint8))
    aug = da.DeviceAug(out_size=32, stage_size=37, seed=3,
                       dtype=jnp.float32)
    a = np.asarray(aug.train_fn(jnp.asarray(5), imgs))
    b = np.asarray(aug.train_fn(jnp.asarray(5), imgs))
    c = np.asarray(aug.train_fn(jnp.asarray(6), imgs))
    assert a.shape == (4, 32, 32, 3)
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c).max() > 1e-3  # a new step draws new crops
    # normalized range sanity: values live in the (x/255 - mean)/std band
    lo = ((0 - IMAGENET_MEAN) / IMAGENET_STD).min()
    hi = ((1 - IMAGENET_MEAN) / IMAGENET_STD).max()
    assert a.min() >= lo - 1e-3 and a.max() <= hi + 1e-3


def test_stage_train_transform_u8():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (45, 81, 3), np.uint8)
    staged = da.StageTrainTransform(37)(img)
    assert staged.dtype == np.uint8 and staged.shape == (37, 37, 3)
    ref = np.asarray(Image.fromarray(img).convert("RGB").resize((37, 37), 3))
    assert np.abs(staged.astype(int) - ref.astype(int)).mean() < 2.0


def test_staged_image_cache(tmp_path):
    calls = []

    class Counting:
        def __len__(self):
            return 6

        def __getitem__(self, i):
            calls.append(i)
            rng = np.random.default_rng(i)
            return rng.integers(0, 256, (40, 50, 3), np.uint8), i % 3

    ds = da.StagedImageCache(Counting(), da.StageTrainTransform(16),
                             str(tmp_path), "train")
    first = [ds[i] for i in range(6)]
    n_calls = len(calls)
    again = [ds[i] for i in range(6)]
    assert len(calls) == n_calls  # cache hits: base dataset untouched
    for (a, la), (b, lb) in zip(first, again):
        np.testing.assert_array_equal(a, b)
        assert la == lb
    assert first[0][0].shape == (16, 16, 3)
    assert [l for _, l in first] == [0, 1, 2, 0, 1, 2]

    # a fresh process (new wrapper over the same dir) reuses the files
    calls.clear()
    ds2 = da.StagedImageCache(Counting(), da.StageTrainTransform(16),
                              str(tmp_path), "train")
    img, label = ds2[4]
    np.testing.assert_array_equal(img, first[4][0])
    assert label == 1
    assert 4 not in calls  # served from the memmap


def test_device_aug_e2e_learns(tmp_path, monkeypatch):
    import ep_tpu.cli.linprobe as linprobe
    import ep_tpu.models.assembly as assembly
    from ep_tpu.cli.linprobe import main
    from ep_tpu.configs import TrainConfig
    from ep_tpu.models.vit import ViTConfig

    tiny = ViTConfig(img_size=16, patch_size=4, embed_dim=32, depth=2,
                     num_heads=2, dtype=jnp.float32)
    monkeypatch.setattr(assembly, "build_backbone_config", lambda cfg: tiny)
    monkeypatch.setattr(linprobe, "build_backbone_config", lambda cfg: tiny)

    cfg = TrainConfig(
        dataset_name="fake", nb_classes=4, image_size=16, batch_size=32,
        model="vit_tiny_patch16", cls_features="gap", epochs=5,
        warmup_epochs=1, blr=4.0, output_dir=str(tmp_path), num_workers=2,
        amp="float32", seed=0, device_aug=True,
        device_aug_cache=str(tmp_path / "staged"))
    res = main(cfg)
    assert res["max_accuracy"] > 40.0  # chance = 25%
    import glob
    assert glob.glob(str(tmp_path / "staged" / "staged_train_*.npy"))
