"""Data-layer tests: TF-style crop bounds, transforms, loader sharding
semantics (DistributedSampler contract), val padding masks."""
import numpy as np
import pytest

from ep_tpu.configs import TrainConfig
from ep_tpu.data.datasets import FakeDataset, build_datasets
from ep_tpu.data.loader import DataLoader
from ep_tpu.data.transforms import (TrainTransform, ValTransform,
                                    tf_random_resized_crop_params, normalize,
                                    IMAGENET_MEAN, IMAGENET_STD)


def test_tf_crop_params_in_bounds():
    rng = np.random.default_rng(0)
    for _ in range(200):
        W, H = rng.integers(30, 500, 2)
        i, j, h, w = tf_random_resized_crop_params(rng, int(W), int(H))
        assert 0 <= i and i + h <= H
        assert 0 <= j and j + w <= W
        assert h >= 1 and w >= 1


def test_train_transform_shape_and_range():
    t = TrainTransform(32)
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (60, 80, 3), np.uint8)
    out = t(img, rng)
    assert out.shape == (32, 32, 3)
    assert out.dtype == np.float32
    # normalized range sanity
    assert out.min() > -3.5 and out.max() < 3.5


def test_val_transform_resize_centercrop():
    t = ValTransform(32)  # resize short side to 37, center-crop 32
    img = np.full((100, 50, 3), 128, np.uint8)
    out = t(img)
    assert out.shape == (32, 32, 3)
    expected = (128 / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_allclose(out[16, 16], expected, atol=1e-5)


def test_loader_shards_cover_dataset():
    """Union of per-process shards must cover the dataset exactly (with
    wraparound padding), matching DistributedSampler."""
    ds = FakeDataset(n=101, num_classes=5, image_size=8)
    t = ValTransform(8)
    seen = []
    for p in range(4):
        dl = DataLoader(ds, 16, t, shuffle=True, seed=3, num_processes=4,
                        process_index=p, num_workers=1)
        dl.set_epoch(2)
        seen.append(dl._indices())
    lens = {len(s) for s in seen}
    assert len(lens) == 1  # identical per-process lengths
    union = np.concatenate(seen)
    assert set(union.tolist()) == set(range(101))


def test_loader_epoch_reshuffles():
    ds = FakeDataset(n=64, num_classes=4, image_size=8)
    dl = DataLoader(ds, 8, ValTransform(8), shuffle=True, seed=0)
    dl.set_epoch(0)
    i0 = dl._indices().copy()
    dl.set_epoch(1)
    i1 = dl._indices().copy()
    assert not np.array_equal(i0, i1)
    dl.set_epoch(0)
    np.testing.assert_array_equal(dl._indices(), i0)  # deterministic


def test_loader_drop_last_and_padding():
    ds = FakeDataset(n=70, num_classes=4, image_size=8)
    t = ValTransform(8)
    train = DataLoader(ds, 32, t, shuffle=True, drop_last=True)
    assert len(train) == 2
    val = DataLoader(ds, 32, t, drop_last=False)
    assert len(val) == 3
    batches = list(iter(val))
    imgs, labels, valid = batches[-1]
    assert imgs.shape == (32, 8, 8, 3)
    assert valid.sum() == 70 - 64
    assert (valid[: 70 - 64] == 1).all() and (valid[70 - 64:] == 0).all()


def test_fake_dataset_dispatch():
    cfg = TrainConfig(dataset_name="fake", nb_classes=6, image_size=16)
    tr, va = build_datasets(cfg)
    assert len(tr.classes) == 6
    img, label = tr[0]
    assert img.shape == (16, 16, 3)
    assert 0 <= label < 6


def test_unknown_dataset_raises():
    cfg = TrainConfig(dataset_name="nope")
    with pytest.raises(ValueError):
        build_datasets(cfg)


def test_grain_loader_matches_thread_loader_sharding():
    """GrainDataLoader implements the same DistributedSampler contract as the
    threaded loader: identical per-epoch index assignment."""
    from ep_tpu.data.grain_loader import GrainDataLoader
    ds = FakeDataset(n=101, num_classes=5, image_size=8)
    t = ValTransform(8)
    for p in range(3):
        a = DataLoader(ds, 16, t, shuffle=True, seed=7, num_processes=3,
                       process_index=p)
        b = GrainDataLoader(ds, 16, t, shuffle=True, seed=7, num_processes=3,
                            process_index=p)
        a.set_epoch(4)
        b.set_epoch(4)
        np.testing.assert_array_equal(a._indices(), b._indices())
        assert len(a) == len(b)


def test_build_transforms_v2():
    """v2 (DINO-style) builder: val = Resize(int(size*16/14)) + CenterCrop;
    dino_aug swaps the train stack; cifar bypasses to Normalize(0.5,0.5)."""
    import numpy as np
    from ep_tpu.data.transforms import (DinoAugTransform, PlainCifarTransform,
                                        TrainTransform, build_transforms_v2)

    rng = np.random.default_rng(0)
    img = (rng.random((64, 48, 3)) * 255).astype(np.uint8)

    tr, va = build_transforms_v2(32)
    assert isinstance(tr, TrainTransform) and tr.scale == (0.2, 1.0)
    assert va.resize_to == int(32 * 16 / 14)  # truncated, not rounded
    assert va(img).shape == (32, 32, 3)

    tr, _ = build_transforms_v2(32, dino_aug=True)
    assert isinstance(tr, DinoAugTransform)
    out = tr(img, np.random.default_rng(1))
    assert out.shape == (32, 32, 3) and out.dtype == np.float32
    # deterministic under a fixed rng
    out2 = tr(img, np.random.default_rng(1))
    np.testing.assert_array_equal(out, out2)
    # aug branches all execute across seeds without error
    for s in range(20):
        tr(img, np.random.default_rng(s))

    tr, va = build_transforms_v2(32, dataset_name="cifar10")
    assert isinstance(tr, PlainCifarTransform) and tr is va
    cif = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
    out = va(cif)
    assert out.shape == (32, 32, 3)
    # Normalize(0.5, 0.5): x/255*2-1 range
    np.testing.assert_allclose(out, cif.astype(np.float32) / 255 * 2 - 1,
                               atol=1e-5)
