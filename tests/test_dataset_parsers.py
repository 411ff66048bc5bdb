"""On-disk fixture tests for every dataset parser in the zoo
(main_linprobe.py:239-273 dispatch). Each fixture builds the minimal
standard layout the real dataset ships with."""
import json
import pickle

import numpy as np
import pytest
from PIL import Image

from ep_tpu.data import datasets as D


def _img(path, color=(255, 0, 0), size=(8, 8)):
    path.parent.mkdir(parents=True, exist_ok=True)
    Image.new("RGB", size, color).save(path)


def test_image_folder(tmp_path):
    _img(tmp_path / "cat" / "a.jpg")
    _img(tmp_path / "cat" / "b.png")
    _img(tmp_path / "dog" / "c.jpg", (0, 255, 0))
    ds = D.image_folder(tmp_path)
    assert len(ds) == 3
    assert ds.classes == ["cat", "dog"]
    img, label = ds[2]
    assert label == 1
    assert np.asarray(img).shape == (8, 8, 3)


def test_cifar100(tmp_path):
    base = tmp_path / "cifar-100-python"
    base.mkdir(parents=True)
    data = np.random.default_rng(0).integers(
        0, 255, (4, 3 * 32 * 32), np.uint8)
    for split in ("train", "test"):
        with open(base / split, "wb") as f:
            pickle.dump({"data": data, "fine_labels": [0, 1, 2, 3]}, f)
    with open(base / "meta", "wb") as f:
        pickle.dump({"fine_label_names": [f"c{i}" for i in range(100)]}, f)
    ds = D.cifar100(tmp_path, train=True)
    assert len(ds) == 4
    img, label = ds[1]
    assert img.shape == (32, 32, 3) and label == 1


def test_stl10(tmp_path):
    base = tmp_path / "stl10_binary"
    base.mkdir(parents=True)
    x = np.random.default_rng(0).integers(0, 255, (2, 3, 96, 96), np.uint8)
    (base / "train_X.bin").write_bytes(x.tobytes())
    (base / "train_y.bin").write_bytes(np.array([1, 5], np.uint8).tobytes())
    ds = D.stl10(tmp_path, "train")
    assert len(ds) == 2
    img, label = ds[0]
    assert img.shape == (96, 96, 3) and label == 0  # labels are 1-based


def test_cub200(tmp_path):
    _img(tmp_path / "images" / "001.Black_footed_Albatross" / "x1.jpg")
    _img(tmp_path / "images" / "002.Laysan_Albatross" / "x2.jpg")
    (tmp_path / "images.txt").write_text(
        "1 001.Black_footed_Albatross/x1.jpg\n"
        "2 002.Laysan_Albatross/x2.jpg\n")
    (tmp_path / "train_test_split.txt").write_text("1 1\n2 0\n")
    tr = D.cub200(tmp_path, "train")
    te = D.cub200(tmp_path, "test")
    assert len(tr) == 1 and len(te) == 1
    assert tr.items[0][1] == 0  # class index from sorted class dirs


def test_sun397(tmp_path):
    base = tmp_path / "SUN397"
    _img(base / "a" / "abbey" / "sun_001.jpg")
    _img(base / "b" / "beach" / "sun_002.jpg")
    (base / "ClassName.txt").write_text("/a/abbey\n/b/beach\n")
    (base / "Training_01.txt").write_text("/a/abbey/sun_001.jpg\n")
    (base / "Testing_01.txt").write_text("/b/beach/sun_002.jpg\n")
    tr = D.sun397(tmp_path, "train")
    te = D.sun397(tmp_path, "test")
    assert len(tr) == 1 and tr.items[0][1] == 0
    assert len(te) == 1 and te.items[0][1] == 1


def test_dtd(tmp_path):
    base = tmp_path / "dtd"
    _img(base / "images" / "banded" / "banded_0001.jpg")
    _img(base / "images" / "dotted" / "dotted_0001.jpg")
    (base / "labels").mkdir(parents=True)
    (base / "labels" / "train1.txt").write_text("banded/banded_0001.jpg\n")
    (base / "labels" / "val1.txt").write_text("dotted/dotted_0001.jpg\n")
    tr = D.dtd(tmp_path, "train")
    va = D.dtd(tmp_path, "val")
    assert len(tr) == 1 and len(va) == 1


def test_oxford_pets(tmp_path):
    base = tmp_path / "oxford-iiit-pet"
    _img(base / "images" / "Abyssinian_1.jpg")
    _img(base / "images" / "beagle_2.jpg")
    (base / "annotations").mkdir(parents=True)
    (base / "annotations" / "trainval.txt").write_text(
        "Abyssinian_1 1 1 1\nbeagle_2 2 2 1\n")
    (base / "annotations" / "test.txt").write_text("Abyssinian_1 1 1 1\n")
    tr = D.oxford_pets(tmp_path, "trainval")
    assert len(tr) == 2
    assert tr.classes[0] == "Abyssinian"


def test_food101(tmp_path):
    base = tmp_path / "food-101"
    _img(base / "images" / "apple_pie" / "1.jpg")
    _img(base / "images" / "waffles" / "2.jpg")
    (base / "meta").mkdir(parents=True)
    (base / "meta" / "train.json").write_text(
        json.dumps({"apple_pie": ["apple_pie/1"], "waffles": ["waffles/2"]}))
    tr = D.food101(tmp_path, "train")
    assert len(tr) == 2
    assert tr.classes == ["apple_pie", "waffles"]


def test_fgvc_aircraft(tmp_path):
    base = tmp_path / "fgvc-aircraft-2013b" / "data"
    _img(base / "images" / "0001.jpg")
    (base / "variants.txt").write_text("707-320\nA310\n")
    (base / "images_variant_train.txt").write_text("0001 A310\n")
    tr = D.fgvc_aircraft(tmp_path, "train")
    assert len(tr) == 1 and tr.items[0][1] == 1


def test_places365(tmp_path):
    _img(tmp_path / "data_256" / "a" / "abbey" / "1.jpg")
    _img(tmp_path / "val_256" / "Places365_val_1.jpg")
    (tmp_path / "categories_places365.txt").write_text(
        "/a/abbey 0\n/a/airfield 1\n")
    (tmp_path / "places365_train_standard.txt").write_text(
        "/a/abbey/1.jpg 0\n")
    (tmp_path / "places365_val.txt").write_text("Places365_val_1.jpg 1\n")
    tr = D.places365(tmp_path, "train")
    va = D.places365(tmp_path, "val")
    assert len(tr) == 1 and tr.items[0][1] == 0
    assert len(va) == 1 and va.items[0][1] == 1


def test_stanford_cars(tmp_path):
    sio = pytest.importorskip("scipy.io")
    base = tmp_path
    _img(base / "cars_train" / "00001.jpg")
    (base / "devkit").mkdir(parents=True)
    sio.savemat(str(base / "devkit" / "cars_meta.mat"),
                {"class_names": np.array(["AM General Hummer"], object)})
    ann = np.zeros((1,), dtype=[("fname", "O"), ("class", "O")])
    ann[0] = ("00001.jpg", 1)
    sio.savemat(str(base / "devkit" / "cars_train_annos.mat"),
                {"annotations": ann})
    tr = D.stanford_cars(base, "train")
    assert len(tr) == 1 and tr.items[0][1] == 0
