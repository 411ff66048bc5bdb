"""Checkpoint edge semantics: lenient restore on shape mismatch
(head-shape key dropping, main_linprobe.py:392-395 / util/misc.py:325-347)
and the auto-resume newest-by-name glob (main_linprobe.py:764-773)."""
import numpy as np
import pytest

from ep_tpu.runtime.checkpoint import _merge_lenient, find_auto_resume


def test_merge_lenient_keeps_template_on_shape_mismatch():
    template = {
        "head": {"fc": {"kernel": np.zeros((8, 10)), "bias": np.zeros(10)}},
        "pool": {"w": np.zeros((4, 4))},
    }
    loaded = {
        "head": {"fc": {"kernel": np.ones((8, 5)),  # nb_classes changed
                        "bias": np.ones(10)}},
        "pool": {"w": np.ones((4, 4))},
    }
    out = _merge_lenient(template, loaded)
    # mismatched leaf keeps the template init
    np.testing.assert_array_equal(out["head"]["fc"]["kernel"],
                                  np.zeros((8, 10)))
    # matching leaves are restored
    np.testing.assert_array_equal(out["head"]["fc"]["bias"], np.ones(10))
    np.testing.assert_array_equal(out["pool"]["w"], np.ones((4, 4)))


def test_merge_lenient_ignores_extra_and_missing_keys():
    template = {"a": np.zeros(3), "b": np.zeros(2)}
    loaded = {"a": np.ones(3), "zzz": np.ones(9)}  # extra key, missing 'b'
    out = _merge_lenient(template, loaded)
    np.testing.assert_array_equal(out["a"], np.ones(3))
    np.testing.assert_array_equal(out["b"], np.zeros(2))


def test_find_auto_resume_newest_by_name(tmp_path):
    assert find_auto_resume(str(tmp_path)) is None
    (tmp_path / "checkpoint-_3.msgpack").write_bytes(b"x")
    (tmp_path / "checkpoint-_12.msgpack").write_bytes(b"x")
    (tmp_path / "other.txt").write_bytes(b"x")
    # numeric-aware sort: epoch 12 beats epoch 3 (the reference's lexical
    # glob would pick '_3'; that ordering was a latent bug — VERDICT r2)
    found = find_auto_resume(str(tmp_path))
    assert found.endswith("checkpoint-_12.msgpack")
    assert find_auto_resume("") is None
    assert find_auto_resume(str(tmp_path / "missing")) is None


def test_find_auto_resume_name_order_beats_mtime(tmp_path):
    # name order is primary (mtime only breaks exact-name ties): an older
    # mtime on the name-wise-newest checkpoint must not demote it
    import os
    a = tmp_path / "checkpoint-best.msgpack"
    b = tmp_path / "checkpoint-last.msgpack"
    a.write_bytes(b"x")
    b.write_bytes(b"x")
    os.utime(a, (2_000_000_000, 2_000_000_000))
    assert find_auto_resume(str(tmp_path)).endswith("checkpoint-last.msgpack")
