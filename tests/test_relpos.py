"""Structural properties of the BEiT/SimMIM relative-position index
(models_simmim.py:56-75 semantics, rebuilt in models/vit.py::_rel_pos_index)."""
import numpy as np

from ep_tpu.models.vit import _rel_pos_index


def test_rel_pos_index_properties():
    wh = ww = 3
    idx = _rel_pos_index((wh, ww))
    T = wh * ww + 1
    assert idx.shape == (T, T)
    num_rel = (2 * wh - 1) * (2 * ww - 1) + 3

    # the three cls-specific entries occupy the last three table slots
    assert idx[0, 0] == num_rel - 1
    assert (idx[0, 1:] == num_rel - 3).all()
    assert (idx[1:, 0] == num_rel - 2).all()

    # all indices valid
    assert idx.min() >= 0 and idx.max() < num_rel

    # translation invariance: bias index depends only on (Δrow, Δcol)
    def rc(t):  # token -> (row, col) on the grid
        return divmod(t, ww)

    for a in range(1, T):
        for b in range(1, T):
            for c in range(1, T):
                for d in range(1, T):
                    da = np.subtract(rc(a - 1), rc(b - 1))
                    db = np.subtract(rc(c - 1), rc(d - 1))
                    if (da == db).all():
                        assert idx[a, b] == idx[c, d], (a, b, c, d)

    # zero displacement maps every diagonal entry to the same slot
    diag = np.diag(idx)[1:]
    assert (diag == diag[0]).all()


def test_rel_pos_index_distinct_displacements():
    idx = _rel_pos_index((4, 4))
    # distinct displacements must not collide: count unique patch-patch slots
    uniq = np.unique(idx[1:, 1:])
    assert len(uniq) == (2 * 4 - 1) ** 2  # every displacement realized
