"""Pallas grouped windowed k-NN kernel vs exact NumPy top-k
(interpret mode on CPU; the real Mosaic path runs in the TPU bench)."""

import numpy as np
import pytest

import jax.numpy as jnp

from loam_velodyne_tpu.ops.pallas_knn import grouped_window_knn


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _exact(qg, win, k):
    d2 = ((qg[:, :, None, :] - win[:, None, :, :]) ** 2).sum(-1)
    order = np.argsort(d2, axis=-1, kind="stable")[..., :k]
    return np.take_along_axis(d2, order, axis=-1), order


def test_matches_exact_topk(rng):
    t, g, w, k = 4, 16, 128, 5
    qg = rng.normal(size=(t, g, 3)).astype(np.float32) * 5
    win = rng.normal(size=(t, w, 3)).astype(np.float32) * 5
    d2k, colk = grouped_window_knn(jnp.asarray(qg), jnp.asarray(win),
                                   k=k, interpret=True)
    d2k, colk = np.asarray(d2k), np.asarray(colk)
    exp_d2, _ = _exact(qg, win, k)
    np.testing.assert_allclose(d2k, exp_d2, rtol=1e-6, atol=1e-6)
    # returned columns must reproduce the returned distances
    nbr = np.take_along_axis(win, colk.reshape(t, g * k, 1), axis=1
                             ).reshape(t, g, k, 3)
    re_d2 = ((qg[:, :, None, :] - nbr) ** 2).sum(-1)
    np.testing.assert_allclose(re_d2, d2k, rtol=1e-6, atol=1e-6)


def test_sentinel_padding_exceeds_gates(rng):
    t, g, w, k = 1, 8, 64, 5
    qg = rng.normal(size=(t, g, 3)).astype(np.float32)
    win = np.full((t, w, 3), 1e8, np.float32)      # all padding
    win[0, 0] = qg[0, 0]                           # one real point
    d2k, colk = grouped_window_knn(jnp.asarray(qg), jnp.asarray(win),
                                   k=k, interpret=True)
    d2k = np.asarray(d2k)
    assert d2k[0, 0, 0] < 1e-6                     # the real neighbor
    # every query sees the single real point first, then sentinels —
    # which land far beyond any acceptance gate
    assert (d2k[0, :, 0] < 1e3).all()
    assert (d2k[0, :, 1:] > 1e6).all()


def test_ascending_order(rng):
    t, g, w, k = 2, 8, 64, 5
    qg = rng.normal(size=(t, g, 3)).astype(np.float32)
    win = rng.normal(size=(t, w, 3)).astype(np.float32)
    d2k, _ = grouped_window_knn(jnp.asarray(qg), jnp.asarray(win),
                                k=k, interpret=True)
    d2k = np.asarray(d2k)
    assert (np.diff(d2k, axis=-1) >= -1e-7).all()
