"""Unrolled small-matrix linalg vs numpy oracles."""

import numpy as np
import jax.numpy as jnp

from loam_velodyne_tpu.utils.linalg import cholesky_solve, jacobi_eigh


def _psd(rng, n=6, cond=1.0):
    m = rng.normal(size=(n, n))
    a = m @ m.T + cond * np.eye(n)
    return a.astype(np.float32)


def test_cholesky_solve_matches_numpy(rng):
    for _ in range(10):
        a = _psd(rng)
        b = rng.normal(size=6).astype(np.float32)
        x = np.asarray(cholesky_solve(jnp.asarray(a), jnp.asarray(b)))
        ref = np.linalg.solve(a.astype(np.float64), b.astype(np.float64))
        np.testing.assert_allclose(x, ref, rtol=2e-3, atol=1e-4)


def test_cholesky_solve_survives_near_singular(rng):
    a = _psd(rng, cond=0.0)
    a[5] = a[4]   # exactly rank-deficient row
    a = (a + a.T) / 2
    b = rng.normal(size=6).astype(np.float32)
    x = np.asarray(cholesky_solve(jnp.asarray(a), jnp.asarray(b)))
    assert np.isfinite(x).all()


def test_jacobi_eigh_matches_numpy(rng):
    for _ in range(10):
        a = _psd(rng)
        w, v = jacobi_eigh(jnp.asarray(a))
        w, v = np.asarray(w), np.asarray(v)
        w_ref, v_ref = np.linalg.eigh(a.astype(np.float64))
        np.testing.assert_allclose(w, w_ref, rtol=2e-3, atol=1e-3)
        # eigenvector property: A v = w v
        for i in range(6):
            np.testing.assert_allclose(a @ v[:, i], w[i] * v[:, i],
                                       atol=5e-2 * max(1, abs(w[i])))


def test_jacobi_eigh_orthogonal(rng):
    a = _psd(rng)
    _, v = jacobi_eigh(jnp.asarray(a))
    v = np.asarray(v)
    np.testing.assert_allclose(v @ v.T, np.eye(6), atol=1e-4)
