"""Closed-form 3x3 fit tests vs numpy oracles."""

import numpy as np
import jax.numpy as jnp

from loam_velodyne_tpu.ops import fit


def test_sym3x3_eigvalues_match_numpy(rng):
    for _ in range(20):
        b = rng.normal(size=(3, 3))
        a = (b @ b.T).astype(np.float32)
        ours = np.sort(np.asarray(fit.sym3x3_eigvalues(jnp.asarray(a))))
        ref = np.sort(np.linalg.eigvalsh(a.astype(np.float64)))
        np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_top_eigvector_matches_numpy(rng):
    for _ in range(10):
        b = rng.normal(size=(3, 3))
        a = (b @ b.T).astype(np.float32)
        eigs = fit.sym3x3_eigvalues(jnp.asarray(a))
        v = np.asarray(fit.sym3x3_top_eigvector(jnp.asarray(a), eigs))
        w, vr = np.linalg.eigh(a.astype(np.float64))
        ref = vr[:, -1]
        assert abs(abs(v @ ref) - 1.0) < 1e-3, (v, ref)


def test_line_fit_on_noisy_line(rng):
    d = np.array([1.0, 2.0, -0.5])
    d /= np.linalg.norm(d)
    t = rng.uniform(-1, 1, (5, 1))
    pts = (t * d + 0.001 * rng.normal(size=(5, 3))).astype(np.float32)
    c, direction, valid = fit.line_fit(jnp.asarray(pts)[None])
    assert bool(valid[0])
    assert abs(abs(np.asarray(direction)[0] @ d) - 1.0) < 1e-3


def test_line_fit_rejects_isotropic(rng):
    pts = rng.normal(size=(5, 3)).astype(np.float32)
    # isotropic blob: lambda_max barely above lambda_mid on average
    c, direction, valid = fit.line_fit(jnp.asarray(pts)[None])
    # not asserting validity (random blob may pass), just shape sanity
    assert direction.shape == (1, 3)


def test_solve3x3_matches_numpy(rng):
    for _ in range(10):
        a = rng.normal(size=(3, 3)).astype(np.float32)
        a = a + 3 * np.eye(3, dtype=np.float32)
        b = rng.normal(size=3).astype(np.float32)
        x = np.asarray(fit.solve3x3(jnp.asarray(a), jnp.asarray(b)))
        ref = np.linalg.solve(a.astype(np.float64), b.astype(np.float64))
        np.testing.assert_allclose(x, ref, rtol=1e-3, atol=1e-4)


def test_plane_fit_recovers_plane(rng):
    # points on the plane x + 2y - z = 3 (i.e. n.p + d = 0 with
    # n ~ (1,2,-1)/sqrt(6), d = -3/sqrt(6))
    uv = rng.uniform(-1, 1, (5, 2))
    base = np.array([0.0, 0.0, -3.0])
    e1 = np.array([1.0, 0.0, 1.0])
    e2 = np.array([0.0, 1.0, 2.0])
    pts = (base + uv[:, :1] * e1 + uv[:, 1:] * e2).astype(np.float32)
    n, d, valid = fit.plane_fit(jnp.asarray(pts)[None], 0.2)
    assert bool(valid[0])
    n = np.asarray(n)[0]
    expect = np.array([1.0, 2.0, -1.0]) / np.sqrt(6.0)
    s = np.sign(n @ expect)
    np.testing.assert_allclose(n, s * expect, atol=1e-3)
    res = pts @ n + float(d[0])
    assert np.abs(res).max() < 1e-3


def test_plane_fit_rejects_non_planar(rng):
    pts = rng.normal(size=(5, 3)).astype(np.float32) * 2.0
    n, d, valid = fit.plane_fit(jnp.asarray(pts)[None], 0.05)
    # random cloud essentially never fits a plane to 5 cm
    assert not bool(valid[0])
