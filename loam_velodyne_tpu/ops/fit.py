"""Batched small-matrix fits for the mapping stage.

The reference fits, per query point, a line through the 5 nearest map
corners via a 3x3 covariance eigendecomposition
(BasicLaserMapping.cpp:665-752) and a plane through the 5 nearest map
surfels via a QR solve of Ax=-1 (:754-817) — one Eigen solver call per
point. Here both are closed-form batched VPU math: an analytic
trigonometric 3x3 symmetric eigensolver and an adjugate-based 3x3
normal-equation solve, vmappable over tens of thousands of queries with
no iterative solver in sight.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

_EPS = 1e-12


def sym3x3_eigvalues(a: Array) -> Array:
    """Eigenvalues of symmetric (..., 3, 3) matrices, ascending.

    Analytic trigonometric method (stable for the small PSD covariance
    matrices used here); no data-dependent iteration, so it vectorizes
    losslessly on the VPU.
    """
    a00, a01, a02 = a[..., 0, 0], a[..., 0, 1], a[..., 0, 2]
    a11, a12, a22 = a[..., 1, 1], a[..., 1, 2], a[..., 2, 2]
    p1 = a01 * a01 + a02 * a02 + a12 * a12
    q = (a00 + a11 + a22) / 3.0
    p2 = (a00 - q) ** 2 + (a11 - q) ** 2 + (a22 - q) ** 2 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, _EPS))

    b00, b11, b22 = (a00 - q) / p, (a11 - q) / p, (a22 - q) / p
    b01, b02, b12 = a01 / p, a02 / p, a12 / p
    detb = (b00 * (b11 * b22 - b12 * b12)
            - b01 * (b01 * b22 - b12 * b02)
            + b02 * (b01 * b12 - b11 * b02))
    r = jnp.clip(detb / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    e_hi = q + 2.0 * p * jnp.cos(phi)
    e_lo = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e_mid = 3.0 * q - e_hi - e_lo
    # Degenerate (isotropic) case: all eigenvalues equal q.
    iso = p2 <= _EPS
    e_hi = jnp.where(iso, q, e_hi)
    e_mid = jnp.where(iso, q, e_mid)
    e_lo = jnp.where(iso, q, e_lo)
    return jnp.stack([e_lo, e_mid, e_hi], axis=-1)


def sym3x3_top_eigvector(a: Array, eigs: Array) -> Array:
    """Unit eigenvector for the LARGEST eigenvalue of symmetric (...,3,3).

    Uses (A - e_lo I)(A - e_mid I), whose columns span the top
    eigenspace; picks the largest column for stability.
    """
    eye = jnp.eye(3, dtype=a.dtype)
    m = jnp.matmul(a - eigs[..., 0, None, None] * eye,
                   a - eigs[..., 1, None, None] * eye,
                   precision=jax.lax.Precision.HIGHEST)
    norms = jnp.sum(m * m, axis=-2)           # column squared norms (...,3)
    best = jnp.argmax(norms, axis=-1)
    v = jnp.take_along_axis(m, best[..., None, None].repeat(3, axis=-2),
                            axis=-1)[..., 0]
    n = jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True), _EPS))
    return v / n


def line_fit(neighbors: Array,
             eigen_ratio: float = 3.0) -> Tuple[Array, Array, Array]:
    """Fit an edge line to (..., K, 3) neighbor sets.

    Returns (centroid, direction, valid) where valid applies the
    reference's eigenvalue-ratio test lambda_max > ratio * lambda_mid
    (BasicLaserMapping.cpp:699, ratio 3) and direction is the principal
    axis. Callers pass MappingConfig.line_eigen_ratio.
    """
    c = jnp.mean(neighbors, axis=-2)
    d = neighbors - c[..., None, :]
    cov = jnp.einsum("...ki,...kj->...ij", d, d,
                     precision=jax.lax.Precision.HIGHEST) / neighbors.shape[-2]
    eigs = sym3x3_eigvalues(cov)
    direction = sym3x3_top_eigvector(cov, eigs)
    valid = eigs[..., 2] > eigen_ratio * eigs[..., 1]
    return c, direction, valid


def solve3x3(a: Array, b: Array) -> Array:
    """Solve (...,3,3) @ x = (...,3) by the adjugate (closed form)."""
    m = a
    c00 = m[..., 1, 1] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 1]
    c01 = m[..., 1, 2] * m[..., 2, 0] - m[..., 1, 0] * m[..., 2, 2]
    c02 = m[..., 1, 0] * m[..., 2, 1] - m[..., 1, 1] * m[..., 2, 0]
    det = (m[..., 0, 0] * c00 + m[..., 0, 1] * c01 + m[..., 0, 2] * c02)
    det = jnp.where(jnp.abs(det) < _EPS, _EPS, det)
    adj = jnp.stack([
        jnp.stack([c00,
                   m[..., 0, 2] * m[..., 2, 1] - m[..., 0, 1] * m[..., 2, 2],
                   m[..., 0, 1] * m[..., 1, 2] - m[..., 0, 2] * m[..., 1, 1]], -1),
        jnp.stack([c01,
                   m[..., 0, 0] * m[..., 2, 2] - m[..., 0, 2] * m[..., 2, 0],
                   m[..., 0, 2] * m[..., 1, 0] - m[..., 0, 0] * m[..., 1, 2]], -1),
        jnp.stack([c02,
                   m[..., 0, 1] * m[..., 2, 0] - m[..., 0, 0] * m[..., 2, 1],
                   m[..., 0, 0] * m[..., 1, 1] - m[..., 0, 1] * m[..., 1, 0]], -1),
    ], -2)
    x = jnp.einsum("...ij,...j->...i", adj, b)
    return x / det[..., None]


def plane_fit(neighbors: Array, max_residual: float
              ) -> Tuple[Array, Array, Array]:
    """Fit a plane n.x + d = 0 to (..., K, 3) neighbor sets.

    Solves the reference's A n = -1 system (BasicLaserMapping.cpp:767-776)
    through the 3x3 normal equations; returns (unit_normal, d, valid)
    with valid = all |n.p + d| <= max_residual (:779-788).
    """
    hi = jax.lax.Precision.HIGHEST
    ata = jnp.einsum("...ki,...kj->...ij", neighbors, neighbors, precision=hi)
    atb = -jnp.sum(neighbors, axis=-2)
    n_raw = solve3x3(ata, atb)
    inv_norm = 1.0 / jnp.sqrt(jnp.maximum(jnp.sum(n_raw * n_raw, -1), _EPS))
    n = n_raw * inv_norm[..., None]
    d = inv_norm
    res = jnp.abs(jnp.einsum("...kj,...j->...k", neighbors, n)
                  + d[..., None])
    valid = jnp.all(res <= max_residual, axis=-1)
    return n, d, valid
