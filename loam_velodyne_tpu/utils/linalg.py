"""Small fixed-size linear algebra as fully unrolled VPU kernels.

NEGATIVE RESULT — NOT USED BY THE PIPELINE. Measured SLOWER than the
jnp.linalg lowerings it was meant to replace (59.2 vs 64.3 sweeps/s on
the round-1 bench: sequential scalar dependency chains do not
vectorize on the VPU; PERF.md lever 4). Kept, with its tests, as the
documented record of that measurement so the experiment isn't re-run
by a future optimization pass.

``jnp.linalg.solve``/``eigh`` lower to general LU/QDWH algorithms with
data-dependent iteration — built for large matrices, pathological for
the 6x6 Gauss-Newton systems here (hundreds of sequential micro-kernels
per call inside the GN while_loops). These unrolled static versions
compile to one fused elementwise chain.

- cholesky_solve: unrolled Cholesky with a relative ridge. The systems
  are A^T A (PSD); rank deficiency is handled downstream by the
  degeneracy projector (reference BasicLaserOdometry.cpp:561-597), so a
  tiny ridge only stabilizes the factorization.
- jacobi_eigh: fixed-sweep cyclic Jacobi eigendecomposition. For 6x6
  symmetric matrices ~8 sweeps reach float32 accuracy; output is
  (ascending eigenvalues, column eigenvectors) like ``jnp.linalg.eigh``.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def cholesky_solve(a: Array, b: Array, ridge_rel: float = 1e-7) -> Array:
    """Solve a x = b for symmetric PSD a (n,n) with unrolled Cholesky."""
    n = a.shape[-1]
    ridge = ridge_rel * (jnp.trace(a) / n + 1e-12)
    a = a + ridge * jnp.eye(n, dtype=a.dtype)

    l = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = a[i, j]
            for k in range(j):
                s = s - l[i][k] * l[j][k]
            if i == j:
                l[i][j] = jnp.sqrt(jnp.maximum(s, 1e-20))
            else:
                l[i][j] = s / l[j][j]

    y = [None] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = s - l[i][k] * y[k]
        y[i] = s / l[i][i]

    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - l[k][i] * x[k]
        x[i] = s / l[i][i]
    return jnp.stack(x)


def jacobi_eigh(a: Array, sweeps: int = 8) -> Tuple[Array, Array]:
    """Eigendecomposition of a symmetric (n,n) matrix by cyclic Jacobi.

    Returns (eigenvalues ascending, eigenvectors as columns). Fully
    unrolled: n(n-1)/2 * sweeps static rotations of two rows/columns.
    """
    n = a.shape[-1]
    v = jnp.eye(n, dtype=a.dtype)

    for _ in range(sweeps):
        for p in range(n - 1):
            for q in range(p + 1, n):
                apq = a[p, q]
                app = a[p, p]
                aqq = a[q, q]
                # rotation angle zeroing a[p, q]
                tau = (aqq - app) / (2.0 * jnp.where(
                    jnp.abs(apq) < 1e-30, 1e-30, apq))
                t = jnp.sign(tau) / (jnp.abs(tau)
                                     + jnp.sqrt(1.0 + tau * tau))
                t = jnp.where(jnp.abs(apq) < 1e-30, 0.0, t)
                c = 1.0 / jnp.sqrt(1.0 + t * t)
                s = t * c

                rp = a[p, :]
                rq = a[q, :]
                a = a.at[p, :].set(c * rp - s * rq)
                a = a.at[q, :].set(s * rp + c * rq)
                cp = a[:, p]
                cq = a[:, q]
                a = a.at[:, p].set(c * cp - s * cq)
                a = a.at[:, q].set(s * cp + c * cq)

                vp = v[:, p]
                vq = v[:, q]
                v = v.at[:, p].set(c * vp - s * vq)
                v = v.at[:, q].set(s * vp + c * vq)

    w = jnp.diagonal(a)
    order = jnp.argsort(w)
    return w[order], v[:, order]
