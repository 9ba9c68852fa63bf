"""Pallas TPU kernel: grouped windowed k-NN distance tile in VMEM.

The mapping stage's 5-NN refresh (ops/neighbors.tiled_windowed_knn,
replacing the reference's per-point KD-tree queries,
BasicLaserMapping.cpp:669-671/:758-760) computes a (G, W) squared
-distance tile per query group against a contiguous window of the
axis-sorted map cloud. In XLA that tile materializes in HBM between
the subtract/square fusion and ``approx_min_k`` — ~134 MB of traffic
per batched dispatch at (B=8, Q=4096, W=1024), the largest memory
consumer of the batched mapping program.

This kernel keeps the tile in VMEM: for each group it computes the
distances and extracts the exact top-k by iterative min + one-hot
masking (k=5 passes of dense (G, W) VPU work). Distances use the
difference form in full f32 (no MXU involvement — same precision
contract as ops/neighbors.pairwise_sq_dist).

Outputs match ``approx_min_k`` semantics where it matters: ascending
exact top-k per query; padded window rows carry the far sentinel so
their distances exceed every acceptance gate.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _knn_kernel(qg_ref, win_ref, d2_ref, col_ref, *, k: int):
    qg = qg_ref[0]                               # (G, 3)
    win = win_ref[0]                             # (3, W)
    g = qg.shape[0]
    w = win.shape[1]

    d2 = jnp.zeros((g, w), jnp.float32)
    for c in range(3):
        diff = qg[:, c][:, None] - win[c, :][None, :]
        d2 = d2 + diff * diff

    col = jax.lax.broadcasted_iota(jnp.int32, (g, w), 1)
    big = jnp.float32(jnp.inf)
    for j in range(k):
        m = jnp.min(d2, axis=1)                  # (G,)
        is_min = d2 == m[:, None]
        cidx = jnp.min(jnp.where(is_min, col, w), axis=1)
        d2_ref[0, :, j] = m
        col_ref[0, :, j] = cidx
        d2 = jnp.where(col == cidx[:, None], big, d2)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def grouped_window_knn(q_groups: Array, windows: Array, k: int = 5,
                       interpret: bool = False) -> Tuple[Array, Array]:
    """Exact top-k per query against its group's window.

    q_groups: (T, G, 3) sorted queries; windows: (T, W, 3) candidate
    windows (far-sentinel padded). Returns (sq_dists (T, G, k) ascending,
    window-local columns (T, G, k)).
    """
    t, g, _ = q_groups.shape
    w = windows.shape[1]
    win_t = jnp.transpose(windows, (0, 2, 1))    # (T, 3, W): W on lanes

    kernel = functools.partial(_knn_kernel, k=k)
    d2, cols = pl.pallas_call(
        kernel,
        grid=(t,),
        out_shape=(jax.ShapeDtypeStruct((t, g, k), jnp.float32),
                   jax.ShapeDtypeStruct((t, g, k), jnp.int32)),
        in_specs=[
            pl.BlockSpec((1, g, 3), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, w), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((1, g, k), lambda b: (b, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, g, k), lambda b: (b, 0, 0),
                                memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(q_groups, win_t)
    return d2, cols


def supports_pallas() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False
