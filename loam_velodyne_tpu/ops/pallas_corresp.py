"""Pallas TPU kernel: fused odometry correspondence search.

The scan-to-scan stage (ops/neighbors.py::corner_correspondences /
surf_correspondences, replacing the reference's per-point KD-tree 1-NN +
ring-bracket walks, BasicLaserOdometry.cpp:246-441) is a chain of masked
argmins over a (Q, M) squared-distance matrix. In XLA that matrix — and
every ring-bracket mask derived from it — materializes in HBM between
kernels: on HDL-64E the surf pair alone is (1536, 16384) f32 = 100 MB
per pass, several passes per refresh, ~5 refreshes per sweep. The
arithmetic is trivial; the HBM round-trips are the cost (profiled ~2 ms
per sweep, the second-largest odometry item).

This kernel streams the reference cloud through VMEM in (G, W) distance
tiles and carries the running (distance, column, ring) argmin state in
registers, so each of the two passes reads the cloud exactly once:

- pass 1: global nearest neighbor j (+ its ring, captured in-stream);
- pass 2: the ring-bracket argmins — corner: nearest with
  ring != ring(j) and |dring| <= bracket; surf: additionally the nearest
  with ring == ring(j), index != j — both from ONE recomputed tile.

Exactness contract: distances use the same difference-form f32 math as
ops/neighbors.pairwise_sq_dist (no MXU), ties resolve to the first
column (jnp.argmin semantics), masked/padding rows ride at the far
sentinel coordinate so they exceed every gate, and empty masks return
index 0 with an infinite distance — bit-compatible with the masked
brute-force path, which stays as the CPU fallback and test oracle.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_SENTINEL = 1e8          # masked/pad candidate coordinate (matches neighbors.py)
_PAD_RING = 1 << 20      # pad ring id: never inside any ring bracket
_VALID_D2 = 1e12         # any real match is closer than this; sentinels are not


def _corresp_kernel(q_ref, ref_ref, ring_ref,
                    j_ref, dj_ref, l_ref, dl_ref, m_ref, dm_ref,
                    *, w: int, bracket: float, surf_mode: bool):
    qg = q_ref[0]                                  # (G, 3)
    g = qg.shape[0]
    mp = ref_ref.shape[1]
    n_chunks = mp // w
    inf = jnp.float32(jnp.inf)

    qx = qg[:, 0][:, None]
    qy = qg[:, 1][:, None]
    qz = qg[:, 2][:, None]

    def chunk_d2(c):
        rx = ref_ref[0, c * w:(c + 1) * w][None, :]
        ry = ref_ref[1, c * w:(c + 1) * w][None, :]
        rz = ref_ref[2, c * w:(c + 1) * w][None, :]
        dx = qx - rx
        dy = qy - ry
        dz = qz - rz
        return dx * dx + dy * dy + dz * dz         # (G, W)

    col_local = jax.lax.broadcasted_iota(jnp.int32, (g, w), 1)

    # ---- pass 1: global nearest neighbor (+ its ring id, in-stream) ----
    best_d = jnp.full((g,), inf, jnp.float32)
    best_c = jnp.zeros((g,), jnp.int32)
    best_r = jnp.zeros((g,), jnp.int32)
    for c in range(n_chunks):
        d2 = chunk_d2(c)
        ring_c = ring_ref[0, c * w:(c + 1) * w][None, :]     # (1, W)
        lm = jnp.min(d2, axis=1)                             # (G,)
        is_min = d2 == lm[:, None]
        cidx = jnp.min(jnp.where(is_min, col_local, w), axis=1)
        one_hot = col_local == cidx[:, None]
        ridx = jnp.sum(jnp.where(one_hot, ring_c, 0), axis=1)
        upd = lm < best_d
        best_d = jnp.where(upd, lm, best_d)
        best_c = jnp.where(upd, cidx + c * w, best_c)
        best_r = jnp.where(upd, ridx, best_r)

    # Output blocks are (8, G) sublane-padded (Mosaic requires sublane
    # dims divisible by 8); broadcast the (G,) result across the pad.
    j_ref[0] = jnp.broadcast_to(best_c[None, :], (8, g))
    dj_ref[0] = jnp.broadcast_to(best_d[None, :], (8, g))

    # ---- pass 2: ring-bracket argmins against the captured ring(j) ----
    ring_j = best_r[:, None]                                 # (G, 1)
    j_col = best_c[:, None]
    bd_l = jnp.full((g,), inf, jnp.float32)    # corner: bracket; surf: same-ring
    bc_l = jnp.zeros((g,), jnp.int32)
    bd_m = jnp.full((g,), inf, jnp.float32)    # surf: bracket ring
    bc_m = jnp.zeros((g,), jnp.int32)
    for c in range(n_chunks):
        d2 = chunk_d2(c)
        ring_c = ring_ref[0, c * w:(c + 1) * w][None, :]
        col_g = col_local + c * w
        dring = ring_c - ring_j                              # (G, W)
        in_bracket = ((dring != 0)
                      & (jnp.abs(dring).astype(jnp.float32)
                         <= jnp.float32(bracket)))
        d2b = jnp.where(in_bracket, d2, inf)
        lm = jnp.min(d2b, axis=1)
        is_min = d2b == lm[:, None]
        cidx = jnp.min(jnp.where(is_min, col_g, mp), axis=1)
        if surf_mode:
            same = (dring == 0) & (col_g != j_col)
            d2s = jnp.where(same, d2, inf)
            lms = jnp.min(d2s, axis=1)
            is_min_s = d2s == lms[:, None]
            cidx_s = jnp.min(jnp.where(is_min_s, col_g, mp), axis=1)
            upd_s = lms < bd_l
            bd_l = jnp.where(upd_s, lms, bd_l)
            bc_l = jnp.where(upd_s, cidx_s, bc_l)
            upd = lm < bd_m
            bd_m = jnp.where(upd, lm, bd_m)
            bc_m = jnp.where(upd, cidx, bc_m)
        else:
            upd = lm < bd_l
            bd_l = jnp.where(upd, lm, bd_l)
            bc_l = jnp.where(upd, cidx, bc_l)

    l_ref[0] = jnp.broadcast_to(bc_l[None, :], (8, g))
    dl_ref[0] = jnp.broadcast_to(bd_l[None, :], (8, g))
    m_ref[0] = jnp.broadcast_to(bc_m[None, :], (8, g))
    dm_ref[0] = jnp.broadcast_to(bd_m[None, :], (8, g))


@functools.partial(jax.jit, static_argnames=("bracket", "surf_mode",
                                             "group", "chunk", "interpret"))
def _corresp_call(query_xyz: Array, ref_xyz: Array, ref_ring: Array,
                  ref_mask: Array, bracket: float, surf_mode: bool,
                  group: int = 128, chunk: int = 1024,
                  interpret: bool = False):
    """Run the fused search. Returns (j, dj, l, dl, m, dm), each (Q,).

    Empty-mask rows come back as (0, inf) exactly like the brute-force
    ``jnp.argmin`` over an all-inf row.
    """
    q = query_xyz.shape[0]
    m = ref_xyz.shape[0]
    assert q % group == 0, (q, group)
    t = q // group
    mp = ((m + chunk - 1) // chunk) * chunk

    ref = jnp.where(ref_mask[:, None], ref_xyz, _SENTINEL)
    ref = jnp.concatenate(
        [ref, jnp.full((mp - m, 3), _SENTINEL, jnp.float32)], axis=0)
    ring = jnp.where(ref_mask, ref_ring, _PAD_RING)
    ring = jnp.concatenate(
        [ring, jnp.full((mp - m,), _PAD_RING, jnp.int32)], axis=0)

    kernel = functools.partial(_corresp_kernel, w=chunk, bracket=bracket,
                               surf_mode=surf_mode)

    def out(dtype):
        return jax.ShapeDtypeStruct((t, 8, group), dtype)

    def ospec():
        return pl.BlockSpec((1, 8, group), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)

    j, dj, l, dl, mm, dm = pl.pallas_call(
        kernel,
        grid=(t,),
        out_shape=(out(jnp.int32), out(jnp.float32), out(jnp.int32),
                   out(jnp.float32), out(jnp.int32), out(jnp.float32)),
        in_specs=[
            pl.BlockSpec((1, group, 3), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, mp), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mp), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(ospec(), ospec(), ospec(), ospec(), ospec(), ospec()),
        interpret=interpret,
    )(query_xyz.reshape(t, group, 3), ref.T, ring[None, :])

    def norm(idx, d):
        idx, d = idx[:, 0, :], d[:, 0, :]    # drop the sublane pad
        real = d < _VALID_D2
        return (jnp.where(real, idx, 0).reshape(q),
                jnp.where(real, d, jnp.inf).reshape(q))

    j, dj = norm(j, dj)
    l, dl = norm(l, dl)
    mm, dm = norm(mm, dm)
    return j, dj, l, dl, mm, dm


def supports_pallas() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False
