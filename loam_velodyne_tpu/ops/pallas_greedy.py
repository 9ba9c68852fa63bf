"""Pallas TPU kernel: greedy suppressed feature picking.

The greedy corner/flat pick is inherently sequential (each pick
suppresses +/-curvature_region neighbors before the next candidate is
considered, reference BasicScanRegistration.cpp:196-243 + markAsPicked
:367-386). As a ``lax.fori_loop`` in XLA this costs one kernel dispatch
per candidate step (~100 steps x ~7-30us overhead per sweep — pure
launch latency, the math is trivial). This kernel runs the whole loop
inside ONE Mosaic program: all (rows = ring x region, P) state lives in
VMEM and the per-step work is dense (rows, P) vector ops, so the
sequential chain costs VPU cycles instead of dispatches.

Candidate gathers are expressed as one-hot reductions (col == idx),
which vectorize losslessly on the 8x128 VPU; at (96, 2048) a full pick
loop is ~100 x ~10 dense ops — well under a millisecond.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

LABEL_SHARP = 2
LABEL_LESS_SHARP = 1
LABEL_FLAT = -1


def _greedy_kernel(curv_ref, cand_idx_ref, cand_ok_ref, picked0_ref,
                   left_ref, right_ref, labels_ref, marks_ref,
                   *, k_cap: int, threshold: float, quota: int,
                   sharp_quota: int, is_corner: bool):
    rows, p = curv_ref.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, p), 1)
    curv = curv_ref[:]
    left = left_ref[:]
    right = right_ref[:]
    cand_all = cand_idx_ref[:]                      # (rows, K)
    ok_all = cand_ok_ref[:]
    kcol = jax.lax.broadcasted_iota(jnp.int32, cand_all.shape, 1)

    def body(k, carry):
        picked, labels, n_picked = carry
        # one-hot column select — Mosaic cannot do dynamic lane-dim
        # loads (k is a loop-carried scalar)
        sel_k = kcol == k
        idx = jnp.sum(jnp.where(sel_k, cand_all, 0), axis=1)   # (rows,)
        ok = jnp.sum(jnp.where(sel_k, ok_all, 0), axis=1)
        sel = col == idx[:, None]                   # (rows, p) one-hot

        c_i = jnp.sum(jnp.where(sel, curv, 0.0), axis=1)
        picked_i = jnp.sum(jnp.where(sel, picked, 0), axis=1) > 0
        if is_corner:
            passes = c_i > threshold
        else:
            passes = c_i < threshold
        eligible = (ok > 0) & ~picked_i & passes & (n_picked < quota)
        n_new = n_picked + eligible.astype(jnp.int32)

        if is_corner:
            lab = jnp.where(n_new <= sharp_quota, LABEL_SHARP,
                            LABEL_LESS_SHARP)
        else:
            lab = jnp.full((rows,), LABEL_FLAT, jnp.int32)
        labels = jnp.where(sel & eligible[:, None], lab[:, None], labels)

        lo = idx - jnp.sum(jnp.where(sel, left, 0), axis=1)
        hi = idx + jnp.sum(jnp.where(sel, right, 0), axis=1)
        newmark = ((col >= lo[:, None]) & (col <= hi[:, None])
                   & eligible[:, None])
        return picked | newmark.astype(jnp.int32), labels, n_new

    picked, labels, _ = jax.lax.fori_loop(
        0, k_cap, body,
        (picked0_ref[:], jnp.zeros((rows, p), jnp.int32),
         jnp.zeros((rows,), jnp.int32)))
    labels_ref[:] = labels
    marks_ref[:] = picked - picked0_ref[:]


@functools.partial(jax.jit, static_argnames=("threshold", "quota",
                                             "sharp_quota", "is_corner",
                                             "n_steps", "interpret"))
def greedy_pick_rows(curv: Array, cand_idx: Array, cand_ok: Array,
                     picked0: Array, left_ext: Array, right_ext: Array,
                     threshold: float, quota: int, sharp_quota: int,
                     is_corner: bool, n_steps: int | None = None,
                     interpret: bool = False) -> Tuple[Array, Array]:
    """Batched greedy pick over (rows, P) state.

    curv (rows, P) f32; cand_idx/cand_ok (rows, K); picked0 (rows, P)
    bool; exts (rows, P) i32. Returns (labels (rows, P) i32,
    new_marks (rows, P) bool).

    n_steps: how many candidate steps to actually run (<= K). The
    candidate arrays are lane-padded to multiples of 128 with ok=False
    rows; without this cap the padding costs real no-op loop steps
    (flat picks: 64 -> 128, i.e. 2x the sequential chain for nothing).
    """
    rows, p = curv.shape
    k_cap = cand_idx.shape[1]
    steps = min(n_steps, k_cap) if n_steps is not None else k_cap
    # Row-block the grid so each block's VMEM residency stays small
    # (HDL-64E is 384 rows x 2304 cols; 6 arrays of that would blow the
    # ~16 MB VMEM budget in one block).
    block_rows = rows
    for cand_block in (64, 96, 128):
        if rows % cand_block == 0:
            block_rows = cand_block
            break
    grid = rows // block_rows

    kernel = functools.partial(
        _greedy_kernel, k_cap=steps, threshold=threshold, quota=quota,
        sharp_quota=sharp_quota, is_corner=is_corner)

    def row_spec(cols):
        return pl.BlockSpec((block_rows, cols), lambda b: (b, 0),
                            memory_space=pltpu.VMEM)

    labels, marks = pl.pallas_call(
        kernel,
        grid=(grid,),
        out_shape=(jax.ShapeDtypeStruct((rows, p), jnp.int32),
                   jax.ShapeDtypeStruct((rows, p), jnp.int32)),
        in_specs=[row_spec(p), row_spec(k_cap), row_spec(k_cap),
                  row_spec(p), row_spec(p), row_spec(p)],
        out_specs=(row_spec(p), row_spec(p)),
        interpret=interpret,
    )(curv, cand_idx, cand_ok.astype(jnp.int32),
      picked0.astype(jnp.int32), left_ext, right_ext)
    return labels, marks > 0


def supports_pallas() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False
