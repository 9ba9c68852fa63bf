"""Pallas TPU kernel: ring-grid window gather.

The ingest stage (ops/scan.py::ingest_sweep) lays the sweep out as a
ring-sorted flat cloud and then reads the (R, P) ring grid as R
contiguous windows ``sorted[starts[r] : starts[r]+P]``. In XLA the
vmapped ``dynamic_slice`` lowers to a *gather* whose starts are only
known at run time — on TPU that executes at element granularity and
profiled at 3.1 ms/sweep on HDL-64E (the single largest kernel of the
whole pipeline), for what is logically 2.4 MB of contiguous copies.

Here the sorted component columns live in VMEM once and each grid step
r materializes its window as an *aligned* static-width slice (start
rounded down to the 128-lane tile, provable via ``pl.multiple_of``)
followed by a dynamic in-register lane roll (``pltpu.roll``) of the
sub-tile remainder — Mosaic cannot form a ``memref_slice`` at an
unaligned lane offset, but a roll is plain VPU work.

Exactness contract: pure data movement — bit-identical to the
dynamic_slice formulation. Requires ``p_cap % 128 == 0`` and the
column buffer padded so ``starts[r] + p_cap + 128 <= Npad`` with
``Npad % 128 == 0``; ops/scan.py pads by ``p_cap + 128`` and clamps
nothing (starts are cumsum sums <= n). The XLA windows path stays as
the CPU fallback and the test oracle (tests/test_pallas_grid.py).

Reference parity note: this materializes the same per-ring point rows
as the reference's per-scan ``_laserCloudScans[r]`` vectors
(MultiScanRegistration.cpp:180-188) — layout change only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_LANE = 128


def _grid_kernel(starts_ref, cols_ref, out_ref, *, p_cap: int):
    r = pl.program_id(0)
    s = starts_ref[r]
    d = jax.lax.rem(s, _LANE)
    a = pl.multiple_of(s - d, _LANE)
    w = p_cap + _LANE
    window = cols_ref[:, pl.ds(a, w)]                    # (C, P+128)
    rolled = pltpu.roll(window, shift=w - d, axis=1)     # left-roll by d
    out_ref[0] = rolled[:, :p_cap]


@functools.partial(jax.jit, static_argnames=("p_cap", "interpret"))
def grid_windows(cols: Array, starts: Array, p_cap: int,
                 interpret: bool = False) -> Array:
    """cols (C, Npad) f32, starts (R,) i32 with
    starts[r] + p_cap + 128 <= Npad. Returns (R, C, p_cap): row r =
    cols[:, starts[r] : starts[r]+p_cap].
    """
    c, npad = cols.shape
    r = starts.shape[0]
    assert p_cap % _LANE == 0, p_cap
    assert npad % _LANE == 0 and npad >= p_cap + _LANE, (npad, p_cap)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(r,),
        in_specs=[pl.BlockSpec((c, npad), lambda b, *_: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, c, p_cap), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_grid_kernel, p_cap=p_cap),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r, c, p_cap), cols.dtype),
        interpret=interpret,
    )(starts, cols)
