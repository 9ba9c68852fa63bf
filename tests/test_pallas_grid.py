"""ops/pallas_grid.py: the DMA window gather must be bit-identical to
the vmapped dynamic_slice formulation it replaces on TPU."""

import jax
import jax.numpy as jnp
import numpy as np

from loam_velodyne_tpu.ops.pallas_grid import grid_windows


def _xla_windows(cols, starts, p_cap):
    def one(col):
        return jax.vmap(
            lambda s: jax.lax.dynamic_slice(col, (s,), (p_cap,))
        )(starts)
    return jnp.stack([one(cols[c]) for c in range(cols.shape[0])], axis=1)


def test_grid_windows_matches_dynamic_slice():
    rng = np.random.default_rng(0)
    c, n, p, r = 4, 4096, 512, 16
    cols = jnp.asarray(rng.normal(size=(c, n + p + 128)).astype(np.float32))
    # ragged, unaligned, includes 0 and the max legal start
    starts = jnp.asarray(
        np.sort(rng.integers(0, n, size=r)).astype(np.int32)
    ).at[0].set(0).at[-1].set(n)
    got = grid_windows(cols, starts, p, interpret=True)
    want = _xla_windows(cols, starts, p)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_grid_windows_empty_and_duplicate_starts():
    c, n, p = 4, 1024, 256
    cols = jnp.arange(c * (n + p + 128), dtype=jnp.float32).reshape(c, n + p + 128)
    starts = jnp.asarray([0, 0, 7, 7, 1024, 1024], jnp.int32)
    got = grid_windows(cols, starts, p, interpret=True)
    want = _xla_windows(cols, starts, p)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
