"""Scan-to-scan odometry: 6-DoF motion at sweep rate.

TPU-native re-design of the reference BasicLaserOdometry
(BasicLaserOdometry.cpp:196-664): a Gauss-Newton loop (<=25 iterations,
correspondences re-found every 5th) aligning this sweep's sharp/flat
features against the previous sweep's less-sharp/less-flat clouds via
point-to-line and point-to-plane distances, with degeneracy projection
and early abort.

Key re-designs vs the CPU reference:
- the per-point KD-tree queries + ring-bracket walks become masked
  brute-force argmins over (Q, M) distance matrices
  (ops/neighbors.py), recomputed only on refresh iterations inside the
  ``lax.while_loop`` via ``lax.cond``;
- the hand-expanded analytic Euler Jacobian (reference :497-554) is
  replaced by reverse-mode autodiff of the same model: the residual
  direction (coeff) is computed from the s-deskewed point while the
  pose Jacobian is taken at the s=1 transform of the raw point,
  exactly reproducing the reference's linearization (verified against
  the expanded partials in tests);
- dynamic point-list push_back (``_laserCloudOri``) becomes row
  masking: rejected residuals contribute zero rows to A^T A;
- the rest of the numeric spec (gates 25 m^2, robust weight
  1 - 1.8|d| after iteration 5 with floor 0.1, matB scale -0.05,
  degeneracy eigen-threshold 10, abort at deltaR/deltaT < 0.1,
  1.05 drift fudge on rot_y/pos_z, NaN guards) is preserved.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from loam_velodyne_tpu.config import LoamConfig
from loam_velodyne_tpu.ops.features import SweepFeatures
from loam_velodyne_tpu.ops.neighbors import (
    corner_correspondences_auto as corner_correspondences,
    surf_correspondences_auto as surf_correspondences,
)
from loam_velodyne_tpu.types import PointSet
from loam_velodyne_tpu.utils import math as lm

Array = jax.Array


class ImuSweepState(NamedTuple):
    """Per-sweep IMU summary (the reference's 4-point imuTrans cloud,
    BasicScanRegistration.cpp:258-281). All (roll, pitch, yaw) / (3,)
    vectors; zeros when no IMU is present."""

    start_rpy: Array        # orientation at sweep start
    end_rpy: Array          # orientation at sweep end (last point)
    shift_from_start: Array  # position drift over the sweep, start-aligned
    velo_from_start: Array   # velocity change over the sweep, start-aligned

    @staticmethod
    def zero() -> "ImuSweepState":
        z = jnp.zeros((3,), jnp.float32)
        return ImuSweepState(z, z, z, z)


class OdometryState(NamedTuple):
    last_corner: PointSet    # previous sweep's less-sharp corners (end frame)
    last_surf: PointSet      # previous sweep's less-flat surfels (end frame)
    transform: Array         # (6,) current sweep motion estimate (carried prior)
    transform_sum: Array     # (6,) accumulated global pose
    initialized: Array       # () bool
    frame: Array             # () int32

    @staticmethod
    def create(cfg: LoamConfig) -> "OdometryState":
        caps = cfg.capacities
        return OdometryState(
            last_corner=PointSet.empty(caps.less_sharp),
            last_surf=PointSet.empty(caps.less_flat),
            transform=lm.identity_pose(),
            transform_sum=lm.identity_pose(),
            initialized=jnp.zeros((), bool),
            frame=jnp.zeros((), jnp.int32),
        )


class OdometryOutputs(NamedTuple):
    transform_sum: Array     # (6,) pose after this sweep (10 Hz odometry)
    corner_cloud: PointSet   # less-sharp cloud in end frame (to mapping)
    surf_cloud: PointSet     # less-flat cloud in end frame (to mapping)


def _deskew_model(tf: Array, pts: Array) -> Array:
    """The s=1 deskew the reference linearizes around
    (BasicLaserOdometry.cpp:502-512): Ry(-ry) Rx(-rx) Rz(-rz) (p - t)."""
    r = tf[lm.ROT]
    m = lm.rot_zxy_mat(-r[2], -r[0], -r[1])
    return lm.apply_rot(m, pts - tf[lm.POS])


def _line_residual(x0: Array, a: Array, b: Array) -> Tuple[Array, Array]:
    """Point-to-line distance and its gradient direction wrt x0.

    d = |(x0-a) x (x0-b)| / |a-b|; direction = (a-b) x c_hat / |a-b|,
    the analytic gradient — identical to the expanded (la, lb, lc)
    of the reference (BasicLaserOdometry.cpp:319-337).
    """
    c = jnp.cross(x0 - a, x0 - b)
    a012 = jnp.linalg.norm(c, axis=-1)
    l12 = jnp.linalg.norm(a - b, axis=-1)
    safe_a = jnp.maximum(a012, 1e-12)
    safe_l = jnp.maximum(l12, 1e-12)
    d = a012 / safe_l
    direction = jnp.cross(a - b, c / safe_a[..., None]) / safe_l[..., None]
    return d, direction


def _plane_residual(x0: Array, t1: Array, t2: Array, t3: Array
                    ) -> Tuple[Array, Array]:
    """Signed point-to-plane distance and unit normal
    (reference BasicLaserOdometry.cpp:443-457)."""
    n = jnp.cross(t2 - t1, t3 - t1)
    ps = jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    n = n / ps
    d = jnp.sum(n * x0, axis=-1) - jnp.sum(n * t1, axis=-1)
    return d, n


def _jacobian_rows(tf: Array, pts: Array, coeff: Array) -> Array:
    """Rows of the GN design matrix: d(coeff . deskew_model(tf, p))/d(tf).

    Reverse-mode autodiff of the s=1 model — equals the reference's
    hand-expanded arx..atz (BasicLaserOdometry.cpp:497-554).
    """
    def scalar(tf_, p, c):
        return jnp.dot(c, _deskew_model(tf_, p))

    return jax.vmap(jax.grad(scalar), in_axes=(None, 0, 0))(tf, pts, coeff)


def _solve_gn(a_rows: Array, b_vec: Array) -> Tuple[Array, Array]:
    """Normal-equation solve; returns (x, AtA). HIGHEST precision keeps
    the 6x6 system f32-accurate despite the MXU's bf16 default.
    (Measured: the batched LU lowering beats an unrolled Cholesky here —
    scalar dependency chains don't vectorize; see PERF.md.)"""
    hi = jax.lax.Precision.HIGHEST
    ata = jnp.matmul(a_rows.T, a_rows, precision=hi)
    atb = jnp.matmul(a_rows.T, b_vec, precision=hi)
    return jnp.linalg.solve(ata, atb), ata


def _degeneracy_projector(ata: Array, threshold: float) -> Tuple[Array, Array]:
    """P = V diag(keep) V^T zeroing eigendirections with eigenvalue below
    threshold (reference BasicLaserOdometry.cpp:561-597; ascending
    eigenvalues + break == keep all >= threshold)."""
    w, v = jnp.linalg.eigh(ata)
    keep = (w >= threshold).astype(jnp.float32)
    hi = jax.lax.Precision.HIGHEST
    p = jnp.matmul(v * keep[None, :], v.T, precision=hi)
    return p, jnp.any(keep < 0.5)


class _GnCarry(NamedTuple):
    tf: Array
    it: Array
    corner_j: Array
    corner_l: Array
    corner_valid: Array
    surf_j: Array
    surf_l: Array
    surf_m: Array
    surf_valid: Array
    mat_p: Array
    degenerate: Array
    done: Array


def run_gauss_newton(sharp: PointSet, flat: PointSet, last_corner: PointSet,
                     last_surf: PointSet, tf0: Array, cfg: LoamConfig,
                     static_schedule: bool = False) -> Array:
    """The <=25-iteration GN alignment; returns the refined transform.

    static_schedule=True replaces the dynamic while_loop + per-iteration
    refresh ``lax.cond`` with a fixed phase structure (scan over
    refresh phases, fori over cached-fit iterations). Semantically
    equivalent (early abort becomes masked freezing), but crucial under
    ``vmap``: a batched ``lax.cond`` lowers to executing BOTH branches,
    so the dynamic form pays the full correspondence search every
    iteration in batched replay (round-1 BENCH: batch-8 ran at 0.55x
    single-stream because of exactly this)."""
    odo = cfg.odometry
    qc = sharp.xyz.shape[0]
    qs = flat.xyz.shape[0]

    run = ((last_corner.count() > odo.min_corner_points)
           & (last_surf.count() > odo.min_surface_points))

    if static_schedule:
        return _run_gn_static(sharp, flat, last_corner, last_surf, tf0,
                              cfg, run)

    def cond(c: _GnCarry):
        return (c.it < odo.max_iterations) & ~c.done & run

    def body(c: _GnCarry) -> _GnCarry:
        x_c = lm.transform_to_start(sharp.xyz, sharp.rel, c.tf)
        x_s = lm.transform_to_start(flat.xyz, flat.rel, c.tf)

        refresh = (c.it % odo.corresp_refresh_every) == 0

        def do_refresh(_):
            cm = corner_correspondences(x_c, sharp.mask, last_corner,
                                        odo.ring_bracket)
            sm = surf_correspondences(x_s, flat.mask, last_surf,
                                      odo.ring_bracket)
            return cm.j, cm.l, cm.valid, sm.j, sm.l, sm.m, sm.valid

        def keep_old(_):
            return (c.corner_j, c.corner_l, c.corner_valid,
                    c.surf_j, c.surf_l, c.surf_m, c.surf_valid)

        (cj, cl, cvalid, sj, sl, sm_, svalid) = jax.lax.cond(
            refresh, do_refresh, keep_old, None)

        tf_new, mat_p, degenerate, done = _gn_iteration(
            c.tf, c.it, c.mat_p, c.degenerate, x_c, x_s, sharp, flat,
            last_corner, last_surf, cj, cl, cvalid, sj, sl, sm_, svalid,
            odo)

        return _GnCarry(tf=tf_new, it=c.it + 1,
                        corner_j=cj, corner_l=cl, corner_valid=cvalid,
                        surf_j=sj, surf_l=sl, surf_m=sm_, surf_valid=svalid,
                        mat_p=mat_p, degenerate=degenerate, done=done)

    init = _GnCarry(
        tf=tf0, it=jnp.zeros((), jnp.int32),
        corner_j=jnp.zeros((qc,), jnp.int32),
        corner_l=jnp.zeros((qc,), jnp.int32),
        corner_valid=jnp.zeros((qc,), bool),
        surf_j=jnp.zeros((qs,), jnp.int32),
        surf_l=jnp.zeros((qs,), jnp.int32),
        surf_m=jnp.zeros((qs,), jnp.int32),
        surf_valid=jnp.zeros((qs,), bool),
        mat_p=jnp.eye(6, dtype=jnp.float32),
        degenerate=jnp.zeros((), bool),
        done=jnp.zeros((), bool),
    )
    final = jax.lax.while_loop(cond, body, init)
    return final.tf


def _gn_iteration(tf, it, mat_p0, degenerate0, x_c, x_s, sharp, flat,
                  last_corner, last_surf, cj, cl, cvalid, sj, sl, sm_,
                  svalid, odo, projector_mode: str = "cond"):
    """One GN update against cached correspondences (shared by the
    dynamic while_loop and the static phase schedule). Returns
    (tf_new, mat_p, degenerate, done).

    projector_mode: how the iteration-0 degeneracy projector is
    obtained. "cond" (dynamic path): lax.cond on it==0 — fine for
    scalar dispatch, but under vmap a batched cond executes BOTH
    branches, i.e. a 6x6 eigh every iteration. The static schedule
    therefore peels iteration 0 and passes "compute" (unconditional
    eigh, once) there and "carry" (never compute) afterwards."""
    # Corner point-to-line residuals.
    d_c, dir_c = _line_residual(x_c, last_corner.xyz[cj], last_corner.xyz[cl])
    s_c = jnp.where(it >= odo.weight_start_iteration,
                    1.0 - odo.weight_decay * jnp.abs(d_c), 1.0)
    sel_c = cvalid & (s_c > odo.weight_floor) & (d_c != 0.0)
    coeff_c = (s_c[:, None] * dir_c) * sel_c[:, None]

    # Surface point-to-plane residuals.
    d_s, dir_s = _plane_residual(x_s, last_surf.xyz[sj], last_surf.xyz[sl],
                                 last_surf.xyz[sm_])
    dist_s = jnp.sqrt(jnp.linalg.norm(x_s, axis=-1))
    s_s = jnp.where(it >= odo.weight_start_iteration,
                    1.0 - odo.weight_decay * jnp.abs(d_s)
                    / jnp.maximum(dist_s, 1e-6), 1.0)
    sel_s = svalid & (s_s > odo.weight_floor) & (d_s != 0.0)
    coeff_s = (s_s[:, None] * dir_s) * sel_s[:, None]

    a_c = _jacobian_rows(tf, sharp.xyz, coeff_c)
    a_s = _jacobian_rows(tf, flat.xyz, coeff_s)
    a_rows = jnp.concatenate([a_c, a_s], axis=0)
    b_vec = jnp.concatenate([
        -odo.residual_scale * s_c * d_c * sel_c,
        -odo.residual_scale * s_s * d_s * sel_s,
    ])

    n_sel = jnp.sum(sel_c) + jnp.sum(sel_s)
    enough = n_sel >= odo.min_selected

    x, ata = _solve_gn(a_rows, b_vec)

    if projector_mode == "compute":
        p, dg = _degeneracy_projector(ata, odo.degeneracy_eigen_threshold)
        mat_p = jnp.where(enough, p, mat_p0)
        degenerate = enough & dg
    elif projector_mode == "carry":
        mat_p, degenerate = mat_p0, degenerate0
    else:
        first = (it == 0) & enough
        mat_p, degenerate = jax.lax.cond(
            first,
            lambda: _degeneracy_projector(ata, odo.degeneracy_eigen_threshold),
            lambda: (mat_p0, degenerate0))

    hi = jax.lax.Precision.HIGHEST
    x = jnp.where(degenerate, jnp.matmul(mat_p, x, precision=hi), x)

    tf_new = tf + x
    tf_new = jnp.where(jnp.isfinite(tf_new), tf_new, 0.0)
    tf_new = jnp.where(enough, tf_new, tf)

    delta_r = jnp.linalg.norm(lm.rad2deg(x[:3]))
    delta_t = jnp.linalg.norm(x[3:] * 100.0)
    done = enough & (delta_r < odo.delta_r_abort) & (delta_t < odo.delta_t_abort)
    return tf_new, mat_p, degenerate, done


def _run_gn_static(sharp: PointSet, flat: PointSet, last_corner: PointSet,
                   last_surf: PointSet, tf0: Array, cfg: LoamConfig,
                   run: Array) -> Array:
    """vmap-safe GN: while_loop over refresh PHASES (refresh at phase
    start, fori over the cached-fit iterations inside, early abort as
    masked freezing). No data-dependent ``lax.cond`` in the schedule,
    so vmap never duplicates branch work — and because vmap batches a
    while_loop into "iterate until every lane's cond is false", batched
    replay still gets early abort at phase granularity instead of
    paying all max_iterations/refresh_every phases every sweep."""
    odo = cfg.odometry
    refresh_every = odo.corresp_refresh_every
    n_phases = -(-odo.max_iterations // refresh_every)

    def do_phase(phase_idx, tf, mat_p, degenerate, done, first):
        x_c = lm.transform_to_start(sharp.xyz, sharp.rel, tf)
        x_s = lm.transform_to_start(flat.xyz, flat.rel, tf)
        cm = corner_correspondences(x_c, sharp.mask, last_corner,
                                    odo.ring_bracket)
        sm = surf_correspondences(x_s, flat.mask, last_surf,
                                  odo.ring_bracket)

        # static unroll so iteration 0 (the only one that computes the
        # degeneracy projector) peels without a lax.cond
        for j in range(refresh_every):
            it = phase_idx * refresh_every + j
            mode = "compute" if (first and j == 0) else "carry"
            x_c_j = lm.transform_to_start(sharp.xyz, sharp.rel, tf)
            x_s_j = lm.transform_to_start(flat.xyz, flat.rel, tf)
            tf_new, mat_p_new, degen_new, done_step = _gn_iteration(
                tf, it, mat_p, degenerate, x_c_j, x_s_j, sharp, flat,
                last_corner, last_surf, cm.j, cm.l, cm.valid,
                sm.j, sm.l, sm.m, sm.valid, odo, projector_mode=mode)
            active = run & ~done & (it < odo.max_iterations)
            tf = jnp.where(active, tf_new, tf)
            mat_p = jnp.where(active, mat_p_new, mat_p)
            degenerate = jnp.where(active, degen_new, degenerate)
            done = done | (active & done_step)
        return tf, mat_p, degenerate, done

    # Phase 0 peeled: its iteration 0 computes the projector
    # unconditionally (one eigh, outside all loops).
    tf, mat_p, degenerate, done = do_phase(
        jnp.zeros((), jnp.int32), tf0, jnp.eye(6, dtype=jnp.float32),
        jnp.zeros((), bool), jnp.zeros((), bool), first=True)

    def phase_cond(carry):
        phase_idx, tf, mat_p, degenerate, done = carry
        return (phase_idx < n_phases) & ~done & run

    def phase_body(carry):
        phase_idx, tf, mat_p, degenerate, done = carry
        tf, mat_p, degenerate, done = do_phase(
            phase_idx, tf, mat_p, degenerate, done, first=False)
        return (phase_idx + 1, tf, mat_p, degenerate, done)

    init = (jnp.ones((), jnp.int32), tf, mat_p, degenerate, done)
    _, tf, _, _, _ = jax.lax.while_loop(phase_cond, phase_body, init)
    return tf


def _transform_to_end_cloud(ps: PointSet, tf: Array,
                            imu: ImuSweepState) -> PointSet:
    xyz = lm.transform_to_end(ps.xyz, ps.rel, tf,
                              imu.start_rpy, imu.end_rpy,
                              imu.shift_from_start)
    # intensity = int(intensity): rel time zeroed in the end frame.
    return PointSet(xyz=xyz, rel=jnp.zeros_like(ps.rel), ring=ps.ring,
                    mask=ps.mask)


def step(state: OdometryState, feats: SweepFeatures, cfg: LoamConfig,
         imu: Optional[ImuSweepState] = None,
         static_schedule: bool = False
         ) -> Tuple[OdometryState, OdometryOutputs]:
    """One sweep of odometry (reference BasicLaserOdometry::process)."""
    if imu is None:
        imu = ImuSweepState.zero()
    odo = cfg.odometry

    def init_branch(_):
        # First sweep: adopt clouds, seed rotation from IMU
        # (reference :198-211).
        ts = state.transform_sum
        ts = ts.at[0].add(imu.start_rpy[1])   # += imuPitchStart
        ts = ts.at[2].add(imu.start_rpy[0])   # += imuRollStart
        new_state = OdometryState(
            last_corner=feats.less_sharp, last_surf=feats.less_flat,
            transform=state.transform, transform_sum=ts,
            initialized=jnp.ones((), bool), frame=state.frame + 1)
        outs = OdometryOutputs(transform_sum=ts,
                               corner_cloud=feats.less_sharp,
                               surf_cloud=feats.less_flat)
        return new_state, outs

    def normal_branch(_):
        # Motion prior: shift by IMU velocity drift (reference :218).
        tf0 = state.transform.at[3:].add(
            -imu.velo_from_start * cfg.registration.scan_period)

        tf = run_gauss_newton(feats.sharp, feats.flat, state.last_corner,
                              state.last_surf, tf0, cfg,
                              static_schedule=static_schedule)

        # Fold the (negated) relative motion into the global pose with the
        # 1.05 drift fudges (reference :626-649).
        neg_rot = jnp.stack([-tf[0], -tf[1] * odo.rot_y_fudge, -tf[2]])
        rot = lm.accumulate_rotation(state.transform_sum[lm.ROT], neg_rot)
        v = jnp.stack([tf[3] - imu.shift_from_start[0],
                       tf[4] - imu.shift_from_start[1],
                       tf[5] * odo.pos_z_fudge - imu.shift_from_start[2]])
        m = lm.rot_zxy_mat(rot[2], rot[0], rot[1])
        pos = state.transform_sum[lm.POS] - lm.apply_rot(m, v)

        # IMU start→end orientation swap; identity when IMU absent.
        imu_start_xyz = jnp.stack([imu.start_rpy[1], imu.start_rpy[2],
                                   imu.start_rpy[0]])
        imu_end_xyz = jnp.stack([imu.end_rpy[1], imu.end_rpy[2],
                                 imu.end_rpy[0]])
        rot = lm.plugin_imu_rotation(rot, imu_start_xyz, imu_end_xyz)

        transform_sum = jnp.concatenate([rot, pos])

        corner_end = _transform_to_end_cloud(feats.less_sharp, tf, imu)
        surf_end = _transform_to_end_cloud(feats.less_flat, tf, imu)

        new_state = OdometryState(
            last_corner=corner_end, last_surf=surf_end,
            transform=tf, transform_sum=transform_sum,
            initialized=state.initialized, frame=state.frame + 1)
        outs = OdometryOutputs(transform_sum=transform_sum,
                               corner_cloud=corner_end, surf_cloud=surf_end)
        return new_state, outs

    return jax.lax.cond(state.initialized, normal_branch, init_branch, None)
