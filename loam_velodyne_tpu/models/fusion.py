"""Pose fusion: high-rate odometry x low-rate mapping correction.

Equivalent of the reference TransformMaintenance/BasicTransformMaintenance
(BasicTransformMaintenance.cpp:46-178): every 10 Hz odometry pose is
composed with the latest mapping correction to produce the integrated
pose. The reference's 130-line scalar trig expansion is the same
``transform_associate_to_map`` composition used by the mapping prior
(verified equivalent in tests), so this stage is one pure function over
a 2-pose carry.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from loam_velodyne_tpu.utils import math as lm

Array = jax.Array


class FusionState(NamedTuple):
    transform_aft: Array   # latest mapped pose
    transform_bef: Array   # odometry pose the mapping used

    @staticmethod
    def create() -> "FusionState":
        return FusionState(transform_aft=lm.identity_pose(),
                           transform_bef=lm.identity_pose())


def update_mapping(state: FusionState, transform_aft: Array,
                   transform_bef: Array) -> FusionState:
    """Cache a new mapping result (reference odomAftMappedHandler,
    TransformMaintenance.cpp:97-115)."""
    return FusionState(transform_aft=transform_aft,
                       transform_bef=transform_bef)


def fuse(state: FusionState, odom_pose: Array) -> Array:
    """Integrated pose for one odometry message (reference
    laserOdometryHandler -> transformAssociateToMap,
    TransformMaintenance.cpp:66-95)."""
    return lm.transform_associate_to_map(odom_pose, state.transform_bef,
                                         state.transform_aft)
