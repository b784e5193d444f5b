"""Bipedal CoM preview control (BASELINE.md config 5): N=300, time-varying
ZMP reference and support polygon, both axes vmapped.

This is the long-horizon stress config: a 300-var QP with 1204 full-size
inequality rows, exercising the full-horizon entry modes of
TrajectoryCost/TrajectoryConstraint.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

import copra_tpu as ct
from bipedal_walking import footstep_plan, lipm_system, solve_preview


def test_bipedal_preview_solves_and_respects_polygon():
    X, U, zmp, (ref, lo, hi), sol = solve_preview(
        horizon=300, options=ct.SolverOptions(max_iter=3000))
    zmp = np.asarray(zmp)
    assert (np.asarray(sol.status) == ct.STATUS_SOLVED).all()
    # ZMP inside the moving support polygon (the hard constraint)
    assert (zmp <= hi + 1e-6).all()
    assert (zmp >= lo - 1e-6).all()
    # dynamics replay per axis
    A, B, d, _ = lipm_system(0.005, 0.8)
    for ax in range(2):
        sys_ax = ct.LTISystem.create(A, B, d, np.zeros(3), 300)
        assert float(ct.replay_dynamics(
            sys_ax, X[ax], U[ax])) <= 1e-8
    # the CoM makes forward progress toward the footsteps
    com_x = np.asarray(X)[0, 0::3]
    assert com_x[-1] > 0.01
    assert com_x.max() <= ref[0].max() + 0.06


def test_footstep_plan_shapes():
    ref, lo, hi = footstep_plan(4, 300, 0.005)
    assert ref.shape == (2, 301)
    assert (hi - lo > 0).all()
    # plan steps forward in x and alternates in y
    assert ref[0, -1] > ref[0, 0]
    assert abs(ref[1]).max() > 0
