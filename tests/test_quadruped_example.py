"""Quadruped SRB example (the reference's actual ANYbotics domain):
front-end-built x=12/u=12/r=12 LTV problem served through the stagewise
facade with curvature equilibration.  Fast policies (probe-skipped) —
the measured-policy path is covered by `bench_all --config 6` and
`test_rho_policy.py`.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "examples"))

import copra_tpu as ct
from quadruped_srb import build_problem, serve


def test_quadruped_serve_converges_and_is_physical():
    X, U, info, _ = serve(robots=2, N=16, ticks=3, rho=0.1,
                          warm_iters=60, verbose=False)
    assert (np.asarray(info.status) == ct.STATUS_SOLVED).all()
    X = np.asarray(X, np.float64)
    U = np.asarray(U, np.float64)
    # height corridor respected, forward progress toward v_ref
    assert (X[:, :, 5] >= 0.2 - 1e-5).all()
    assert (X[:, :, 5] <= 0.4 + 1e-5).all()
    assert X[0, 1, 9] > 0.05
    # friction cones + normal-force bounds on the applied controls
    mu = 0.6
    f = U[:, 0].reshape(2, 4, 3)
    assert (f[..., 2] >= -1e-4).all(), "negative normal force"
    assert (np.abs(f[..., 0]) <= mu * f[..., 2] + 1e-3).all()
    assert (np.abs(f[..., 1]) <= mu * f[..., 2] + 1e-3).all()
    # quasi-static support: total normal force ~ weight
    total = f[0, :, 2].sum()
    assert abs(total - 25.0 * 9.81) < 25.0


def test_quadruped_front_end_dims():
    from copra_tpu.qp.riccati import from_mpc
    system, costs, cons, _ = build_problem(N=8)
    sqp = from_mpc(system, costs, cons)
    assert (sqp.horizon, sqp.xdim, sqp.udim) == (8, 12, 12)
    assert sqp.nr_rows == 16          # 4 pyramid faces x 4 legs
    # bound constraints landed as boxes, not rows
    assert float(sqp.uub[0, 2]) == 250.0
    assert float(sqp.xlb[0, 5]) == np.float32(0.2)
