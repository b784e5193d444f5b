"""AutoSpan combinatorics + error-handling + removal tests.

Mirrors the reference's coverage at
``/root/reference/test/TestTimeInvariantSystems.cpp:842-1130``: every
combination of per-step vs full-horizon inputs must be accepted after
``auto_span()``; wrong dimensions must raise; re-registering the
move-semantics constraints must raise; removal then solve must work.
"""

import numpy as np
import pytest

import copra_tpu as ct

from fixtures import (A, B, D, INEQ_E, INEQ_G, INEQ_H, INEQ_P, M, MIXED_E,
                      MIXED_G, MIXED_P, N_MAT, UD, U_LOWER, U_UPPER, WU, WX,
                      XD)

N_STEP = 8
X0 = np.array([0.0, -5.0])


@pytest.fixture
def controller():
    system = ct.LTISystem.create(A, B, D, X0, N_STEP)
    return ct.LMPC(system)


def spanM(mat, n, add_cols=0):
    return np.asarray(ct.span_matrix(mat, mat.shape[0] * n, add_cols))


def spanV(vec, n):
    return np.asarray(ct.span_vector(vec, vec.shape[0] * n))


# ---- autospan combinatorics (reference :842-971) ----

def test_autospan_trajectory_and_control_constraint(controller):
    n_x = N_STEP + 1
    fullE, fullp = spanM(INEQ_E, n_x), spanV(INEQ_P, n_x)
    fullG, fullh = spanM(INEQ_G, N_STEP), spanV(INEQ_H, N_STEP)
    for E, p in [(INEQ_E, INEQ_P), (fullE, INEQ_P), (INEQ_E, fullp),
                 (fullE, fullp)]:
        controller.add_constraint(
            ct.TrajectoryConstraint.create(E, p).auto_span())
    for G, h in [(INEQ_G, INEQ_H), (fullG, INEQ_H), (INEQ_G, fullh),
                 (fullG, fullh)]:
        controller.add_constraint(
            ct.ControlConstraint.create(G, h).auto_span())


def test_autospan_mixed_constraint(controller):
    fullE = spanM(MIXED_E, N_STEP, add_cols=1)
    fullG = spanM(MIXED_G, N_STEP)
    fullf = spanV(MIXED_P, N_STEP)
    for E in (MIXED_E, fullE):
        for G in (MIXED_G, fullG):
            for f in (MIXED_P, fullf):
                controller.add_constraint(
                    ct.MixedConstraint.create(E, G, f).auto_span())


def test_autospan_trajectory_cost(controller):
    n_x = N_STEP + 1
    fullM, fullxd = spanM(M, n_x), spanV(XD, n_x)
    for Mm, p in [(M, XD), (M, fullxd), (fullM, XD), (fullM, fullxd)]:
        controller.add_cost(
            ct.TrajectoryCost.create(Mm, p, weights=WX).auto_span())


def test_autospan_control_cost(controller):
    fullN, fullud = spanM(N_MAT, N_STEP), spanV(UD, N_STEP)
    for Nm, p in [(N_MAT, UD), (N_MAT, fullud), (fullN, UD), (fullN, fullud)]:
        controller.add_cost(
            ct.ControlCost.create(Nm, p, weights=WU).auto_span())


def test_autospan_mixed_cost(controller):
    ones21 = np.ones((2, 1))
    for Mm in (M, spanM(M, N_STEP, add_cols=1)):
        for Nm in (ones21, spanM(ones21, N_STEP)):
            for p in (XD, spanV(XD, N_STEP)):
                controller.add_cost(
                    ct.MixedCost.create(Mm, Nm, p, weights=WX).auto_span())


# ---- error handling (reference :977-1104) ----

def test_error_system():
    with pytest.raises(ct.DimensionError):
        ct.LTISystem.create(np.ones((5, 2)), B, D, X0, N_STEP)
    with pytest.raises(ct.DimensionError):
        ct.LTISystem.create(np.ones((2, 5)), B, D, X0, N_STEP)
    with pytest.raises(ct.DimensionError):
        ct.LTISystem.create(A, np.ones((5, 1)), D, X0, N_STEP)
    with pytest.raises(ct.DimensionError):
        ct.LTISystem.create(A, B, np.ones(5), X0, N_STEP)
    with pytest.raises(ct.DimensionError):
        ct.LTISystem.create(A, B, D, X0, -1)
    with pytest.raises(ct.DimensionError):
        ct.LTVSystem.create(np.ones((4, 5, 2)), np.ones((4, 2, 1)),
                            np.ones((4, 2)), X0)


def test_error_weights(controller):
    cost = ct.TrajectoryCost.create(M, XD)
    cost.with_weight(2.0)
    with pytest.raises(ct.DimensionError):
        cost.with_weights(np.ones(5))
    controller.add_cost(cost.with_weights(WX))


@pytest.mark.parametrize("bad", [
    lambda: ct.TrajectoryCost.create(np.eye(5), np.ones(2)),
    lambda: ct.TrajectoryCost.create(np.eye(5), np.ones(5)),
    lambda: ct.TargetCost.create(np.eye(5), np.ones(2)),
    lambda: ct.TargetCost.create(np.eye(5), np.ones(5)),
    lambda: ct.ControlCost.create(np.eye(5), np.ones(2)),
    lambda: ct.ControlCost.create(np.eye(5), np.ones(5)),
    lambda: ct.MixedCost.create(np.eye(5), np.ones((2, 1)), np.ones(2)),
    lambda: ct.MixedCost.create(np.ones((2, 1)), np.eye(5), np.ones(2)),
    lambda: ct.MixedCost.create(np.eye(5), np.eye(5), np.ones(5)),
])
def test_error_costs(controller, bad):
    with pytest.raises(ct.DimensionError):
        controller.add_cost(bad())


@pytest.mark.parametrize("bad", [
    lambda: ct.TrajectoryConstraint.create(np.eye(5), np.ones(2)),
    lambda: ct.TrajectoryConstraint.create(np.eye(5), np.ones(5)),
    lambda: ct.ControlConstraint.create(np.eye(5), np.ones(2)),
    lambda: ct.ControlConstraint.create(np.eye(5), np.ones(5)),
    lambda: ct.MixedConstraint.create(np.eye(5), np.ones((2, 1)), np.ones(2)),
    lambda: ct.MixedConstraint.create(np.ones((2, 1)), np.eye(5), np.ones(2)),
    lambda: ct.MixedConstraint.create(np.eye(5), np.eye(5), np.ones(5)),
    lambda: ct.TrajectoryBoundConstraint.create(np.ones(3), np.ones(2)),
    lambda: ct.TrajectoryBoundConstraint.create(np.ones(3), np.ones(3)),
    lambda: ct.ControlBoundConstraint.create(np.ones(3), np.ones(2)),
    lambda: ct.ControlBoundConstraint.create(np.ones(3), np.ones(3)),
])
def test_error_constraints(controller, bad):
    with pytest.raises(ct.DimensionError):
        controller.add_constraint(bad())


def test_double_registration_control_constraint(controller):
    """Re-registering the move-semantics constraints raises
    (reference :1062-1064, :1101-1103)."""
    good = ct.ControlConstraint.create(INEQ_G, INEQ_H)
    controller.add_constraint(good)
    with pytest.raises(ct.InitializationError):
        controller.add_constraint(good)
    bound = ct.ControlBoundConstraint.create(U_LOWER, U_UPPER)
    controller.add_constraint(bound)
    with pytest.raises(ct.InitializationError):
        controller.add_constraint(bound)


def test_remove_cost_and_constraint(controller):
    """Add, remove, then solve (reference :1110-1130)."""
    x_cost = controller.add_cost(ct.TargetCost.create(M, XD, weights=WX))
    u_cost = controller.add_cost(ct.ControlCost.create(N_MAT, UD, weights=WU))
    traj = controller.add_constraint(
        ct.TrajectoryConstraint.create(INEQ_E, INEQ_P))
    ctrl = controller.add_constraint(
        ct.ControlConstraint.create(INEQ_G, INEQ_H))
    controller.remove_cost(x_cost)
    controller.remove_cost(u_cost)
    controller.remove_constraint(traj)
    controller.remove_constraint(ctrl)
    assert controller.solve()


def test_unknown_solver():
    with pytest.raises(ct.SolverError):
        ct.get_solver("nonexistent")


def test_mixed_cost_multi_input_per_step_equals_full_size():
    """Regression pin for udim >= 2: MixedCost's per-step one-hot
    selector used to be correct only for u == 1 (every golden fixture
    has u=1), depositing N in the wrong Q columns.  The per-step
    lowering must equal the manually spanned full-size entry
    (span M with add_cols=1 — the x_N-not-penalized quirk,
    reference src/costFunctions.cpp:217-224,251-256)."""
    import numpy as np
    from copra_tpu.autospan import span_matrix, span_vector

    rng = np.random.default_rng(11)
    N, x, u, r = 6, 3, 2, 2
    As = 0.6 * rng.normal(size=(x, x))
    Bs = rng.normal(size=(x, u))
    ds = rng.normal(size=x)
    x0 = rng.normal(size=x)
    system = ct.LTISystem.create(As, Bs, ds, x0, N)
    prev = ct.condense(system)

    Mm = rng.normal(size=(r, x))
    Nm = rng.normal(size=(r, u))
    p = rng.normal(size=r)
    w = rng.uniform(0.1, 1.0, r)

    per_step = ct.MixedCost.create(Mm, Nm, p, weights=w)
    full = ct.MixedCost.create(
        span_matrix(Mm, r * N, add_cols=1), span_matrix(Nm, r * N),
        span_vector(p, r * N), weights=span_vector(w, r * N))
    per_step.validate(prev)
    full.validate(prev)
    Q1, c1 = per_step.lower(prev, system.x0)
    Q2, c2 = full.lower(prev, system.x0)
    np.testing.assert_allclose(np.asarray(Q1), np.asarray(Q2), atol=1e-12)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-12)
