"""Shared physics fixtures and golden vectors.

These reproduce the reference's test systems so the behavioral contract
carries over verbatim:

* point-mass-under-gravity LTI fixtures
  (``/root/reference/test/time_invariant_systems.h:46-321``);
* the LTV offsets fixture (``test/time_variant_systems.h:24-108``);
* the Scilab qld 6-var QP (``test/time_invariant_systems.h:12-43``);
* the golden N=10 control/trajectory vectors — the primary numerical
  contract (``time_invariant_systems.h:306-311``,
  ``time_variant_systems.h:74-79``).
"""

import numpy as np

T = 0.005
MASS = 5.0
GRAVITY = 9.81

A = np.array([[1.0, T], [0.0, 1.0]])
B = np.array([[0.5 * T * T / MASS], [T / MASS]])
D = np.array([-GRAVITY / 2.0 * T * T, -GRAVITY * T])

M = np.eye(2)
N_MAT = np.array([[1.0]])
XD = np.array([0.0, -1.0])
UD = np.array([2.0])
WX = np.array([10.0, 10000.0])
WU = np.array([1e-4])

U_LOWER = np.array([-np.inf])
U_UPPER = np.array([200.0])
X_LOWER = np.array([-np.inf, -np.inf])
X_UPPER = np.array([np.inf, 0.0])

# SmallSystem (N=10) golden contract
SMALL_N = 10
SMALL_X0 = np.array([0.0, -1.5])
GOLDEN_TRAJECTORY = np.array([
    0, -1.5, -0.0073749, -1.44996, -0.0144997, -1.39995, -0.0213745,
    -1.34997, -0.0279994, -1.30002, -0.0343747, -1.2501, -0.0405005,
    -1.20022, -0.046377, -1.15036, -0.0520042, -1.10053, -0.0573824,
    -1.05074, -0.0625117, -1.00098])
GOLDEN_CONTROL = np.array([
    99.0915, 99.0605, 99.0296, 98.9986, 98.9677, 98.9367, 98.9058, 98.8748,
    98.8439, 98.813])

# Big horizon variants (BoundedSystem etc., nbStep=300, x0=[0,-5])
BIG_N = 300
BIG_X0 = np.array([0.0, -5.0])

# IneqSystem extras (test/time_invariant_systems.h:109-154)
INEQ_G = np.array([[1.0]])
INEQ_H = np.array([200.0])
INEQ_E = np.array([[0.0, 1.0]])
INEQ_P = np.array([0.0])

# MixedSystem extras (test/time_invariant_systems.h:158-201)
MIXED_G = np.array([[1.0]])
MIXED_E = np.array([[0.0, 1.0]])
MIXED_P = np.array([200.0])

# EqSystem extras (test/time_invariant_systems.h:206-250)
EQ_X0 = np.array([0.0, 0.0])
EQ_E = np.array([[1.0, 0.0], [0.0, 0.0]])
EQ_P = EQ_X0.copy()
EQ_XD = np.array([0.0, 0.0])

# SmallTimeVariantSystem offsets (test/time_variant_systems.h:47-57)
A_OFFSET = np.array([[0.05, -0.1 * T], [0.0, -0.2]])
B_OFFSET = np.array([[-0.05 * B[0, 0]], [0.02 * B[1, 0]]])
C_OFFSET = np.array([0.1 * D[0], -0.1 * D[1]])

GOLDEN_LTV_TRAJECTORY = np.array([
    0, -1.5, -0.00768, -1.572, -0.0156781, -1.60926, -0.0239068, -1.61074,
    -0.0322835, -1.57793, -0.0407411, -1.51474, -0.049238, -1.42719,
    -0.0577663, -1.32296, -0.0663596, -1.21074, -0.0750978, -1.09973,
    -0.0841117, -0.999249])
GOLDEN_LTV_CONTROL = np.array([
    -22.952, -23.6299, -24.936, -26.9786, -29.9306, -34.0551, -39.7467,
    -47.5976, -58.5042, -73.8445])


def ltv_matrices(n_step=SMALL_N):
    """Stacked A_k/B_k/d_k of SmallTimeVariantSystem
    (``test/time_variant_systems.h:82-95``)."""
    As = np.stack([A + k * A_OFFSET / (n_step - 1) for k in range(n_step)])
    Bs = np.stack([B + k * B_OFFSET / (n_step - 1) for k in range(n_step)])
    Ds = np.stack([D + k * C_OFFSET / (n_step - 1) for k in range(n_step)])
    return As, Bs, Ds


# Scilab qld QP (test/time_invariant_systems.h:12-43)
QLD_Q = np.eye(6)
QLD_C = np.array([1.0, 2, 3, 4, 5, 6])
QLD_AEQ = np.array([
    [1.0, -1, 1, 0, 3, 1],
    [-1, 0, -3, -4, 5, 6],
    [2, 5, 3, 0, 1, 0]])
QLD_BEQ = np.array([1.0, 2, 3])
QLD_AINEQ = np.array([
    [0.0, 1, 0, 1, 2, -1],
    [-1, 0, 2, 1, 1, 0]])
QLD_BINEQ = np.array([-1.0, 2.5])
QLD_XL = np.array([-1000.0, -10000, 0, -1000, -1000, -1000])
QLD_XU = np.array([10000.0, 100, 1.5, 100, 100, 1000])


def numpy_condense_lti(A, B, d, N):
    """Independent O(N^2) reference condensing for oracle checks."""
    x, u = A.shape[0], B.shape[1]
    Phi = np.zeros((x * (N + 1), x))
    Phi[:x] = np.eye(x)
    Psi = np.zeros((x * (N + 1), u * N))
    xi = np.zeros(x * (N + 1))
    pows = [B]
    for _ in range(1, N):
        pows.append(A @ pows[-1])
    for i in range(1, N + 1):
        Phi[i*x:(i+1)*x] = A @ Phi[(i-1)*x:i*x]
        xi[i*x:(i+1)*x] = A @ xi[(i-1)*x:i*x] + d
        for j in range(i):
            Psi[i*x:(i+1)*x, j*u:(j+1)*u] = pows[i - 1 - j]
    return Phi, Psi, xi


def numpy_condense_ltv(As, Bs, ds):
    N, x = As.shape[0], As.shape[1]
    u = Bs.shape[2]
    Phi = np.zeros((x * (N + 1), x))
    Phi[:x] = np.eye(x)
    Psi = np.zeros((x * (N + 1), u * N))
    xi = np.zeros(x * (N + 1))
    for k in range(N):
        r, rn = k * x, (k + 1) * x
        Phi[rn:rn+x] = As[k] @ Phi[r:rn]
        Psi[rn:rn+x] = As[k] @ Psi[r:rn]
        Psi[rn:rn+x, k*u:(k+1)*u] += Bs[k]
        xi[rn:rn+x] = As[k] @ xi[r:rn] + ds[k]
    return Phi, Psi, xi
