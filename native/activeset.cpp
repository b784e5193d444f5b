// Exact dense QP solver: Goldfarb–Idnani dual active-set method.
//
// Native analog of the role qpOASES plays in the reference
// (/root/reference/src/solvers/qpOASESSolver.cpp): an exact active-set
// solver used as the correctness oracle for the on-device first-order
// solver.  Built from the Goldfarb & Idnani (1983) algorithm description;
// no code is derived from the reference tree.
//
// Problem form (the canonical copra QP, SolverInterface.h:33-38 analog):
//     min 1/2 x'Qx + c'x
//     s.t. Aeq x = beq,  Aineq x <= bineq,  lb <= x <= ub
//
// Q must be positive definite (the engine seeds a 1e-6 ridge).  This
// implementation recomputes the KKT operators from scratch every inner
// step (O(n^3) per iteration) — built for exactness on test-sized
// problems, not speed; the TPU ADMM path is the production solver.
//
// C ABI (ctypes): returns 0 solved, 1 max-iter, 2 infeasible, 3 bad input.

#include <cmath>
#include <cstring>
#include <limits>
#include <vector>

namespace {

constexpr double kInf = std::numeric_limits<double>::infinity();

// Dense column-major-free helpers on std::vector<double> (row-major).
struct Matrix {
  int rows = 0, cols = 0;
  std::vector<double> a;
  Matrix() = default;
  Matrix(int r, int c) : rows(r), cols(c), a(static_cast<size_t>(r) * c, 0.0) {}
  double& at(int r, int c) { return a[static_cast<size_t>(r) * cols + c]; }
  double at(int r, int c) const { return a[static_cast<size_t>(r) * cols + c]; }
};

// Cholesky factorization Q = L L'. Returns false if not PD.
bool cholesky(const Matrix& Q, Matrix& L) {
  const int n = Q.rows;
  L = Matrix(n, n);
  for (int i = 0; i < n; ++i) {
    for (int j = 0; j <= i; ++j) {
      double s = Q.at(i, j);
      for (int k = 0; k < j; ++k) s -= L.at(i, k) * L.at(j, k);
      if (i == j) {
        if (s <= 0.0) return false;
        L.at(i, i) = std::sqrt(s);
      } else {
        L.at(i, j) = s / L.at(j, j);
      }
    }
  }
  return true;
}

// Solve L L' x = b in place.
void chol_solve(const Matrix& L, std::vector<double>& b) {
  const int n = L.rows;
  for (int i = 0; i < n; ++i) {
    double s = b[i];
    for (int k = 0; k < i; ++k) s -= L.at(i, k) * b[k];
    b[i] = s / L.at(i, i);
  }
  for (int i = n - 1; i >= 0; --i) {
    double s = b[i];
    for (int k = i + 1; k < n; ++k) s -= L.at(k, i) * b[k];
    b[i] = s / L.at(i, i);
  }
}

// Symmetric positive-definite solve of a small m x m system via its own
// Cholesky; returns false if singular.
bool spd_solve(Matrix S, std::vector<double>& b) {
  Matrix L;
  if (!cholesky(S, L)) return false;
  chol_solve(L, b);
  return true;
}

struct Constraint {
  std::vector<double> normal;  // a (length n); constraint is a'x <= b or = b
  double bound;
  bool is_eq;
};

}  // namespace

extern "C" int copra_active_set_solve(
    int n, int me, int mi,
    const double* Q_in, const double* c_in,
    const double* Aeq, const double* beq,
    const double* Aineq, const double* bineq,
    const double* lb, const double* ub,
    int max_iter, double tol,
    double* x_out, double* obj_out, int* n_active_out) {
  if (n <= 0 || me < 0 || mi < 0 || !Q_in || !c_in || !x_out) return 3;

  Matrix Q(n, n);
  std::memcpy(Q.a.data(), Q_in, sizeof(double) * n * n);
  Matrix Lq;
  if (!cholesky(Q, Lq)) return 3;

  // Assemble the constraint list: equalities first, then inequality rows,
  // then finite bounds as +/- e_i rows (reference adapters do the same
  // merge, e.g. QuadProgSolver.cpp:47-73).
  std::vector<Constraint> cons;
  cons.reserve(me + mi + 2 * n);
  for (int i = 0; i < me; ++i) {
    Constraint ct;
    ct.normal.assign(Aeq + static_cast<size_t>(i) * n,
                     Aeq + static_cast<size_t>(i + 1) * n);
    ct.bound = beq[i];
    ct.is_eq = true;
    cons.push_back(std::move(ct));
  }
  for (int i = 0; i < mi; ++i) {
    Constraint ct;
    ct.normal.assign(Aineq + static_cast<size_t>(i) * n,
                     Aineq + static_cast<size_t>(i + 1) * n);
    ct.bound = bineq[i];
    ct.is_eq = false;
    cons.push_back(std::move(ct));
  }
  for (int i = 0; i < n; ++i) {
    if (ub && std::isfinite(ub[i])) {
      Constraint ct;
      ct.normal.assign(n, 0.0);
      ct.normal[i] = 1.0;
      ct.bound = ub[i];
      ct.is_eq = false;
      cons.push_back(std::move(ct));
    }
    if (lb && std::isfinite(lb[i])) {
      Constraint ct;
      ct.normal.assign(n, 0.0);
      ct.normal[i] = -1.0;
      ct.bound = -lb[i];
      ct.is_eq = false;
      cons.push_back(std::move(ct));
    }
  }
  const int m = static_cast<int>(cons.size());

  // Unconstrained minimum x = -Q^{-1} c.
  std::vector<double> x(c_in, c_in + n);
  for (double& v : x) v = -v;
  chol_solve(Lq, x);

  std::vector<int> active;       // indices into cons
  std::vector<double> duals;     // multipliers for active constraints

  auto violation = [&](int idx) {
    double s = -cons[idx].bound;
    for (int k = 0; k < n; ++k) s += cons[idx].normal[k] * x[k];
    return s;  // > 0 means violated (a'x > b)
  };

  // N' Q^{-1} N and helpers, recomputed per step (exactness over speed).
  auto compute_step = [&](int p, std::vector<double>& z,
                          std::vector<double>& r) -> bool {
    const int na = static_cast<int>(active.size());
    // qa = Q^{-1} a_p
    std::vector<double> qa(cons[p].normal);
    chol_solve(Lq, qa);
    if (na == 0) {
      z = qa;
      r.clear();
      return true;
    }
    // B = Q^{-1} N (n x na), S = N' Q^{-1} N (na x na)
    Matrix B(n, na);
    for (int j = 0; j < na; ++j) {
      std::vector<double> col(cons[active[j]].normal);
      chol_solve(Lq, col);
      for (int i = 0; i < n; ++i) B.at(i, j) = col[i];
    }
    Matrix S(na, na);
    for (int i = 0; i < na; ++i)
      for (int j = 0; j < na; ++j) {
        double s = 0.0;
        for (int k = 0; k < n; ++k)
          s += cons[active[i]].normal[k] * B.at(k, j);
        S.at(i, j) = s;
      }
    // r = S^{-1} N' Q^{-1} a_p
    r.assign(na, 0.0);
    for (int i = 0; i < na; ++i) {
      double s = 0.0;
      for (int k = 0; k < n; ++k) s += cons[active[i]].normal[k] * qa[k];
      r[i] = s;
    }
    if (!spd_solve(S, r)) return false;
    // z = qa - B r
    z = qa;
    for (int i = 0; i < n; ++i) {
      double s = 0.0;
      for (int j = 0; j < na; ++j) s += B.at(i, j) * r[j];
      z[i] -= s;
    }
    return true;
  };

  int iters = 0;
  while (iters++ < max_iter) {
    // Most violated constraint.
    int p = -1;
    double worst = tol;
    for (int i = 0; i < m; ++i) {
      bool already = false;
      for (int j : active)
        if (j == i) { already = true; break; }
      if (already) continue;
      double v = cons[i].is_eq ? std::fabs(violation(i)) : violation(i);
      if (v > worst) { worst = v; p = i; }
    }
    if (p < 0) break;  // all satisfied -> optimal

    double u_p = 0.0;  // multiplier of the incoming constraint
    // For violated equality rows approached from a'x < b, flip the working
    // normal so the step direction increases a'x toward the bound.
    double sign = 1.0;
    if (cons[p].is_eq && violation(p) < 0.0) sign = -1.0;
    std::vector<double> a_p(cons[p].normal);
    double b_p = cons[p].bound;
    if (sign < 0) { for (double& v : a_p) v = -v; b_p = -b_p; }
    Constraint work{a_p, b_p, cons[p].is_eq};

    bool added = false;
    int inner_guard = 0;
    while (inner_guard++ <= m + 1) {
      std::vector<double> z, r;
      // temporarily view cons[p] through the working sign
      std::vector<double> saved = cons[p].normal;
      double saved_b = cons[p].bound;
      cons[p].normal = work.normal;
      cons[p].bound = work.bound;
      bool ok = compute_step(p, z, r);
      cons[p].normal = saved;
      cons[p].bound = saved_b;
      if (!ok) return 2;

      double ztap = 0.0, viol = -work.bound;
      for (int k = 0; k < n; ++k) {
        ztap += z[k] * work.normal[k];
        viol += work.normal[k] * x[k];
      }
      // Full-step length (t2) and partial (dual-blocking) step (t1).
      double t2 = (ztap > 1e-14) ? viol / ztap : kInf;
      double t1 = kInf;
      int blocker = -1;
      for (int j = 0; j < static_cast<int>(active.size()); ++j) {
        if (cons[active[j]].is_eq) continue;  // eq duals unrestricted
        if (j < static_cast<int>(r.size()) && r[j] > 1e-14) {
          double cand = duals[j] / r[j];
          if (cand < t1) { t1 = cand; blocker = j; }
        }
      }
      double t = std::min(t1, t2);
      if (t == kInf) return 2;  // dual unbounded -> primal infeasible

      // x <- x - t z ; duals <- duals - t r ; u_p <- u_p + t
      for (int k = 0; k < n; ++k) x[k] -= t * z[k];
      for (int j = 0; j < static_cast<int>(r.size()); ++j) duals[j] -= t * r[j];
      u_p += t;

      if (t == t2) {  // constraint p becomes active
        cons[p].normal = work.normal;
        cons[p].bound = work.bound;
        active.push_back(p);
        duals.push_back(u_p);
        added = true;
        break;
      }
      // drop the blocking constraint and continue with p
      active.erase(active.begin() + blocker);
      duals.erase(duals.begin() + blocker);
    }
    if (!added && inner_guard > m + 1) return 1;
  }
  if (iters > max_iter) return 1;

  std::memcpy(x_out, x.data(), sizeof(double) * n);
  if (obj_out) {
    double obj = 0.0;
    for (int i = 0; i < n; ++i) {
      obj += c_in[i] * x[i];
      double s = 0.0;
      for (int j = 0; j < n; ++j) s += Q_in[static_cast<size_t>(i) * n + j] * x[j];
      obj += 0.5 * x[i] * s;
    }
    *obj_out = obj;
  }
  if (n_active_out) *n_active_out = static_cast<int>(active.size());
  return 0;
}
