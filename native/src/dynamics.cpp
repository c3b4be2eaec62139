// Native batched dynamics kernels: pendulum + cartpole n-link.
//
// Counterpart of the reference's native extension packages
// (`/root/reference/deqmpc/my_envs/{pendulum1l,cartpole1l,cartpole2l}/src/*`):
// there, CasADi generated ~33k lines of straight-line C/CUDA for the
// discrete dynamics and six analytic Jacobian blocks, wrapped through
// pybind11 (`dynamics.cpp:12-55`) and dispatched one thread per batch
// element (`dynamics_gpu.cu:4-17`, `dynamics_cpu.cpp:35-40`).
//
// TPU-native redesign: the hot path runs on TPU via jnp + jacfwd
// (deqmpc_tpu/envs/*), so this library's role is the *host side* —
// fast CPU generation/verification and an independent oracle for the
// XLA kernels. Instead of machine-generated expression code we write
// the physics once, templated on the scalar type, and obtain exact
// Jacobians with a small forward-mode dual-number AD — the same
// capability CasADi codegen provided, in ~400 lines. Batch
// parallelism via OpenMP.
//
// C API (ctypes-friendly; column layout matches the reference's
// pybind signature q,qdot,tau,h -> q',qdot' + 6 Jacobian blocks,
// `pendulum1l/src/dynamics.cpp:51-55`):
//   <env>_dynamics(bsz, q, qdot, tau, h, q_out, qdot_out)
//   <env>_derivatives(bsz, q, qdot, tau, h,
//                     dq_dq, dq_dqd, dq_dtau, dqd_dq, dqd_dqd, dqd_dtau)
#include <cmath>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

// ---------------------------------------------------------------------------
// forward-mode dual numbers with NDIR tangent directions
// ---------------------------------------------------------------------------
template <int NDIR>
struct Dual {
  double v;
  double d[NDIR];
  Dual() : v(0) { std::memset(d, 0, sizeof(d)); }
  Dual(double x) : v(x) { std::memset(d, 0, sizeof(d)); }
  static Dual seed(double x, int dir) {
    Dual r(x);
    r.d[dir] = 1.0;
    return r;
  }
};

template <int N> Dual<N> operator+(const Dual<N>& a, const Dual<N>& b) {
  Dual<N> r(a.v + b.v);
  for (int i = 0; i < N; ++i) r.d[i] = a.d[i] + b.d[i];
  return r;
}
template <int N> Dual<N> operator-(const Dual<N>& a, const Dual<N>& b) {
  Dual<N> r(a.v - b.v);
  for (int i = 0; i < N; ++i) r.d[i] = a.d[i] - b.d[i];
  return r;
}
template <int N> Dual<N> operator-(const Dual<N>& a) {
  Dual<N> r(-a.v);
  for (int i = 0; i < N; ++i) r.d[i] = -a.d[i];
  return r;
}
template <int N> Dual<N> operator*(const Dual<N>& a, const Dual<N>& b) {
  Dual<N> r(a.v * b.v);
  for (int i = 0; i < N; ++i) r.d[i] = a.d[i] * b.v + a.v * b.d[i];
  return r;
}
template <int N> Dual<N> operator/(const Dual<N>& a, const Dual<N>& b) {
  Dual<N> r(a.v / b.v);
  const double ib = 1.0 / b.v;
  for (int i = 0; i < N; ++i) r.d[i] = (a.d[i] - r.v * b.d[i]) * ib;
  return r;
}
template <int N> Dual<N> sin(const Dual<N>& a) {
  Dual<N> r(std::sin(a.v));
  const double c = std::cos(a.v);
  for (int i = 0; i < N; ++i) r.d[i] = c * a.d[i];
  return r;
}
template <int N> Dual<N> cos(const Dual<N>& a) {
  Dual<N> r(std::cos(a.v));
  const double s = -std::sin(a.v);
  for (int i = 0; i < N; ++i) r.d[i] = s * a.d[i];
  return r;
}
using std::sin;  // double overloads participate too
using std::cos;

// scalar-generic helpers (must precede their use in templates so the
// S=double instantiation binds at definition time)
inline double val(double x) { return x; }
template <int N> double val(const Dual<N>& x) { return x.v; }
inline double dual_sqrt(double s, double sv) { return sv; }
template <int N> Dual<N> dual_sqrt(const Dual<N>& s, double sv) {
  Dual<N> r(sv);
  const double inv = 0.5 / sv;
  for (int i = 0; i < N; ++i) r.d[i] = s.d[i] * inv;
  return r;
}

// ---------------------------------------------------------------------------
// physics, templated on scalar (matches deqmpc_tpu/envs exactly)
// ---------------------------------------------------------------------------

// pendulum: theta = 0 hanging down; thdd = -(g/l) sin(th) + u / (m l^2)
struct PendulumParams {
  double m = 1.0, l = 1.0, g = 10.0;
};

template <class S>
void pendulum_xdot(const PendulumParams& p, const S* q, const S* qd,
                   const S* tau, S* qdot_out, S* qdd_out) {
  qdot_out[0] = qd[0];
  qdd_out[0] = S(-(p.g / p.l)) * sin(q[0]) + tau[0] / S(p.m * p.l * p.l);
}

// cartpole n-link: cart + NL point-mass links, relative joint angles,
// 0 = upright. Manipulator equation assembled from closed-form tip
// Jacobians (same derivation as deqmpc_tpu/envs/cartpole.py).
struct CartpoleParams {
  double mc = 1.0, mp = 0.1, length = 0.5, g = 9.81;
};

template <class S, int NL>
void cartpole_accel(const CartpoleParams& cp, const S* q, const S* qd,
                    const S* tau, S* qdd) {
  constexpr int NQ = NL + 1;
  // absolute angles and trig
  S a[NL], ca[NL], sa[NL];
  {
    S acc = S(0.0);
    for (int i = 0; i < NL; ++i) {
      acc = acc + q[1 + i];
      a[i] = acc;
      ca[i] = cos(acc);
      sa[i] = sin(acc);
    }
  }
  // tip Jacobians J[i] : 2 x NQ ; Jx row: [1, B[i][k]], Jy: [0, -By[i][k]]
  // B[i][k] = l * sum_{k<=j<=i} cos a_j (resp. sin for By)
  S Bx[NL][NL], By[NL][NL];
  for (int i = 0; i < NL; ++i)
    for (int k = 0; k < NL; ++k) {
      S sx = S(0.0), sy = S(0.0);
      for (int j = k; j <= i; ++j) {
        sx = sx + ca[j];
        sy = sy + sa[j];
      }
      Bx[i][k] = S(cp.length) * sx;
      By[i][k] = S(cp.length) * sy;
    }
  // mass matrix M = mc e0 e0' + mp sum_i J_i' J_i
  S M[NQ][NQ];
  for (int r = 0; r < NQ; ++r)
    for (int c = 0; c < NQ; ++c) M[r][c] = S(0.0);
  M[0][0] = S(cp.mc);
  for (int i = 0; i < NL; ++i) {
    // columns: col0 = (1, 0); col(1+k) = (Bx[i][k], -By[i][k])
    S Jx[NQ], Jy[NQ];
    Jx[0] = S(1.0);
    Jy[0] = S(0.0);
    for (int k = 0; k < NL; ++k) {
      Jx[1 + k] = Bx[i][k];
      Jy[1 + k] = S(0.0) - By[i][k];
    }
    for (int r = 0; r < NQ; ++r)
      for (int c = 0; c < NQ; ++c)
        M[r][c] = M[r][c] + S(cp.mp) * (Jx[r] * Jx[c] + Jy[r] * Jy[c]);
  }
  // bias h: for position-only kinematics (J = dp/dq symmetric second
  // derivatives) the Jdot'v part of (Mdot qd) cancels exactly against
  // dT/dq, leaving h = mp * J' (Jdot qd) + dV/dq.
  // dBx[i][k]/dq_m = -l * sum_{max(k,m-1)<=j<=i} sin a_j   (m>=1)
  // dBy[i][k]/dq_m = +l * sum_{max(k,m-1)<=j<=i} cos a_j
  S h[NQ];
  for (int k = 0; k < NQ; ++k) h[k] = S(0.0);
  // kinetic bias: iterate links, use v_i = J_i qd and its q-derivative
  for (int i = 0; i < NL; ++i) {
    // dv/dq_m (m = 1..NL): derivative of J_i wrt q_m times qd
    for (int m = 1; m <= NL; ++m) {
      S dvx = S(0.0), dvy = S(0.0);
      for (int k = 0; k < NL; ++k) {
        // d Bx[i][k] / dq_m
        int lo = (k > m - 1) ? k : (m - 1);
        S sx = S(0.0), sy = S(0.0);
        for (int j = lo; j <= i; ++j) {
          sx = sx + sa[j];
          sy = sy + ca[j];
        }
        if (lo <= i) {
          dvx = dvx - S(cp.length) * sx * qd[1 + k];
          dvy = dvy - S(cp.length) * sy * qd[1 + k];
        }
      }
      // accumulate mp * J_col_r . (dJ/dq_m qd) * qd_m  (the Jdot qd
      // contraction; the dT/dq term cancels, see above)
      for (int r = 0; r < NQ; ++r) {
        S Jxr = (r == 0) ? S(1.0) : Bx[i][r - 1];
        S Jyr = (r == 0) ? S(0.0) : S(0.0) - By[i][r - 1];
        h[r] = h[r] + S(cp.mp) * (Jxr * dvx + Jyr * dvy) * qd[m];
      }
    }
  }
  // gravity: V = mp g sum_i sum_{j<=i} l cos a_j ;
  // dV/dq_m = -mp g l sum_i sum_{m-1<=j<=i} sin a_j  (chain over a)
  for (int m = 1; m <= NL; ++m) {
    S s = S(0.0);
    for (int i = 0; i < NL; ++i)
      for (int j = m - 1; j <= i; ++j) s = s + sa[j];
    h[m] = h[m] - S(cp.mp * cp.g * cp.length) * s;
  }
  // solve M qdd = tau - h (tiny SPD system, unrolled Cholesky)
  S rhs[NQ];
  for (int r = 0; r < NQ; ++r) rhs[r] = tau[r] - h[r];
  // Cholesky
  S L[NQ][NQ];
  for (int r = 0; r < NQ; ++r)
    for (int c = 0; c < NQ; ++c) L[r][c] = S(0.0);
  for (int j = 0; j < NQ; ++j) {
    S s = M[j][j];
    for (int k = 0; k < j; ++k) s = s - L[j][k] * L[j][k];
    // sqrt via dual-safe Newton-free: s^(1/2); implement sqrt for duals
    // inline: value sqrt + derivative 0.5/sqrt
    double sv = std::sqrt(val(s));
    S sj = dual_sqrt(s, sv);
    L[j][j] = sj;
    for (int r = j + 1; r < NQ; ++r) {
      S t = M[r][j];
      for (int k = 0; k < j; ++k) t = t - L[r][k] * L[j][k];
      L[r][j] = t / sj;
    }
  }
  // forward/back substitution
  S y[NQ];
  for (int r = 0; r < NQ; ++r) {
    S t = rhs[r];
    for (int k = 0; k < r; ++k) t = t - L[r][k] * y[k];
    y[r] = t / L[r][r];
  }
  for (int r = NQ - 1; r >= 0; --r) {
    S t = y[r];
    for (int k = r + 1; k < NQ; ++k) t = t - L[k][r] * qdd[k];
    qdd[r] = t / L[r][r];
  }
}

// RK4 on xdot = f(q, qd) for generic nq
template <class S, int NQ, class F>
void rk4_step(F&& xdot, const S* q, const S* qd, const S* tau, double h,
              S* q_out, S* qd_out) {
  S k1q[NQ], k1v[NQ], k2q[NQ], k2v[NQ], k3q[NQ], k3v[NQ], k4q[NQ], k4v[NQ];
  S tq[NQ], tv[NQ];
  xdot(q, qd, tau, k1q, k1v);
  for (int i = 0; i < NQ; ++i) {
    tq[i] = q[i] + S(h / 2) * k1q[i];
    tv[i] = qd[i] + S(h / 2) * k1v[i];
  }
  xdot(tq, tv, tau, k2q, k2v);
  for (int i = 0; i < NQ; ++i) {
    tq[i] = q[i] + S(h / 2) * k2q[i];
    tv[i] = qd[i] + S(h / 2) * k2v[i];
  }
  xdot(tq, tv, tau, k3q, k3v);
  for (int i = 0; i < NQ; ++i) {
    tq[i] = q[i] + S(h) * k3q[i];
    tv[i] = qd[i] + S(h) * k3v[i];
  }
  xdot(tq, tv, tau, k4q, k4v);
  for (int i = 0; i < NQ; ++i) {
    q_out[i] = q[i] + S(h / 6) * (k1q[i] + S(2.0) * k2q[i] + S(2.0) * k3q[i] + k4q[i]);
    qd_out[i] = qd[i] + S(h / 6) * (k1v[i] + S(2.0) * k2v[i] + S(2.0) * k3v[i] + k4v[i]);
  }
}

// env dispatch (scalar-generic single-sample step)
template <class S, int NQ>
void step_env(int env_id, const S* q, const S* qd, const S* tau, double h,
              S* q_out, S* qd_out) {
  if (env_id == 0) {  // pendulum (NQ == 1)
    PendulumParams p;
    auto xd = [&](const S* qq, const S* vv, const S* tt, S* oq, S* ov) {
      pendulum_xdot(p, qq, vv, tt, oq, ov);
    };
    rk4_step<S, NQ>(xd, q, qd, tau, h, q_out, qd_out);
  } else {  // cartpole with NQ-1 links
    CartpoleParams cp;
    auto xd = [&](const S* qq, const S* vv, const S* tt, S* oq, S* ov) {
      for (int i = 0; i < NQ; ++i) oq[i] = vv[i];
      cartpole_accel<S, NQ - 1>(cp, qq, vv, tt, ov);
    };
    rk4_step<S, NQ>(xd, q, qd, tau, h, q_out, qd_out);
  }
}

template <int NQ>
void batched_dynamics(int env_id, long bsz, const double* q, const double* qd,
                      const double* tau, const double* h, double* q_out,
                      double* qd_out) {
#pragma omp parallel for schedule(static)
  for (long b = 0; b < bsz; ++b) {
    step_env<double, NQ>(env_id, q + b * NQ, qd + b * NQ, tau + b * NQ,
                         h[b], q_out + b * NQ, qd_out + b * NQ);
  }
}

template <int NQ>
void batched_derivatives(int env_id, long bsz, const double* q,
                         const double* qd, const double* tau, const double* h,
                         double* dq_dq, double* dq_dqd, double* dq_dtau,
                         double* dqd_dq, double* dqd_dqd, double* dqd_dtau) {
  constexpr int ND = 3 * NQ;  // directions: q, qd, tau
  using D = Dual<ND>;
#pragma omp parallel for schedule(static)
  for (long b = 0; b < bsz; ++b) {
    D qs[NQ], qds[NQ], taus[NQ], qo[NQ], qdo[NQ];
    for (int i = 0; i < NQ; ++i) {
      qs[i] = D::seed(q[b * NQ + i], i);
      qds[i] = D::seed(qd[b * NQ + i], NQ + i);
      taus[i] = D::seed(tau[b * NQ + i], 2 * NQ + i);
    }
    step_env<D, NQ>(env_id, qs, qds, taus, h[b], qo, qdo);
    // blocks laid out (bsz, NQ_out, NQ_in) row-major, d out / d in
    for (int r = 0; r < NQ; ++r)
      for (int c = 0; c < NQ; ++c) {
        dq_dq[(b * NQ + r) * NQ + c] = qo[r].d[c];
        dq_dqd[(b * NQ + r) * NQ + c] = qo[r].d[NQ + c];
        dq_dtau[(b * NQ + r) * NQ + c] = qo[r].d[2 * NQ + c];
        dqd_dq[(b * NQ + r) * NQ + c] = qdo[r].d[c];
        dqd_dqd[(b * NQ + r) * NQ + c] = qdo[r].d[NQ + c];
        dqd_dtau[(b * NQ + r) * NQ + c] = qdo[r].d[2 * NQ + c];
      }
  }
}

}  // namespace

extern "C" {

void pendulum1l_dynamics(long bsz, const double* q, const double* qd,
                         const double* tau, const double* h, double* q_out,
                         double* qd_out) {
  batched_dynamics<1>(0, bsz, q, qd, tau, h, q_out, qd_out);
}
void pendulum1l_derivatives(long bsz, const double* q, const double* qd,
                            const double* tau, const double* h, double* a,
                            double* b, double* c, double* d, double* e,
                            double* f) {
  batched_derivatives<1>(0, bsz, q, qd, tau, h, a, b, c, d, e, f);
}
void cartpole1l_dynamics(long bsz, const double* q, const double* qd,
                         const double* tau, const double* h, double* q_out,
                         double* qd_out) {
  batched_dynamics<2>(1, bsz, q, qd, tau, h, q_out, qd_out);
}
void cartpole1l_derivatives(long bsz, const double* q, const double* qd,
                            const double* tau, const double* h, double* a,
                            double* b, double* c, double* d, double* e,
                            double* f) {
  batched_derivatives<2>(1, bsz, q, qd, tau, h, a, b, c, d, e, f);
}
void cartpole2l_dynamics(long bsz, const double* q, const double* qd,
                         const double* tau, const double* h, double* q_out,
                         double* qd_out) {
  batched_dynamics<3>(1, bsz, q, qd, tau, h, q_out, qd_out);
}
void cartpole2l_derivatives(long bsz, const double* q, const double* qd,
                            const double* tau, const double* h, double* a,
                            double* b, double* c, double* d, double* e,
                            double* f) {
  batched_derivatives<3>(1, bsz, q, qd, tau, h, a, b, c, d, e, f);
}

}  // extern "C"
