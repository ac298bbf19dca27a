// minigeom — host-side multi-view geometry solvers (C API, no deps).
//
// Native replacement for the pycolmap surface the reference uses
// (SURVEY.md §2.3): essential-matrix estimation with RANSAC + cheirality,
// PnP RANSAC with Gauss-Newton refinement. These are small-N, branch-heavy
// problems that belong on the host CPU, not in XLA.
//
// Solvers:
//   * essential: normalized 8-point minimal sample inside RANSAC
//     (Sampson gating in normalized coords), rank-2 projection, 4-way
//     (R,t) disambiguation by cheirality, inlier re-estimation.
//   * pnp: 6-point DLT minimal sample inside RANSAC (reprojection
//     gating), then Gauss-Newton on se(3) over the inliers.
//
// Linear algebra is self-contained: Jacobi eigendecomposition of
// symmetric matrices (sizes <= 12) provides nullspaces and 3x3 SVDs.
//
// Build: see build.sh (g++ -O3 -shared -fPIC).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>
#include <random>
#include <vector>

namespace {

// ----------------------------------------------------------------- small LA

// Jacobi eigendecomposition of symmetric n x n matrix A (row major).
// On return: eigenvalues in w (ascending), eigenvectors in columns of V.
void jacobi_eig(int n, double* A, double* w, double* V) {
  for (int i = 0; i < n * n; ++i) V[i] = 0.0;
  for (int i = 0; i < n; ++i) V[i * n + i] = 1.0;
  for (int sweep = 0; sweep < 100; ++sweep) {
    double off = 0.0;
    for (int p = 0; p < n; ++p)
      for (int q = p + 1; q < n; ++q) off += A[p * n + q] * A[p * n + q];
    if (off < 1e-24) break;
    for (int p = 0; p < n; ++p) {
      for (int q = p + 1; q < n; ++q) {
        double apq = A[p * n + q];
        if (std::fabs(apq) < 1e-300) continue;
        double app = A[p * n + p], aqq = A[q * n + q];
        double tau = (aqq - app) / (2.0 * apq);
        double t = (tau >= 0 ? 1.0 : -1.0) /
                   (std::fabs(tau) + std::sqrt(1.0 + tau * tau));
        double c = 1.0 / std::sqrt(1.0 + t * t), s = t * c;
        for (int k = 0; k < n; ++k) {
          double akp = A[k * n + p], akq = A[k * n + q];
          A[k * n + p] = c * akp - s * akq;
          A[k * n + q] = s * akp + c * akq;
        }
        for (int k = 0; k < n; ++k) {
          double apk = A[p * n + k], aqk = A[q * n + k];
          A[p * n + k] = c * apk - s * aqk;
          A[q * n + k] = s * apk + c * aqk;
        }
        for (int k = 0; k < n; ++k) {
          double vkp = V[k * n + p], vkq = V[k * n + q];
          V[k * n + p] = c * vkp - s * vkq;
          V[k * n + q] = s * vkp + c * vkq;
        }
      }
    }
  }
  // sort ascending
  std::vector<int> idx(n);
  for (int i = 0; i < n; ++i) { idx[i] = i; w[i] = A[i * n + i]; }
  std::sort(idx.begin(), idx.end(), [&](int a, int b) { return w[a] < w[b]; });
  std::vector<double> w2(n), V2(n * n);
  for (int i = 0; i < n; ++i) {
    w2[i] = w[idx[i]];
    for (int k = 0; k < n; ++k) V2[k * n + i] = V[k * n + idx[i]];
  }
  std::memcpy(w, w2.data(), n * sizeof(double));
  std::memcpy(V, V2.data(), n * n * sizeof(double));
}

// nullspace direction of A (m x n, m >= n-1): eigenvector of A^T A with the
// smallest eigenvalue. A row-major.
void nullspace(int m, int n, const double* A, double* x) {
  std::vector<double> ata(n * n, 0.0);
  for (int i = 0; i < m; ++i)
    for (int a = 0; a < n; ++a)
      for (int b = 0; b < n; ++b) ata[a * n + b] += A[i * n + a] * A[i * n + b];
  std::vector<double> w(n), V(n * n);
  jacobi_eig(n, ata.data(), w.data(), V.data());
  for (int k = 0; k < n; ++k) x[k] = V[k * n + 0];
}

struct M3 { double m[9]; };
struct V3 { double v[3]; };

inline V3 mul(const M3& A, const V3& x) {
  V3 r;
  for (int i = 0; i < 3; ++i)
    r.v[i] = A.m[i * 3] * x.v[0] + A.m[i * 3 + 1] * x.v[1] + A.m[i * 3 + 2] * x.v[2];
  return r;
}
inline M3 mulT(const M3& A, const M3& B) {  // A * B
  M3 r;
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      double s = 0;
      for (int k = 0; k < 3; ++k) s += A.m[i * 3 + k] * B.m[k * 3 + j];
      r.m[i * 3 + j] = s;
    }
  return r;
}
inline M3 transpose(const M3& A) {
  M3 r;
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) r.m[i * 3 + j] = A.m[j * 3 + i];
  return r;
}
inline double det3(const M3& A) {
  const double* a = A.m;
  return a[0] * (a[4] * a[8] - a[5] * a[7]) - a[1] * (a[3] * a[8] - a[5] * a[6]) +
         a[2] * (a[3] * a[7] - a[4] * a[6]);
}
inline V3 cross(const V3& a, const V3& b) {
  return {a.v[1] * b.v[2] - a.v[2] * b.v[1], a.v[2] * b.v[0] - a.v[0] * b.v[2],
          a.v[0] * b.v[1] - a.v[1] * b.v[0]};
}
inline double dot(const V3& a, const V3& b) {
  return a.v[0] * b.v[0] + a.v[1] * b.v[1] + a.v[2] * b.v[2];
}
inline V3 normalize(const V3& a) {
  double n = std::sqrt(dot(a, a)) + 1e-300;
  return {a.v[0] / n, a.v[1] / n, a.v[2] / n};
}

// SVD of a 3x3 matrix: A = U diag(s) V^T via eigendecompositions.
void svd3(const M3& A, M3& U, double* s, M3& V) {
  // V from A^T A
  double ata[9];
  M3 At = transpose(A);
  M3 AtA = mulT(At, A);
  std::memcpy(ata, AtA.m, sizeof(ata));
  double w[3], Vm[9];
  jacobi_eig(3, ata, w, Vm);
  // descending order
  int order[3] = {2, 1, 0};
  for (int i = 0; i < 3; ++i) {
    s[i] = std::sqrt(std::max(0.0, w[order[i]]));
    for (int k = 0; k < 3; ++k) V.m[k * 3 + i] = Vm[k * 3 + order[i]];
  }
  // U columns = A v_i / s_i. The division is ill-conditioned once s_i is
  // small RELATIVE to s_0 (an essential matrix has s = (s,s,0) where the
  // numerical zero can be ~1e-9): rebuild such columns by cross products
  // so U stays orthonormal.
  double tol = 1e-6 * std::max(s[0], 1e-300);
  for (int i = 0; i < 3; ++i) {
    V3 vi = {V.m[0 * 3 + i], V.m[1 * 3 + i], V.m[2 * 3 + i]};
    V3 ui = mul(A, vi);
    if (s[i] > tol && i < 2) {
      for (int k = 0; k < 3; ++k) U.m[k * 3 + i] = ui.v[k] / s[i];
    } else if (i == 2) {
      V3 u0 = {U.m[0], U.m[3], U.m[6]};
      V3 u1 = {U.m[1], U.m[4], U.m[7]};
      // preserve the true sign when s_2 is genuinely nonzero
      V3 u2 = normalize(cross(u0, u1));
      if (s[i] > tol && dot(u2, ui) < 0)
        for (int k = 0; k < 3; ++k) u2.v[k] = -u2.v[k];
      for (int k = 0; k < 3; ++k) U.m[k * 3 + i] = u2.v[k];
    } else {
      // rank-<2 input: pick any unit vector orthogonal to column 0
      V3 u0 = {U.m[0], U.m[3], U.m[6]};
      V3 ref = std::fabs(u0.v[0]) < 0.9 ? V3{1, 0, 0} : V3{0, 1, 0};
      V3 u1 = normalize(cross(u0, ref));
      for (int k = 0; k < 3; ++k) U.m[k * 3 + i] = u1.v[k];
    }
  }
}

// ------------------------------------------------------------- triangulation

// Midpoint triangulation of a normalized match under (I|0) and (R|t).
// Returns depth in both cameras via z0/z1.
void triangulate_depths(const M3& R, const V3& t, const V3& x0, const V3& x1,
                        double* z0, double* z1) {
  // Solve [x0, -R^T x1] [z0; z1] = R^T t ... use least squares on
  // z0 * x0 - z1 * (R^T x1) = R^T(-t)? Derive: X_c1 = R X_c0 + t;
  // z1 x1 = R z0 x0 + t  ->  z0 (R x0) - z1 x1 = -t, solve 3x2 LS.
  V3 Rx0 = mul(R, x0);
  double A[6] = {Rx0.v[0], -x1.v[0], Rx0.v[1], -x1.v[1], Rx0.v[2], -x1.v[2]};
  double b[3] = {-t.v[0], -t.v[1], -t.v[2]};
  // normal equations 2x2
  double a00 = 0, a01 = 0, a11 = 0, b0 = 0, b1 = 0;
  for (int i = 0; i < 3; ++i) {
    a00 += A[i * 2] * A[i * 2];
    a01 += A[i * 2] * A[i * 2 + 1];
    a11 += A[i * 2 + 1] * A[i * 2 + 1];
    b0 += A[i * 2] * b[i];
    b1 += A[i * 2 + 1] * b[i];
  }
  double det = a00 * a11 - a01 * a01;
  if (std::fabs(det) < 1e-18) { *z0 = *z1 = -1; return; }
  *z0 = (b0 * a11 - b1 * a01) / det;
  *z1 = (a00 * b1 - a01 * b0) / det;
}

// ------------------------------------------------------------ essential mat

void essential_from_8pt(int n, const double* x0, const double* x1, M3& E) {
  std::vector<double> A(n * 9);
  for (int i = 0; i < n; ++i) {
    double u0 = x0[i * 2], v0 = x0[i * 2 + 1];
    double u1 = x1[i * 2], v1 = x1[i * 2 + 1];
    double* r = &A[i * 9];
    r[0] = u1 * u0; r[1] = u1 * v0; r[2] = u1;
    r[3] = v1 * u0; r[4] = v1 * v0; r[5] = v1;
    r[6] = u0;      r[7] = v0;      r[8] = 1.0;
  }
  double e[9];
  nullspace(n, 9, A.data(), e);
  std::memcpy(E.m, e, sizeof(e));
  // project to essential manifold: singular values (s,s,0)
  M3 U, V;
  double s[3];
  svd3(E, U, s, V);
  double sm = (s[0] + s[1]) / 2;
  M3 S = {{sm, 0, 0, 0, sm, 0, 0, 0, 0}};
  E = mulT(mulT(U, S), transpose(V));
}

double sampson_sq(const M3& E, const double* p0, const double* p1) {
  V3 x0 = {p0[0], p0[1], 1.0}, x1 = {p1[0], p1[1], 1.0};
  V3 Ex0 = mul(E, x0);
  V3 Etx1 = mul(transpose(E), x1);
  double x1Ex0 = dot(x1, Ex0);
  double denom = Ex0.v[0] * Ex0.v[0] + Ex0.v[1] * Ex0.v[1] +
                 Etx1.v[0] * Etx1.v[0] + Etx1.v[1] * Etx1.v[1];
  return x1Ex0 * x1Ex0 / (denom + 1e-300);
}

// decompose E into the cheirality-best (R,t)
void decompose_E(const M3& E, int n, const double* x0, const double* x1,
                 const std::vector<int>& sample, M3& Rbest, V3& tbest) {
  M3 U, V;
  double s[3];
  svd3(E, U, s, V);
  if (det3(U) < 0) for (int k = 0; k < 3; ++k) U.m[k * 3 + 2] *= -1;
  if (det3(V) < 0) for (int k = 0; k < 3; ++k) V.m[k * 3 + 2] *= -1;
  M3 W = {{0, -1, 0, 1, 0, 0, 0, 0, 1}};
  M3 Ra = mulT(mulT(U, W), transpose(V));
  M3 Rb = mulT(mulT(U, transpose(W)), transpose(V));
  V3 u3 = {U.m[2], U.m[5], U.m[8]};
  M3 Rs[4] = {Ra, Ra, Rb, Rb};
  V3 ts[4] = {u3, {-u3.v[0], -u3.v[1], -u3.v[2]}, u3,
              {-u3.v[0], -u3.v[1], -u3.v[2]}};
  int best = 0, best_cnt = -1;
  for (int c = 0; c < 4; ++c) {
    int cnt = 0;
    for (int i : sample) {
      V3 a = {x0[i * 2], x0[i * 2 + 1], 1.0};
      V3 b = {x1[i * 2], x1[i * 2 + 1], 1.0};
      double z0, z1;
      triangulate_depths(Rs[c], ts[c], a, b, &z0, &z1);
      if (z0 > 0 && z1 > 0) ++cnt;
    }
    if (cnt > best_cnt) { best_cnt = cnt; best = c; }
  }
  Rbest = Rs[best];
  tbest = normalize(ts[best]);
}

// --------------------------------------------------------------- PnP pieces

// DLT P6P: projection matrix from >=6 2D(normalized)-3D matches, then
// extract (R, t) by orthogonalizing the left 3x3.
bool pnp_dlt(int n, const int* idx, int k, const double* x2d, const double* X3d,
             M3& R, V3& t) {
  std::vector<double> A(2 * k * 12, 0.0);
  for (int s = 0; s < k; ++s) {
    int i = idx[s];
    const double* X = &X3d[i * 3];
    double u = x2d[i * 2], v = x2d[i * 2 + 1];
    double* r0 = &A[(2 * s) * 12];
    double* r1 = &A[(2 * s + 1) * 12];
    for (int c = 0; c < 3; ++c) {
      r0[c] = X[c];
      r0[8 + c] = -u * X[c];
      r1[4 + c] = X[c];
      r1[8 + c] = -v * X[c];
    }
    r0[3] = 1.0; r0[11] = -u;
    r1[7] = 1.0; r1[11] = -v;
  }
  double p[12];
  nullspace(2 * k, 12, A.data(), p);
  M3 M = {{p[0], p[1], p[2], p[4], p[5], p[6], p[8], p[9], p[10]}};
  V3 p4 = {p[3], p[7], p[11]};
  double d = det3(M);
  if (d < 0) {
    for (int i = 0; i < 9; ++i) M.m[i] *= -1;
    for (int i = 0; i < 3; ++i) p4.v[i] *= -1;
  }
  M3 U, V;
  double s[3];
  svd3(M, U, s, V);
  double scale = (s[0] + s[1] + s[2]) / 3.0;
  if (scale < 1e-12) return false;
  R = mulT(U, transpose(V));
  if (det3(R) < 0) return false;
  for (int i = 0; i < 3; ++i) t.v[i] = p4.v[i] / scale;
  return true;
}

inline void rodrigues(const V3& w, M3& R) {
  double th = std::sqrt(dot(w, w));
  M3 I = {{1, 0, 0, 0, 1, 0, 0, 0, 1}};
  M3 K = {{0, -w.v[2], w.v[1], w.v[2], 0, -w.v[0], -w.v[1], w.v[0], 0}};
  if (th < 1e-12) { R = I; return; }
  double a = std::sin(th) / th;
  double b = (1 - std::cos(th)) / (th * th);
  M3 KK = mulT(K, K);
  for (int i = 0; i < 9; ++i) R.m[i] = I.m[i] + a * K.m[i] + b * KK.m[i];
}

// Gauss-Newton on (R,t) minimizing normalized reprojection over inliers.
void pnp_refine(int n, const uint8_t* inl, const double* x2d, const double* X3d,
                M3& R, V3& t, int iters = 20) {
  for (int it = 0; it < iters; ++it) {
    double JTJ[36] = {0};
    double JTr[6] = {0};
    double cost = 0;
    for (int i = 0; i < n; ++i) {
      if (!inl[i]) continue;
      V3 X = {X3d[i * 3], X3d[i * 3 + 1], X3d[i * 3 + 2]};
      V3 Xc = mul(R, X);
      for (int k = 0; k < 3; ++k) Xc.v[k] += t.v[k];
      double z = Xc.v[2];
      if (z < 1e-9) continue;
      double u = Xc.v[0] / z, v = Xc.v[1] / z;
      double ru = u - x2d[i * 2], rv = v - x2d[i * 2 + 1];
      cost += ru * ru + rv * rv;
      // d(u,v)/dXc
      double du[3] = {1 / z, 0, -Xc.v[0] / (z * z)};
      double dv[3] = {0, 1 / z, -Xc.v[1] / (z * z)};
      // dXc/d(dw) = -[Xc]x (left perturbation), dXc/d(dt) = I
      double J[2][6];
      double Xx[9] = {0, -Xc.v[2], Xc.v[1], Xc.v[2], 0, -Xc.v[0],
                      -Xc.v[1], Xc.v[0], 0};
      for (int c = 0; c < 3; ++c) {
        double ju = 0, jv = 0;
        for (int k = 0; k < 3; ++k) {
          ju += du[k] * (-Xx[k * 3 + c]);
          jv += dv[k] * (-Xx[k * 3 + c]);
        }
        J[0][c] = ju; J[1][c] = jv;
        J[0][3 + c] = du[c]; J[1][3 + c] = dv[c];
      }
      for (int a = 0; a < 6; ++a) {
        JTr[a] += J[0][a] * ru + J[1][a] * rv;
        for (int b = 0; b < 6; ++b)
          JTJ[a * 6 + b] += J[0][a] * J[0][b] + J[1][a] * J[1][b];
      }
    }
    // solve (JTJ + lm I) dx = -JTr by Gaussian elimination
    for (int a = 0; a < 6; ++a) JTJ[a * 6 + a] += 1e-9;
    double x[6];
    {
      double Aa[36]; double bb[6];
      std::memcpy(Aa, JTJ, sizeof(Aa));
      for (int a = 0; a < 6; ++a) bb[a] = -JTr[a];
      for (int col = 0; col < 6; ++col) {
        int piv = col;
        for (int r2 = col + 1; r2 < 6; ++r2)
          if (std::fabs(Aa[r2 * 6 + col]) > std::fabs(Aa[piv * 6 + col])) piv = r2;
        for (int c2 = 0; c2 < 6; ++c2) std::swap(Aa[col * 6 + c2], Aa[piv * 6 + c2]);
        std::swap(bb[col], bb[piv]);
        double d = Aa[col * 6 + col];
        if (std::fabs(d) < 1e-18) { for (int q = 0; q < 6; ++q) x[q] = 0; goto done; }
        for (int r2 = col + 1; r2 < 6; ++r2) {
          double f = Aa[r2 * 6 + col] / d;
          for (int c2 = col; c2 < 6; ++c2) Aa[r2 * 6 + c2] -= f * Aa[col * 6 + c2];
          bb[r2] -= f * bb[col];
        }
      }
      for (int r2 = 5; r2 >= 0; --r2) {
        double sum = bb[r2];
        for (int c2 = r2 + 1; c2 < 6; ++c2) sum -= Aa[r2 * 6 + c2] * x[c2];
        x[r2] = sum / Aa[r2 * 6 + r2];
      }
    }
done:;
    V3 dw = {x[0], x[1], x[2]};
    M3 dR;
    rodrigues(dw, dR);
    R = mulT(dR, R);
    for (int k = 0; k < 3; ++k) t.v[k] += x[3 + k];
    double step = 0;
    for (int k = 0; k < 6; ++k) step += x[k] * x[k];
    if (step < 1e-20) break;
  }
}

}  // namespace

// ================================================================= C API

extern "C" {

// kp0/kp1: [n,2] pixels; K row-major [3,3]. Outputs: R [3,3], t [3],
// inliers [n] (0/1). Returns 1 on success.
int mg_essential_ransac(const double* kp0, const double* kp1, int n,
                        const double* K, double threshold_px, double prob,
                        int max_iters, double* R_out, double* t_out,
                        uint8_t* inliers_out) {
  if (n < 8) return 0;
  double fx = K[0], cx = K[2], fy = K[4], cy = K[5];
  std::vector<double> x0(n * 2), x1(n * 2);
  for (int i = 0; i < n; ++i) {
    x0[i * 2] = (kp0[i * 2] - cx) / fx;
    x0[i * 2 + 1] = (kp0[i * 2 + 1] - cy) / fy;
    x1[i * 2] = (kp1[i * 2] - cx) / fx;
    x1[i * 2 + 1] = (kp1[i * 2 + 1] - cy) / fy;
  }
  double thr = threshold_px / fx;
  double thr2 = thr * thr;
  std::mt19937 rng(42);
  std::uniform_int_distribution<int> uni(0, n - 1);
  int best_cnt = -1;
  std::vector<uint8_t> best_inl(n, 0), inl(n, 0);
  M3 Ebest;
  int iters = max_iters;
  for (int it = 0; it < iters; ++it) {
    int idx[8];
    for (int k = 0; k < 8;) {
      int cand = uni(rng);
      bool dup = false;
      for (int j = 0; j < k; ++j) dup |= (idx[j] == cand);
      if (!dup) idx[k++] = cand;
    }
    double s0[16], s1[16];
    for (int k = 0; k < 8; ++k) {
      s0[k * 2] = x0[idx[k] * 2]; s0[k * 2 + 1] = x0[idx[k] * 2 + 1];
      s1[k * 2] = x1[idx[k] * 2]; s1[k * 2 + 1] = x1[idx[k] * 2 + 1];
    }
    M3 E;
    essential_from_8pt(8, s0, s1, E);
    int cnt = 0;
    for (int i = 0; i < n; ++i) {
      bool ok = sampson_sq(E, &x0[i * 2], &x1[i * 2]) < thr2;
      inl[i] = ok;
      cnt += ok;
    }
    if (cnt > best_cnt) {
      best_cnt = cnt;
      best_inl = inl;
      Ebest = E;
      // adaptive iteration count (clamp in double BEFORE the int cast —
      // need can be ~1e11 for low inlier ratios and int() would overflow)
      double w = double(cnt) / n;
      double denom = std::log(std::max(1e-12, 1.0 - std::pow(w, 8.0)));
      if (denom < -1e-12) {
        double need_d = std::log(1 - prob) / denom + 1.0;
        int need = (need_d > double(max_iters)) ? max_iters : int(need_d);
        iters = std::min(max_iters, std::max(need, it + 1));
      }
    }
  }
  if (best_cnt < 8) return 0;
  // re-estimate on inliers
  std::vector<double> i0, i1;
  std::vector<int> iidx;
  for (int i = 0; i < n; ++i)
    if (best_inl[i]) {
      i0.push_back(x0[i * 2]); i0.push_back(x0[i * 2 + 1]);
      i1.push_back(x1[i * 2]); i1.push_back(x1[i * 2 + 1]);
      iidx.push_back(i);
    }
  M3 E;
  essential_from_8pt((int)iidx.size(), i0.data(), i1.data(), E);
  // final inlier set under refined E
  int cnt = 0;
  for (int i = 0; i < n; ++i) {
    best_inl[i] = sampson_sq(E, &x0[i * 2], &x1[i * 2]) < thr2;
    cnt += best_inl[i];
  }
  if (cnt < 8) return 0;
  std::vector<int> all_inl;
  for (int i = 0; i < n; ++i) if (best_inl[i]) all_inl.push_back(i);
  M3 R;
  V3 t;
  decompose_E(E, n, x0.data(), x1.data(), all_inl, R, t);
  std::memcpy(R_out, R.m, 9 * sizeof(double));
  std::memcpy(t_out, t.v, 3 * sizeof(double));
  std::memcpy(inliers_out, best_inl.data(), n);
  return 1;
}

// p2d: [n,2] pixels; p3d: [n,3]; K [3,3]. Outputs R (w2c), t, inliers.
int mg_pnp_ransac(const double* p2d, const double* p3d, int n, const double* K,
                  double max_error_px, int max_iters, int refine,
                  double* R_out, double* t_out, uint8_t* inliers_out) {
  if (n < 6) return 0;
  double fx = K[0], cx = K[2], fy = K[4], cy = K[5];
  std::vector<double> x2(n * 2);
  for (int i = 0; i < n; ++i) {
    x2[i * 2] = (p2d[i * 2] - cx) / fx;
    x2[i * 2 + 1] = (p2d[i * 2 + 1] - cy) / fy;
  }
  double thr = max_error_px / fx;
  double thr2 = thr * thr;
  std::mt19937 rng(7);
  std::uniform_int_distribution<int> uni(0, n - 1);
  int best_cnt = -1;
  std::vector<uint8_t> best_inl(n, 0), inl(n, 0);
  M3 Rb; V3 tb;
  int iters = max_iters;
  for (int it = 0; it < iters; ++it) {
    int idx[6];
    for (int k = 0; k < 6;) {
      int cand = uni(rng);
      bool dup = false;
      for (int j = 0; j < k; ++j) dup |= (idx[j] == cand);
      if (!dup) idx[k++] = cand;
    }
    M3 R; V3 t;
    if (!pnp_dlt(n, idx, 6, x2.data(), p3d, R, t)) continue;
    int cnt = 0;
    for (int i = 0; i < n; ++i) {
      V3 X = {p3d[i * 3], p3d[i * 3 + 1], p3d[i * 3 + 2]};
      V3 Xc = mul(R, X);
      for (int k = 0; k < 3; ++k) Xc.v[k] += t.v[k];
      bool ok = false;
      if (Xc.v[2] > 1e-9) {
        double du = Xc.v[0] / Xc.v[2] - x2[i * 2];
        double dv = Xc.v[1] / Xc.v[2] - x2[i * 2 + 1];
        ok = du * du + dv * dv < thr2;
      }
      inl[i] = ok;
      cnt += ok;
    }
    if (cnt > best_cnt) {
      best_cnt = cnt; best_inl = inl; Rb = R; tb = t;
      double w = double(cnt) / n;
      double denom = std::log(std::max(1e-12, 1.0 - std::pow(w, 6.0)));
      if (denom < -1e-12) {
        double need_d = std::log(1 - 0.9999) / denom + 1.0;
        int need = (need_d > double(max_iters)) ? max_iters : int(need_d);
        iters = std::min(max_iters, std::max(need, it + 1));
      }
    }
  }
  if (best_cnt < 6) return 0;
  if (refine) {
    pnp_refine(n, best_inl.data(), x2.data(), p3d, Rb, tb);
    int cnt = 0;
    for (int i = 0; i < n; ++i) {
      V3 X = {p3d[i * 3], p3d[i * 3 + 1], p3d[i * 3 + 2]};
      V3 Xc = mul(Rb, X);
      for (int k = 0; k < 3; ++k) Xc.v[k] += tb.v[k];
      bool ok = false;
      if (Xc.v[2] > 1e-9) {
        double du = Xc.v[0] / Xc.v[2] - x2[i * 2];
        double dv = Xc.v[1] / Xc.v[2] - x2[i * 2 + 1];
        ok = du * du + dv * dv < thr2;
      }
      best_inl[i] = ok;
      cnt += ok;
    }
    if (cnt >= 6) pnp_refine(n, best_inl.data(), x2.data(), p3d, Rb, tb);
  }
  std::memcpy(R_out, Rb.m, 9 * sizeof(double));
  std::memcpy(t_out, tb.v, 3 * sizeof(double));
  std::memcpy(inliers_out, best_inl.data(), n);
  return 1;
}

}  // extern "C"
