// Single-core C++ baseline: 3D SIPG Poisson p=4 assembly, following the
// algorithm of dune-hpdg's GaussLobattoIPDGAssembler (computeBulk /
// computeFace, assemblers/localassemblers/gausslobattoipdgassembler.hh)
// generalized from 2D to 3D: cached 1D Gauss-Lobatto value/derivative
// tables, then per-element / per-face quadrature loops with dense
// accumulation into the local blocks.  This is the per-chip speedup
// denominator for bench.py ("single-core C++ ref" in BASELINE.md).
//
// Build:  g++ -O3 -march=native -std=c++17 -o baseline_sipg3d baseline_sipg3d.cc
// Run:    ./baseline_sipg3d [n]      (n^3 hex elements, degree 4)
// Output: one JSON line {"dofs":..,"seconds":..,"dofs_per_s":..}

#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <chrono>
#include <vector>

namespace {

constexpr int P = 4;            // polynomial degree
constexpr int NB = P + 1;       // 1D basis size
constexpr int NQ = P + 2;       // Gauss-Lobatto points for DUNE order 2p
constexpr int BS = NB * NB * NB;  // local block size (125)

// ---- quadrature: NQ-point Gauss-Lobatto on [0,1] (Newton on P'_{NQ-1}) ----
void legendre(double x, int n, double &pn, double &dpn) {
  double p0 = 1.0, p1 = x;
  for (int k = 1; k < n; ++k) {
    double p2 = ((2 * k + 1) * x * p1 - k * p0) / (k + 1);
    p0 = p1;
    p1 = p2;
  }
  pn = p1;
  dpn = n * (x * p1 - p0) / (x * x - 1.0);
}

void gauss_lobatto(int n, double *x, double *w) {
  x[0] = -1.0;
  x[n - 1] = 1.0;
  for (int i = 1; i < n - 1; ++i) {
    // initial guess: Chebyshev-like
    double t = cos(M_PI * (n - 1 - i) / (n - 1));
    for (int it = 0; it < 100; ++it) {
      double pn, dpn, pn2, dpn2, eps;
      legendre(t, n - 1, pn, dpn);
      // Newton on dP_{n-1}: second derivative via recurrence
      double h = 1e-7;
      legendre(t + h, n - 1, pn2, dpn2);
      eps = dpn / ((dpn2 - dpn) / h);
      t -= eps;
      if (fabs(eps) < 1e-15) break;
    }
    x[i] = t;
  }
  for (int i = 0; i < n; ++i) {
    double pn, dpn;
    legendre(x[i], n - 1, pn, dpn);
    w[i] = 2.0 / (n * (n - 1) * pn * pn);
    x[i] = 0.5 * (x[i] + 1.0);  // map to [0,1]
    w[i] *= 0.5;
  }
}

// ---- 1D Lagrange basis at Gauss-Lobatto nodes ----
struct Tables {
  double qx[NQ], qw[NQ];
  double nodes[NB];
  double V[NB][NQ];   // value of basis i at quad point q
  double D[NB][NQ];   // derivative
  double V0[NB], V1[NB], D0[NB], D1[NB];  // endpoint traces
};

double lag_value(const double *nodes, int i, double x) {
  double v = 1.0;
  for (int j = 0; j < NB; ++j)
    if (j != i) v *= (x - nodes[j]) / (nodes[i] - nodes[j]);
  return v;
}

double lag_deriv(const double *nodes, int i, double x) {
  double s = 0.0;
  for (int k = 0; k < NB; ++k) {
    if (k == i) continue;
    double t = 1.0 / (nodes[i] - nodes[k]);
    for (int j = 0; j < NB; ++j)
      if (j != i && j != k) t *= (x - nodes[j]) / (nodes[i] - nodes[j]);
    s += t;
  }
  return s;
}

void build_tables(Tables &T) {
  gauss_lobatto(NQ, T.qx, T.qw);
  double nx[NB], nw[NB];
  gauss_lobatto(NB, nx, nw);
  for (int i = 0; i < NB; ++i) T.nodes[i] = nx[i];
  for (int i = 0; i < NB; ++i) {
    for (int q = 0; q < NQ; ++q) {
      T.V[i][q] = lag_value(T.nodes, i, T.qx[q]);
      T.D[i][q] = lag_deriv(T.nodes, i, T.qx[q]);
    }
    T.V0[i] = lag_value(T.nodes, i, 0.0);
    T.V1[i] = lag_value(T.nodes, i, 1.0);
    T.D0[i] = lag_deriv(T.nodes, i, 0.0);
    T.D1[i] = lag_deriv(T.nodes, i, 1.0);
  }
}

}  // namespace

int main(int argc, char **argv) {
  int n = argc > 1 ? atoi(argv[1]) : 6;
  const double h = 1.0 / n;
  const double detJ = h * h * h;
  const double sigma = 2.0;
  const double penalty = sigma * P * P;  // * 1/|f| applied below

  Tables T;
  build_tables(T);

  const long nelem = (long)n * n * n;
  const long dofs = nelem * BS;

  // storage: one diagonal block per element + 2 blocks per interior face
  std::vector<double> diag(nelem * (long)BS * BS, 0.0);
  long nfaces = 3L * (n - 1) * n * n;
  std::vector<double> off(2 * nfaces * (long)BS * BS, 0.0);

  auto t0 = std::chrono::steady_clock::now();

  // ---------------- bulk (computeBulk generalized to 3D) ----------------
  // per quad point: build the 125 reference gradients, transform by the
  // (diagonal) inverse Jacobian, rank-1 accumulate into the local block.
  {
    static double grad[BS][3];
    for (long e = 0; e < nelem; ++e) {
      double *A = &diag[e * BS * BS];
      for (int qz = 0; qz < NQ; ++qz)
        for (int qy = 0; qy < NQ; ++qy)
          for (int qx = 0; qx < NQ; ++qx) {
            double z = T.qw[qx] * T.qw[qy] * T.qw[qz] * detJ;
            int i = 0;
            for (int iz = 0; iz < NB; ++iz)
              for (int iy = 0; iy < NB; ++iy)
                for (int ix = 0; ix < NB; ++ix, ++i) {
                  grad[i][0] = T.D[ix][qx] * T.V[iy][qy] * T.V[iz][qz] / h;
                  grad[i][1] = T.V[ix][qx] * T.D[iy][qy] * T.V[iz][qz] / h;
                  grad[i][2] = T.V[ix][qx] * T.V[iy][qy] * T.D[iz][qz] / h;
                }
            for (int a = 0; a < BS; ++a) {
              const double gx = grad[a][0] * z, gy = grad[a][1] * z,
                           gz = grad[a][2] * z;
              double *row = &A[a * BS];
              for (int b = 0; b < BS; ++b)
                row[b] += gx * grad[b][0] + gy * grad[b][1] + gz * grad[b][2];
            }
          }
    }
  }

  // ---------------- interior faces (computeFace, 3D) ----------------
  // traces on a face: values and normal derivatives of all 125 basis
  // functions at the NQ x NQ face quadrature points, both sides.
  {
    const double fmeas = h * h;
    const double mu = penalty / fmeas;
    static double vin[BS], vout[BS], dnin[BS], dnout[BS];
    long f = 0;
    for (int axis = 0; axis < 3; ++axis) {
      for (long e = 0; e < nelem; ++e) {
        // lattice coords (x fastest)
        int ex = e % n, ey = (e / n) % n, ez = e / ((long)n * n);
        int c[3] = {ex, ey, ez};
        if (c[axis] + 1 >= n) continue;
        double *M11d = &diag[e * BS * BS];
        long eo = e + (axis == 0 ? 1 : axis == 1 ? n : (long)n * n);
        double *M22d = &diag[eo * BS * BS];
        double *M12 = &off[(2 * f) * (long)BS * BS];
        double *M21 = &off[(2 * f + 1) * (long)BS * BS];
        ++f;
        for (int q2 = 0; q2 < NQ; ++q2)
          for (int q1 = 0; q1 < NQ; ++q1) {
            double z = T.qw[q1] * T.qw[q2] * fmeas;
            int i = 0;
            for (int iz = 0; iz < NB; ++iz)
              for (int iy = 0; iy < NB; ++iy)
                for (int ix = 0; ix < NB; ++ix, ++i) {
                  int idx[3] = {ix, iy, iz};
                  int t1 = axis == 0 ? idx[1] : idx[0];
                  int t2 = axis == 2 ? idx[1] : idx[2];
                  double tang = T.V[t1][q1] * T.V[t2][q2];
                  // inside: face at local coord 1; outside: at 0
                  vin[i] = T.V1[idx[axis]] * tang;
                  vout[i] = T.V0[idx[axis]] * tang;
                  dnin[i] = T.D1[idx[axis]] * tang / h;
                  dnout[i] = T.D0[idx[axis]] * tang / h;
                }
            for (int a = 0; a < BS; ++a) {
              double *r11 = &M11d[a * BS];
              double *r12 = &M12[a * BS];
              double *r21 = &M21[a * BS];
              double *r22 = &M22d[a * BS];
              for (int b = 0; b < BS; ++b) {
                r11[b] += z * (-0.5 * (vin[a] * dnin[b] + vin[b] * dnin[a]) +
                               mu * vin[a] * vin[b]);
                r12[b] += z * (-0.5 * vin[a] * dnout[b] +
                               0.5 * vout[b] * dnin[a] - mu * vin[a] * vout[b]);
                r21[b] += z * (0.5 * vout[a] * dnin[b] -
                               0.5 * vin[b] * dnout[a] - mu * vout[a] * vin[b]);
                r22[b] += z * (0.5 * (vout[a] * dnout[b] + vout[b] * dnout[a]) +
                               mu * vout[a] * vout[b]);
              }
            }
          }
      }
    }
  }

  // ---------------- Dirichlet boundary faces ----------------
  {
    const double fmeas = h * h;
    const double mu = penalty / fmeas;
    static double v[BS], dn[BS];
    for (int axis = 0; axis < 3; ++axis)
      for (int side = 0; side < 2; ++side)
        for (long e = 0; e < nelem; ++e) {
          int ex = e % n, ey = (e / n) % n, ez = e / ((long)n * n);
          int c[3] = {ex, ey, ez};
          if (side == 0 && c[axis] != 0) continue;
          if (side == 1 && c[axis] != n - 1) continue;
          double sgn = side == 1 ? 1.0 : -1.0;
          double *A = &diag[e * BS * BS];
          for (int q2 = 0; q2 < NQ; ++q2)
            for (int q1 = 0; q1 < NQ; ++q1) {
              double z = T.qw[q1] * T.qw[q2] * fmeas;
              int i = 0;
              for (int iz = 0; iz < NB; ++iz)
                for (int iy = 0; iy < NB; ++iy)
                  for (int ix = 0; ix < NB; ++ix, ++i) {
                    int idx[3] = {ix, iy, iz};
                    int t1 = axis == 0 ? idx[1] : idx[0];
                    int t2 = axis == 2 ? idx[1] : idx[2];
                    double tang = T.V[t1][q1] * T.V[t2][q2];
                    v[i] = (side ? T.V1 : T.V0)[idx[axis]] * tang;
                    dn[i] = sgn * (side ? T.D1 : T.D0)[idx[axis]] * tang / h;
                  }
              for (int a = 0; a < BS; ++a) {
                double *row = &A[a * BS];
                for (int b = 0; b < BS; ++b)
                  row[b] += z * (-(v[a] * dn[b] + v[b] * dn[a]) +
                                 mu * v[a] * v[b]);
              }
            }
        }
  }

  auto t1 = std::chrono::steady_clock::now();
  double secs = std::chrono::duration<double>(t1 - t0).count();
  if (argc > 2 && argv[2][0] == 'd') {  // dump element-0 diag + face-0 blocks
    FILE *fp = fopen("baseline_dump.bin", "wb");
    fwrite(&diag[0], sizeof(double), BS * BS, fp);
    if (nfaces > 0) fwrite(&off[0], sizeof(double), 2 * BS * BS, fp);
    fclose(fp);
  }
  // checksum to defeat dead-code elimination
  double chk = 0;
  for (long i = 0; i < (long)diag.size(); i += 9973) chk += diag[i];
  for (long i = 0; i < (long)off.size(); i += 9973) chk += off[i];
  fprintf(stderr, "# checksum %.6e\n", chk);
  printf("{\"n\":%d,\"dofs\":%ld,\"seconds\":%.4f,\"dofs_per_s\":%.1f}\n", n,
         dofs, secs, dofs / secs);
  return 0;
}
