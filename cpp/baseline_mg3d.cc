// Single-core C++ baseline: 3D SIPG Poisson hp-multigrid solve to a 1e-8
// relative residual.  Mirrors the reference's solver stack re-implemented
// from scratch for a uniform hex grid:
//   * SIPG assembly after dune-hpdg's GaussLobattoIPDGAssembler
//     (assemblers/localassemblers/gausslobattoipdgassembler.hh),
//     generalized to 3D with the "normal" penalty scaling
//     sigma p^2 |f|/h (the 3D generalization of sigma p^2/|e|,
//     gausslobattoipdgassembler.hh:167; identical in 2D).
//   * hp-hierarchy after MultigridSetup (iterationsteps/solversetup.hh:
//     70-218): p-levels halve the degree down to 1, h-levels halve the
//     grid down to 3^3; level operators are RE-ASSEMBLED per level (the
//     operator_factory variant of the python bench).
//   * lexicographic block Gauss-Seidel smoothing, forward pre / backward
//     post, 3+3 sweeps (iterationsteps/dynamicblockgs.hh:94-126 sweep
//     order), dense Cholesky coarse solve.
//
// The reported solve_seconds covers the V-cycle iteration from x = 0
// until ||b - A x|| / ||b|| <= tol, INCLUDING the per-cycle residual
// checks (matching bench.py's accounting); assembly, transfer setup and
// block factorizations are setup and excluded (as in bench.py).
//
// Build: g++ -O3 -march=native -std=c++17 -o baseline_mg3d baseline_mg3d.cc
// Run:   ./baseline_mg3d [n] [p] [tol]
// Output: one JSON line with solve_seconds, cycles and the residual
// history (for parity with the python lexicographic-GS multigrid).

#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <chrono>
#include <vector>

namespace {

// ---------------- quadrature ----------------
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

// n-point Gauss-Lobatto on [0,1]
void gauss_lobatto(int n, double *x, double *w) {
  x[0] = -1.0;
  x[n - 1] = 1.0;
  for (int i = 1; i < n - 1; ++i) {
    double t = cos(M_PI * (n - 1 - i) / (n - 1));
    for (int it = 0; it < 100; ++it) {
      double pn, dpn, pn2, dpn2;
      legendre(t, n - 1, pn, dpn);
      double h = 1e-7;
      legendre(t + h, n - 1, pn2, dpn2);
      double eps = dpn / ((dpn2 - dpn) / h);
      t -= eps;
      if (fabs(eps) < 1e-15) break;
    }
    x[i] = t;
  }
  for (int i = 0; i < n; ++i) {
    double pn, dpn;
    legendre(x[i], n - 1, pn, dpn);
    w[i] = 2.0 / (n * (n - 1) * pn * pn);
    x[i] = 0.5 * (x[i] + 1.0);
    w[i] *= 0.5;
  }
}

// n-point Gauss-Legendre on [0,1] (for the L2 load vector, matching
// hpdg_tpu.assemble.rhs.l2_functional's quadrature)
void gauss_legendre(int n, double *x, double *w) {
  for (int i = 0; i < n; ++i) {
    double t = cos(M_PI * (i + 0.75) / (n + 0.5));
    for (int it = 0; it < 100; ++it) {
      double pn, dpn;
      legendre(t, n, pn, dpn);
      double eps = pn / dpn;
      t -= eps;
      if (fabs(eps) < 1e-15) break;
    }
    double pn, dpn;
    legendre(t, n, pn, dpn);
    x[n - 1 - i] = 0.5 * (t + 1.0);
    w[n - 1 - i] = 1.0 / ((1.0 - t * t) * dpn * dpn);
  }
}

double lag_value(const std::vector<double> &nodes, int i, double x) {
  double v = 1.0;
  int nb = (int)nodes.size();
  for (int j = 0; j < nb; ++j)
    if (j != i) v *= (x - nodes[j]) / (nodes[i] - nodes[j]);
  return v;
}

double lag_deriv(const std::vector<double> &nodes, int i, double x) {
  double s = 0.0;
  int nb = (int)nodes.size();
  for (int k = 0; k < nb; ++k) {
    if (k == i) continue;
    double t = 1.0 / (nodes[i] - nodes[k]);
    for (int j = 0; j < nb; ++j)
      if (j != i && j != k) t *= (x - nodes[j]) / (nodes[i] - nodes[j]);
    s += t;
  }
  return s;
}

struct Tables {
  int p, nb, nq;
  std::vector<double> nodes, qx, qw;      // GL nodes; quadrature
  std::vector<double> V, D;               // [nb][nq]
  std::vector<double> V0, V1, D0, D1;     // endpoint traces
};

Tables build_tables(int p) {
  Tables T;
  T.p = p;
  T.nb = p + 1;
  T.nq = p + 2;  // DUNE order 2p Gauss-Lobatto rule
  T.qx.resize(T.nq);
  T.qw.resize(T.nq);
  gauss_lobatto(T.nq, T.qx.data(), T.qw.data());
  std::vector<double> nw(T.nb);
  T.nodes.resize(T.nb);
  gauss_lobatto(T.nb, T.nodes.data(), nw.data());
  T.V.resize(T.nb * T.nq);
  T.D.resize(T.nb * T.nq);
  T.V0.resize(T.nb);
  T.V1.resize(T.nb);
  T.D0.resize(T.nb);
  T.D1.resize(T.nb);
  for (int i = 0; i < T.nb; ++i) {
    for (int q = 0; q < T.nq; ++q) {
      T.V[i * T.nq + q] = lag_value(T.nodes, i, T.qx[q]);
      T.D[i * T.nq + q] = lag_deriv(T.nodes, i, T.qx[q]);
    }
    T.V0[i] = lag_value(T.nodes, i, 0.0);
    T.V1[i] = lag_value(T.nodes, i, 1.0);
    T.D0[i] = lag_deriv(T.nodes, i, 0.0);
    T.D1[i] = lag_deriv(T.nodes, i, 1.0);
  }
  return T;
}

// ---------------- level operator ----------------
// Uniform n^3 grid, x fastest.  Interior face between e (low/inside) and
// eo (high/outside) on each axis; blocks M11/M22 folded into diag,
// off[face] = {M12, M21}.
struct LevelOp {
  int n, p, nb, bs;
  double h;
  long nelem, nfaces;
  std::vector<double> diag;   // [nelem][bs][bs]
  std::vector<double> off;    // [nfaces][2][bs][bs]
  std::vector<long> fidx;     // [3][nelem] face id or -1 (e = inside)
  std::vector<double> chol;   // factored diag blocks (lower), for GS
  long fid(int axis, long e) const { return fidx[axis * nelem + e]; }
  long nbr(int axis, long e) const {  // high neighbor
    return e + (axis == 0 ? 1 : axis == 1 ? n : (long)n * n);
  }
};

LevelOp assemble(int n, int p, double sigma) {
  LevelOp L;
  L.n = n;
  L.p = p;
  L.nb = p + 1;
  L.bs = L.nb * L.nb * L.nb;
  L.h = 1.0 / n;
  L.nelem = (long)n * n * n;
  L.nfaces = 3L * (n - 1) * n * n;
  const int NB = L.nb, NQ = p + 2, BS = L.bs;
  const double h = L.h, detJ = h * h * h, fmeas = h * h;
  // normal scaling: mu = sigma p^2 / h  (per unit face measure)
  const double mu = sigma * p * p / h;
  Tables T = build_tables(p);

  L.diag.assign(L.nelem * (long)BS * BS, 0.0);
  L.off.assign(L.nfaces * 2L * BS * BS, 0.0);
  L.fidx.assign(3 * L.nelem, -1);
  {
    long f = 0;
    for (int axis = 0; axis < 3; ++axis)
      for (long e = 0; e < L.nelem; ++e) {
        int c[3] = {(int)(e % n), (int)((e / n) % n), (int)(e / ((long)n * n))};
        if (c[axis] + 1 < n) L.fidx[axis * L.nelem + e] = f++;
      }
  }

  // bulk
  std::vector<double> grad(BS * 3);
  {
    // the local bulk block is identical for every element: compute once
    std::vector<double> A0(BS * BS, 0.0);
    for (int qz = 0; qz < NQ; ++qz)
      for (int qy = 0; qy < NQ; ++qy)
        for (int qx = 0; qx < NQ; ++qx) {
          double z = T.qw[qx] * T.qw[qy] * T.qw[qz] * detJ;
          int i = 0;
          for (int iz = 0; iz < NB; ++iz)
            for (int iy = 0; iy < NB; ++iy)
              for (int ix = 0; ix < NB; ++ix, ++i) {
                grad[i * 3 + 0] =
                    T.D[ix * NQ + qx] * T.V[iy * NQ + qy] * T.V[iz * NQ + qz] / h;
                grad[i * 3 + 1] =
                    T.V[ix * NQ + qx] * T.D[iy * NQ + qy] * T.V[iz * NQ + qz] / h;
                grad[i * 3 + 2] =
                    T.V[ix * NQ + qx] * T.V[iy * NQ + qy] * T.D[iz * NQ + qz] / h;
              }
          for (int a = 0; a < BS; ++a) {
            const double gx = grad[a * 3] * z, gy = grad[a * 3 + 1] * z,
                         gz = grad[a * 3 + 2] * z;
            double *row = &A0[a * BS];
            for (int b = 0; b < BS; ++b)
              row[b] += gx * grad[b * 3] + gy * grad[b * 3 + 1] +
                        gz * grad[b * 3 + 2];
          }
        }
    for (long e = 0; e < L.nelem; ++e)
      memcpy(&L.diag[e * (long)BS * BS], A0.data(),
             sizeof(double) * BS * BS);
  }

  // interior faces: the four blocks are also element-independent per
  // axis on a uniform grid — compute once per axis and scatter.
  {
    std::vector<double> vin(BS), vout(BS), dnin(BS), dnout(BS);
    for (int axis = 0; axis < 3; ++axis) {
      std::vector<double> B11(BS * BS, 0.0), B12(BS * BS, 0.0),
          B21(BS * BS, 0.0), B22(BS * BS, 0.0);
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
                double tang = T.V[t1 * NQ + q1] * T.V[t2 * NQ + q2];
                vin[i] = T.V1[idx[axis]] * tang;
                vout[i] = T.V0[idx[axis]] * tang;
                dnin[i] = T.D1[idx[axis]] * tang / h;
                dnout[i] = T.D0[idx[axis]] * tang / h;
              }
          for (int a = 0; a < BS; ++a)
            for (int b = 0; b < BS; ++b) {
              B11[a * BS + b] +=
                  z * (-0.5 * (vin[a] * dnin[b] + vin[b] * dnin[a]) +
                       mu * vin[a] * vin[b]);
              B12[a * BS + b] +=
                  z * (-0.5 * vin[a] * dnout[b] + 0.5 * vout[b] * dnin[a] -
                       mu * vin[a] * vout[b]);
              B21[a * BS + b] +=
                  z * (0.5 * vout[a] * dnin[b] - 0.5 * vin[b] * dnout[a] -
                       mu * vout[a] * vin[b]);
              B22[a * BS + b] +=
                  z * (0.5 * (vout[a] * dnout[b] + vout[b] * dnout[a]) +
                       mu * vout[a] * vout[b]);
            }
        }
      for (long e = 0; e < L.nelem; ++e) {
        long f = L.fid(axis, e);
        if (f < 0) continue;
        long eo = L.nbr(axis, e);
        double *de = &L.diag[e * (long)BS * BS];
        double *dn = &L.diag[eo * (long)BS * BS];
        for (int k = 0; k < BS * BS; ++k) {
          de[k] += B11[k];
          dn[k] += B22[k];
        }
        memcpy(&L.off[(2 * f) * (long)BS * BS], B12.data(),
               sizeof(double) * BS * BS);
        memcpy(&L.off[(2 * f + 1) * (long)BS * BS], B21.data(),
               sizeof(double) * BS * BS);
      }
    }
  }

  // Dirichlet boundary (full consistency weight, penalty mu)
  {
    std::vector<double> v(BS), dn(BS);
    for (int axis = 0; axis < 3; ++axis)
      for (int side = 0; side < 2; ++side) {
        std::vector<double> Bd(BS * BS, 0.0);
        double sgn = side == 1 ? 1.0 : -1.0;
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
                  double tang = T.V[t1 * NQ + q1] * T.V[t2 * NQ + q2];
                  v[i] = (side ? T.V1 : T.V0)[idx[axis]] * tang;
                  dn[i] = sgn * (side ? T.D1 : T.D0)[idx[axis]] * tang / h;
                }
            for (int a = 0; a < BS; ++a)
              for (int b = 0; b < BS; ++b)
                Bd[a * BS + b] +=
                    z * (-(v[a] * dn[b] + v[b] * dn[a]) + mu * v[a] * v[b]);
          }
        for (long e = 0; e < L.nelem; ++e) {
          int c[3] = {(int)(e % n), (int)((e / n) % n),
                      (int)(e / ((long)n * n))};
          if ((side == 0 && c[axis] != 0) || (side == 1 && c[axis] != n - 1))
            continue;
          double *de = &L.diag[e * (long)BS * BS];
          for (int k = 0; k < BS * BS; ++k) de[k] += Bd[k];
        }
      }
  }
  return L;
}

// ---------------- small dense Cholesky ----------------
void cholesky(double *A, int m) {  // in place, lower
  for (int j = 0; j < m; ++j) {
    double d = A[j * m + j];
    for (int k = 0; k < j; ++k) d -= A[j * m + k] * A[j * m + k];
    d = sqrt(d);
    A[j * m + j] = d;
    for (int i = j + 1; i < m; ++i) {
      double s = A[i * m + j];
      for (int k = 0; k < j; ++k) s -= A[i * m + k] * A[j * m + k];
      A[i * m + j] = s / d;
    }
  }
}

void chol_solve(const double *Lc, int m, double *x) {
  for (int i = 0; i < m; ++i) {
    double s = x[i];
    for (int k = 0; k < i; ++k) s -= Lc[i * m + k] * x[k];
    x[i] = s / Lc[i * m + i];
  }
  for (int i = m - 1; i >= 0; --i) {
    double s = x[i];
    for (int k = i + 1; k < m; ++k) s -= Lc[k * m + i] * x[k];
    x[i] = s / Lc[i * m + i];
  }
}

void factor_diag(LevelOp &L) {
  L.chol = L.diag;  // copy
  for (long e = 0; e < L.nelem; ++e)
    cholesky(&L.chol[e * (long)L.bs * L.bs], L.bs);
}

// ---------------- matvec / residual ----------------
void blk_gemv(const double *A, const double *x, double *y, int m,
              double alpha) {  // y += alpha * A x
  for (int a = 0; a < m; ++a) {
    const double *row = &A[a * m];
    double s = 0.0;
    for (int b = 0; b < m; ++b) s += row[b] * x[b];
    y[a] += alpha * s;
  }
}

void matvec(const LevelOp &L, const double *x, double *y) {
  const int BS = L.bs;
  for (long e = 0; e < L.nelem; ++e) {
    double *ye = &y[e * BS];
    for (int a = 0; a < BS; ++a) ye[a] = 0.0;
    blk_gemv(&L.diag[e * (long)BS * BS], &x[e * BS], ye, BS, 1.0);
    for (int axis = 0; axis < 3; ++axis) {
      long f = L.fid(axis, e);
      if (f >= 0)  // e is inside: couple to high neighbor via M12
        blk_gemv(&L.off[(2 * f) * (long)BS * BS], &x[L.nbr(axis, e) * BS],
                 ye, BS, 1.0);
      // e as outside of the face owned by its low neighbor: M21
      int c = axis == 0 ? (int)(e % L.n)
                        : axis == 1 ? (int)((e / L.n) % L.n)
                                    : (int)(e / ((long)L.n * L.n));
      if (c > 0) {
        long el = e - (axis == 0 ? 1 : axis == 1 ? L.n : (long)L.n * L.n);
        long fl = L.fid(axis, el);
        blk_gemv(&L.off[(2 * fl + 1) * (long)BS * BS], &x[el * BS], ye, BS,
                 1.0);
      }
    }
  }
}

// one lexicographic block-GS sweep: x_e <- D_e^{-1} (b_e - offdiag x)
void gs_sweep(const LevelOp &L, const double *b, double *x, bool backward) {
  const int BS = L.bs;
  std::vector<double> r(BS);
  for (long k = 0; k < L.nelem; ++k) {
    long e = backward ? L.nelem - 1 - k : k;
    for (int a = 0; a < BS; ++a) r[a] = b[e * BS + a];
    for (int axis = 0; axis < 3; ++axis) {
      long f = L.fid(axis, e);
      if (f >= 0)
        blk_gemv(&L.off[(2 * f) * (long)BS * BS], &x[L.nbr(axis, e) * BS],
                 r.data(), BS, -1.0);
      int c = axis == 0 ? (int)(e % L.n)
                        : axis == 1 ? (int)((e / L.n) % L.n)
                                    : (int)(e / ((long)L.n * L.n));
      if (c > 0) {
        long el = e - (axis == 0 ? 1 : axis == 1 ? L.n : (long)L.n * L.n);
        long fl = L.fid(axis, el);
        blk_gemv(&L.off[(2 * fl + 1) * (long)BS * BS], &x[el * BS], r.data(),
                 BS, -1.0);
      }
    }
    chol_solve(&L.chol[e * (long)BS * BS], BS, r.data());
    for (int a = 0; a < BS; ++a) x[e * BS + a] = r[a];
  }
}

// ---------------- transfers ----------------
// p-transfer (same mesh): T[i_f][j_c] = coarse basis j at fine node i
std::vector<double> p_transfer_matrix(int pf, int pc) {
  int nbf = pf + 1, nbc = pc + 1;
  std::vector<double> nf(nbf), nc(nbc), wf(nbf), wc(nbc);
  gauss_lobatto(nbf, nf.data(), wf.data());
  gauss_lobatto(nbc, nc.data(), wc.data());
  std::vector<double> nodes_c(nc);
  int bsf = nbf * nbf * nbf, bsc = nbc * nbc * nbc;
  std::vector<double> T((long)bsf * bsc);
  std::vector<double> L1(nbf * nbc);  // 1D: coarse j at fine node i
  for (int i = 0; i < nbf; ++i)
    for (int j = 0; j < nbc; ++j)
      L1[i * nbc + j] = lag_value(nodes_c, j, nf[i]);
  int i = 0;
  for (int iz = 0; iz < nbf; ++iz)
    for (int iy = 0; iy < nbf; ++iy)
      for (int ix = 0; ix < nbf; ++ix, ++i) {
        int j = 0;
        for (int jz = 0; jz < nbc; ++jz)
          for (int jy = 0; jy < nbc; ++jy)
            for (int jx = 0; jx < nbc; ++jx, ++j)
              T[(long)i * bsc + j] =
                  L1[ix * nbc + jx] * L1[iy * nbc + jy] * L1[iz * nbc + jz];
      }
  return T;
}

// h-transfer (p fixed): per child position, coarse basis at child node
// mapped to parent coords (bit + x)/2
std::vector<std::vector<double>> h_transfer_matrices(int p) {
  int nb = p + 1, bs = nb * nb * nb;
  std::vector<double> nodes(nb), w(nb);
  gauss_lobatto(nb, nodes.data(), w.data());
  std::vector<std::vector<double>> Ts(8);
  for (int var = 0; var < 8; ++var) {
    int bits[3] = {(var >> 2) & 1, (var >> 1) & 1, var & 1};  // z,y,x? see below
    // child_pos convention (mesh.adaptive/refine): bits over axes in
    // natural order, LAST axis fastest: var = bx*4? — python refine uses
    // bits = (var >> (dim-1-a)) & 1 for axis a, i.e. axis 0 is the
    // HIGHEST bit.  Here axes are (x,y,z) with x fastest in the lattice;
    // we only need consistency within this file: child at lattice offset
    // (ox,oy,oz) uses bits (ox,oy,oz).
    (void)bits;
    int ox = var & 1, oy = (var >> 1) & 1, oz = (var >> 2) & 1;
    std::vector<double> L1x(nb * nb), L1y(nb * nb), L1z(nb * nb);
    for (int i = 0; i < nb; ++i)
      for (int j = 0; j < nb; ++j) {
        L1x[i * nb + j] = lag_value(nodes, j, 0.5 * (ox + nodes[i]));
        L1y[i * nb + j] = lag_value(nodes, j, 0.5 * (oy + nodes[i]));
        L1z[i * nb + j] = lag_value(nodes, j, 0.5 * (oz + nodes[i]));
      }
    std::vector<double> T((long)bs * bs);
    int i = 0;
    for (int iz = 0; iz < nb; ++iz)
      for (int iy = 0; iy < nb; ++iy)
        for (int ix = 0; ix < nb; ++ix, ++i) {
          int j = 0;
          for (int jz = 0; jz < nb; ++jz)
            for (int jy = 0; jy < nb; ++jy)
              for (int jx = 0; jx < nb; ++jx, ++j)
                T[(long)i * bs + j] =
                    L1x[ix * nb + jx] * L1y[iy * nb + jy] * L1z[iz * nb + jz];
        }
    Ts[var] = std::move(T);
  }
  return Ts;
}

struct Transfer {
  bool is_h;             // else p
  int n_f, p_f, p_c;     // fine grid size & degrees
  std::vector<double> Tp;                 // p-transfer block
  std::vector<std::vector<double>> Th;    // h-transfer blocks per child
};

// ---------------- hierarchy ----------------
struct Hier {
  std::vector<LevelOp> L;        // coarsest..finest
  std::vector<Transfer> T;       // T[l]: level l+1 -> level l
  std::vector<double> coarse;    // dense factored coarse matrix
  int pre = 3, post = 3;
};

void restrict_r(const Hier &H, int l, const double *rf, double *rc) {
  const Transfer &tr = H.T[l - 1];
  const LevelOp &Lf = H.L[l], &Lc = H.L[l - 1];
  long nc = Lc.nelem;
  for (long e = 0; e < nc * Lc.bs; ++e) rc[e] = 0.0;
  if (!tr.is_h) {
    int bsf = Lf.bs, bsc = Lc.bs;
    for (long e = 0; e < Lf.nelem; ++e)
      for (int i = 0; i < bsf; ++i) {
        double v = rf[e * bsf + i];
        const double *row = &tr.Tp[(long)i * bsc];
        double *out = &rc[e * bsc];
        for (int j = 0; j < bsc; ++j) out[j] += row[j] * v;
      }
  } else {
    int bs = Lf.bs;
    int nF = Lf.n, nC = Lc.n;
    for (long e = 0; e < Lf.nelem; ++e) {
      int ex = e % nF, ey = (e / nF) % nF, ez = e / ((long)nF * nF);
      long ep = (ex / 2) + (long)nC * (ey / 2) + (long)nC * nC * (ez / 2);
      int var = (ex & 1) | ((ey & 1) << 1) | ((ez & 1) << 2);
      const std::vector<double> &T = tr.Th[var];
      for (int i = 0; i < bs; ++i) {
        double v = rf[e * bs + i];
        const double *row = &T[(long)i * bs];
        double *out = &rc[ep * bs];
        for (int j = 0; j < bs; ++j) out[j] += row[j] * v;
      }
    }
  }
}

void prolong_c(const Hier &H, int l, const double *xc, double *xf_add) {
  const Transfer &tr = H.T[l - 1];
  const LevelOp &Lf = H.L[l], &Lc = H.L[l - 1];
  if (!tr.is_h) {
    int bsf = Lf.bs, bsc = Lc.bs;
    for (long e = 0; e < Lf.nelem; ++e)
      for (int i = 0; i < bsf; ++i) {
        const double *row = &tr.Tp[(long)i * bsc];
        const double *in = &xc[e * bsc];
        double s = 0.0;
        for (int j = 0; j < bsc; ++j) s += row[j] * in[j];
        xf_add[e * bsf + i] += s;
      }
  } else {
    int bs = Lf.bs;
    int nF = Lf.n, nC = Lc.n;
    for (long e = 0; e < Lf.nelem; ++e) {
      int ex = e % nF, ey = (e / nF) % nF, ez = e / ((long)nF * nF);
      long ep = (ex / 2) + (long)nC * (ey / 2) + (long)nC * nC * (ez / 2);
      int var = (ex & 1) | ((ey & 1) << 1) | ((ez & 1) << 2);
      const std::vector<double> &T = tr.Th[var];
      for (int i = 0; i < bs; ++i) {
        const double *row = &T[(long)i * bs];
        const double *in = &xc[ep * bs];
        double s = 0.0;
        for (int j = 0; j < bs; ++j) s += row[j] * in[j];
        xf_add[e * bs + i] += s;
      }
    }
  }
}

void coarse_solve(const Hier &H, const double *b, double *x) {
  const LevelOp &L0 = H.L[0];
  long m = L0.nelem * L0.bs;
  for (long i = 0; i < m; ++i) x[i] = b[i];
  chol_solve(H.coarse.data(), (int)m, x);
}

void vcycle(Hier &H, int l, double *x, const double *b,
            std::vector<std::vector<double>> &work) {
  if (l == 0) {
    coarse_solve(H, b, x);
    return;
  }
  LevelOp &L = H.L[l];
  long m = L.nelem * L.bs;
  for (int s = 0; s < H.pre; ++s) gs_sweep(L, b, x, false);
  std::vector<double> &r = work[2 * l];
  r.resize(m);
  matvec(L, x, r.data());
  for (long i = 0; i < m; ++i) r[i] = b[i] - r[i];
  long mc = H.L[l - 1].nelem * H.L[l - 1].bs;
  std::vector<double> rc(mc), xc(mc, 0.0);
  restrict_r(H, l, r.data(), rc.data());
  vcycle(H, l - 1, xc.data(), rc.data(), work);
  prolong_c(H, l, xc.data(), x);
  for (int s = 0; s < H.post; ++s) gs_sweep(L, b, x, true);
}

}  // namespace

int main(int argc, char **argv) {
  int n = argc > 1 ? atoi(argv[1]) : 12;
  int p = argc > 2 ? atoi(argv[2]) : 4;
  double tol = argc > 3 ? atof(argv[3]) : 1e-8;
  const double sigma = 2.0;

  // ---------------- setup (untimed, like bench.py) ----------------
  auto ts0 = std::chrono::steady_clock::now();
  Hier H;
  // p-levels: p -> p/2 -> ... -> 1 on the fine grid
  std::vector<std::pair<int, int>> levels;  // (n, p), coarsest first
  {
    std::vector<std::pair<int, int>> tmp;
    int pc = p;
    tmp.push_back({n, pc});
    while (pc > 1) {
      pc = pc / 2 > 0 ? pc / 2 : 1;
      tmp.push_back({n, pc});
    }
    int nc = n;
    while (nc % 2 == 0 && nc > 3) {
      nc /= 2;
      tmp.push_back({nc, tmp.back().second});
    }
    for (auto it = tmp.rbegin(); it != tmp.rend(); ++it) levels.push_back(*it);
  }
  for (auto [nl, pl] : levels) {
    H.L.push_back(assemble(nl, pl, sigma));
    factor_diag(H.L.back());
  }
  for (size_t l = 0; l + 1 < levels.size(); ++l) {
    Transfer tr;
    tr.is_h = levels[l + 1].first != levels[l].first;
    tr.n_f = levels[l + 1].first;
    tr.p_f = levels[l + 1].second;
    tr.p_c = levels[l].second;
    if (tr.is_h)
      tr.Th = h_transfer_matrices(tr.p_f);
    else
      tr.Tp = p_transfer_matrix(tr.p_f, tr.p_c);
    H.T.push_back(std::move(tr));
  }
  // dense coarse factorization
  {
    const LevelOp &L0 = H.L[0];
    long m = L0.nelem * L0.bs;
    H.coarse.assign(m * m, 0.0);
    const int BS = L0.bs;
    for (long e = 0; e < L0.nelem; ++e) {
      for (int a = 0; a < BS; ++a)
        for (int b = 0; b < BS; ++b)
          H.coarse[(e * BS + a) * m + e * BS + b] =
              L0.diag[e * (long)BS * BS + a * BS + b];
      for (int axis = 0; axis < 3; ++axis) {
        long f = L0.fid(axis, e);
        if (f < 0) continue;
        long eo = L0.nbr(axis, e);
        for (int a = 0; a < BS; ++a)
          for (int b = 0; b < BS; ++b) {
            H.coarse[(e * BS + a) * m + eo * BS + b] =
                L0.off[(2 * f) * (long)BS * BS + a * BS + b];
            H.coarse[(eo * BS + a) * m + e * BS + b] =
                L0.off[(2 * f + 1) * (long)BS * BS + a * BS + b];
          }
      }
    }
    cholesky(H.coarse.data(), (int)m);
  }

  // RHS: f = 2 pi^2 sin(pi x) sin(pi y) sin(pi z) — matches bench.py's
  // l2_functional (Gauss-Legendre p+2 points per axis)
  LevelOp &Lf = H.L.back();
  const int NB = Lf.nb, NQR = p + 2, BS = Lf.bs;
  long m = Lf.nelem * BS;
  std::vector<double> b(m, 0.0);
  {
    std::vector<double> qx(NQR), qw(NQR);
    gauss_legendre(NQR, qx.data(), qw.data());
    Tables T = build_tables(p);
    std::vector<double> VL(NB * NQR);
    for (int i = 0; i < NB; ++i)
      for (int q = 0; q < NQR; ++q)
        VL[i * NQR + q] = lag_value(T.nodes, i, qx[q]);
    double h = Lf.h, detJ = h * h * h;
    for (long e = 0; e < Lf.nelem; ++e) {
      int ex = e % n, ey = (e / n) % n, ez = e / ((long)n * n);
      for (int qz = 0; qz < NQR; ++qz)
        for (int qy = 0; qy < NQR; ++qy)
          for (int qx_ = 0; qx_ < NQR; ++qx_) {
            double X = (ex + qx[qx_]) * h, Y = (ey + qx[qy]) * h,
                   Z = (ez + qx[qz]) * h;
            double fv = 2.0 * M_PI * M_PI * sin(M_PI * X) * sin(M_PI * Y) *
                        sin(M_PI * Z);
            double z = qw[qx_] * qw[qy] * qw[qz] * detJ * fv;
            int i = 0;
            for (int iz = 0; iz < NB; ++iz)
              for (int iy = 0; iy < NB; ++iy)
                for (int ix = 0; ix < NB; ++ix, ++i)
                  b[e * BS + i] +=
                      z * VL[ix * NQR + qx_] * VL[iy * NQR + qy] *
                      VL[iz * NQR + qz];
          }
    }
  }
  auto ts1 = std::chrono::steady_clock::now();
  double setup_secs = std::chrono::duration<double>(ts1 - ts0).count();

  // ---------------- the timed solve ----------------
  double nb = 0.0;
  for (long i = 0; i < m; ++i) nb += b[i] * b[i];
  nb = sqrt(nb);
  std::vector<double> x(m, 0.0), r(m);
  std::vector<std::vector<double>> work(2 * H.L.size() + 2);
  std::vector<double> history;
  history.push_back(1.0);
  int cycles = 0;
  auto t0 = std::chrono::steady_clock::now();
  for (; cycles < 100; ) {
    vcycle(H, (int)H.L.size() - 1, x.data(), b.data(), work);
    ++cycles;
    matvec(Lf, x.data(), r.data());
    double nr = 0.0;
    for (long i = 0; i < m; ++i) {
      r[i] = b[i] - r[i];
      nr += r[i] * r[i];
    }
    nr = sqrt(nr) / nb;
    history.push_back(nr);
    if (nr <= tol) break;
  }
  auto t1 = std::chrono::steady_clock::now();
  double secs = std::chrono::duration<double>(t1 - t0).count();

  printf("{\"n\":%d,\"p\":%d,\"dofs\":%ld,\"solve_seconds\":%.4f,"
         "\"setup_seconds\":%.2f,\"cycles\":%d,\"rel_residual\":%.3e,"
         "\"history\":[",
         n, p, m, secs, setup_secs, cycles, history.back());
  for (size_t i = 0; i < history.size(); ++i)
    printf("%s%.17e", i ? "," : "", history[i]);
  printf("]}\n");
  return 0;
}
