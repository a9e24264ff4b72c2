// meshkit: native mesh-topology kernel for hpdg_tpu.
//
// Builds the face connectivity (conforming matches + 2:1 hanging-node
// matches + boundary faces) of an axis-aligned box mesh — the host-side
// "graph builder" of the framework (the role DUNE's grid/intersection
// machinery plays for the reference).  The Python implementation in
// hpdg_tpu/mesh/structured.py is the readable fallback; this kernel is
// the production path for large meshes (hash-join over quantized face
// keys, single pass, no Python object churn).
//
// Keys are fixed-size int64 arrays (plane, tang lower/extent pairs,
// half) — POD, no per-key heap allocation, FNV-hashed in registers; at
// 1e6+ elements this is the difference between O(seconds) and the
// vector<int64_t>-keyed map it replaced.
//
// Build: g++ -O3 -march=native -std=c++17 -shared -fPIC -o libmeshkit.so meshkit.cc
//
// C ABI (ctypes): all arrays caller-allocated; capacities passed in
// (cap_f, cap_b).  Each interior face consumes at least one unique
// (element, axis, half) slot, and so does each boundary face, so
// 2 * dim * n bounds both counts.  Returns nonzero on overflow (the
// Python wrapper then falls back to the numpy matcher).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// max key: plane + 2 tangential (lower, extent) pairs + half = 6 (dim<=3)
struct Key6 {
  int64_t v[6];
  bool operator==(const Key6 &o) const {
    return std::memcmp(v, o.v, sizeof(v)) == 0;
  }
};

inline size_t hash6(const Key6 &k) {
  size_t h = 1469598103934665603ull;
  for (int i = 0; i < 6; ++i) {
    h ^= (size_t)k.v[i];
    h *= 1099511628211ull;
  }
  // finalize: FNV alone clusters on low-entropy lattice keys
  h ^= h >> 33;
  h *= 0xff51afd7ed558ccdull;
  h ^= h >> 33;
  return h;
}

// flat open-addressing hash table (linear probing) — ~5x faster than
// unordered_map for this insert-once/probe-twice join
class FaceTable {
 public:
  explicit FaceTable(int64_t expect) {
    size_t cap = 16;
    while (cap < (size_t)(2 * expect + 1)) cap <<= 1;
    mask_ = cap - 1;
    vals_.assign(cap, -1);
    keys_.resize(cap);
  }
  void clear() { std::fill(vals_.begin(), vals_.end(), -1); }
  void insert(const Key6 &k, int64_t v) {
    size_t i = hash6(k) & mask_;
    while (vals_[i] >= 0) {
      if (keys_[i] == k) return;  // keep first (matches map.emplace)
      i = (i + 1) & mask_;
    }
    keys_[i] = k;
    vals_[i] = v;
  }
  int64_t find(const Key6 &k) const {
    size_t i = hash6(k) & mask_;
    while (vals_[i] >= 0) {
      if (keys_[i] == k) return vals_[i];
      i = (i + 1) & mask_;
    }
    return -1;
  }

 private:
  size_t mask_;
  std::vector<Key6> keys_;
  std::vector<int64_t> vals_;
};

}  // namespace

extern "C" int hpdg_build_faces(
    int64_t n, int32_t dim, const double *lower, const double *extent,
    double tol,
    int32_t *f_inside, int32_t *f_outside, int32_t *f_axis, int32_t *f_nc,
    int32_t *b_elem, int32_t *b_axis, int32_t *b_side,
    int64_t cap_f, int64_t cap_b,
    int64_t *nf_out, int64_t *nbf_out) {
  if (dim < 1 || dim > 3) return 2;
  const double scale = 1.0 / tol;
  int64_t nf = 0, nbf = 0;

  const int nt = dim - 1;
  FaceTable table(2 * n);
  std::vector<Key6> keys(2 * n);
  std::vector<int8_t> matched(2 * n), used_big(2 * n);
  for (int32_t axis = 0; axis < dim; ++axis) {
    table.clear();
    auto make_key = [&](int64_t e, int half) {
      Key6 k{};
      double plane =
          lower[e * dim + axis] + (half == 0 ? extent[e * dim + axis] : 0.0);
      k.v[0] = (int64_t)llround(plane * scale);
      int j = 1;
      for (int a = 0; a < dim; ++a) {
        if (a == axis) continue;
        k.v[j++] = (int64_t)llround(lower[e * dim + a] * scale);
        k.v[j++] = (int64_t)llround(extent[e * dim + a] * scale);
      }
      return k;
    };
    // pass 1: exact conforming matches.  half 0 = elem's HIGH face
    // (element on the low side), half 1 = elem's LOW face.
    std::fill(matched.begin(), matched.end(), 0);
    std::fill(used_big.begin(), used_big.end(), 0);
    for (int64_t e = 0; e < n; ++e) {
      for (int half = 0; half < 2; ++half) {
        Key6 k = make_key(e, half);
        keys[2 * e + half] = k;
        k.v[5] = half + 1;  // separate the halves in the table (1/2)
        table.insert(k, e);
      }
    }
    for (int64_t e = 0; e < n; ++e) {
      // my high face (half 0) against neighbor's low face (half 1)
      Key6 k = keys[2 * e + 0];
      k.v[5] = 2;  // half 1
      int64_t nb = table.find(k);
      if (nb >= 0) {
        if (nf >= cap_f) return 1;
        f_inside[nf] = (int32_t)e;
        f_outside[nf] = (int32_t)nb;
        f_axis[nf] = axis;
        f_nc[nf] = 0;
        ++nf;
        matched[2 * e + 0] = 1;
        matched[2 * nb + 1] = 1;
      }
    }
    // pass 2: 2:1 hanging-node matches (small face inside a big face)
    for (int64_t e = 0; e < n; ++e) {
      for (int half = 0; half < 2; ++half) {
        if (matched[2 * e + half]) continue;
        const Key6 &k = keys[2 * e + half];
        bool found = false;
        for (int sub = 0; sub < (1 << nt) && !found; ++sub) {
          // probe keys quantize FLOAT arithmetic: llround(2*te*s) !=
          // 2*llround(te*s) for extents like 1/3 — integer doubling
          // silently missed valid 2:1 matches
          Key6 big{};
          big.v[0] = k.v[0];
          int t = 0;
          for (int a = 0; a < dim; ++a) {
            if (a == axis) continue;
            int bit = (sub >> (nt - 1 - t)) & 1;
            double tl = lower[e * dim + a], te = extent[e * dim + a];
            big.v[1 + 2 * t] = (int64_t)llround((tl - bit * te) * scale);
            big.v[2 + 2 * t] = (int64_t)llround(2.0 * te * scale);
            ++t;
          }
          big.v[5] = (1 - half) + 1;
          int64_t eb = table.find(big);
          if (eb >= 0) {
            found = true;
            matched[2 * e + half] = 1;
            used_big[2 * eb + (1 - half)] = 1;
            int32_t code, e_in, e_out;
            if (half == 0) {  // small elem on the low side
              e_in = (int32_t)e;
              e_out = (int32_t)eb;
              code = 1 + sub + (1 << nt);  // coarse is outside
            } else {
              e_in = (int32_t)eb;
              e_out = (int32_t)e;
              code = 1 + sub;  // coarse is inside
            }
            if (nf >= cap_f) return 1;
            f_inside[nf] = e_in;
            f_outside[nf] = e_out;
            f_axis[nf] = axis;
            f_nc[nf] = code;
            ++nf;
          }
        }
      }
    }
    // pass 3: boundary faces
    for (int64_t e = 0; e < n; ++e) {
      for (int half = 0; half < 2; ++half) {
        if (matched[2 * e + half] || used_big[2 * e + half]) continue;
        if (nbf >= cap_b) return 1;
        b_elem[nbf] = (int32_t)e;
        b_axis[nbf] = axis;
        b_side[nbf] = (half == 0) ? 1 : 0;  // half 0 = high face
        ++nbf;
      }
    }
  }
  *nf_out = nf;
  *nbf_out = nbf;
  return 0;
}


// ---------------------------------------------------------------------------
// Factorized uniform SIPG apply (f64 host kernel).
//
// The uniform-lattice SIPG operator separates exactly per axis,
//   A = sum_ax  L_ax (x) Mm (x) Mm
// (see hpdg_tpu/matrixfree/uniform.py::uniform_sipg_factorized, the
// differential-tested XLA twin; reference role: the sum-factorized
// apply of matrix-free/localoperators/sfipdg.hh:38-725 restricted to
// the uniform lattice).  This kernel exists for the f64 HOST residual
// path of the iterative-refinement solve (bench.py): XLA-CPU executes
// the same contraction chain transpose/copy-bound (~215 ms at 24^3 p=4
// on this single-core host) where this kernel streams.
//
// Internally the data lives TRANSPOSED — structure-of-arrays
// (nb^3, n_elements), element index innermost — so EVERY contraction
// is   out[j, E] += M[j,k] * in[k, E(+shift)]   over long contiguous
// element ranges (unit stride, fully vectorizable), including the
// block-tridiagonal line couplings:
//   * line axis 0/1: interior positions form contiguous runs,
//   * line axis 2 (fastest): each lattice line is itself contiguous,
//     so interior positions are the run's interior — same code path.
// The two block transposes (n, nb^3) <-> (nb^3, n) at entry/exit are
// cache-blocked and cost two memory passes each.
//
// API: u, y are (n_elements, nb^3) C-order f64 (the bucketed block-
// vector layout).  Block matrices row-major nb x nb, out_j = sum_k
// M[j*nb+k] in_k; line matrices packed [3][nb*nb] axis-major.
// s1, s2, s3 are caller-allocated scratch buffers of length N.

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

// blocked transpose (rows, cols) -> (cols, rows)
void fact_transpose(const double* in, double* out, int64_t rows,
                    int64_t cols) {
  const int64_t BT = 32;
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
  for (int64_t r0 = 0; r0 < rows; r0 += BT) {
    const int64_t r1 = r0 + BT < rows ? r0 + BT : rows;
    for (int64_t c0 = 0; c0 < cols; c0 += BT) {
      const int64_t c1 = c0 + BT < cols ? c0 + BT : cols;
      for (int64_t r = r0; r < r1; ++r)
        for (int64_t c = c0; c < c1; ++c)
          out[c * rows + r] = in[r * cols + c];
    }
  }
}

// SoA local-axis contraction: data (L0, nb, L1, n) with the contracted
// local axis in the middle; out[l0, j, l1, :] = sum_k M[j,k] in[l0, k, l1, :]
// The element axis is chunked so the 2*nb active rows stay cache-
// resident across the j/k loops: one DRAM read + one write per pass.
void soa_contract(const double* in, double* out, const double* M,
                  int64_t L0, int64_t nb, int64_t L1, int64_t n) {
  const int64_t CH = 1024;
#ifdef _OPENMP
#pragma omp parallel for collapse(2) schedule(static)
#endif
  for (int64_t l0 = 0; l0 < L0; ++l0) {
    for (int64_t l1 = 0; l1 < L1; ++l1) {
      const double* ib = in + (l0 * nb * L1 + l1) * n;
      double* ob = out + (l0 * nb * L1 + l1) * n;
      for (int64_t e0 = 0; e0 < n; e0 += CH) {
        const int64_t e1 = e0 + CH < n ? e0 + CH : n;
        for (int64_t j = 0; j < nb; ++j) {
          double* orow = ob + j * L1 * n;
          const double* Mrow = M + j * nb;
          for (int64_t e = e0; e < e1; ++e) orow[e] = 0.0;
          for (int64_t k = 0; k < nb; ++k) {
            const double m = Mrow[k];
            const double* irow = ib + k * L1 * n;
            for (int64_t e = e0; e < e1; ++e) orow[e] += m * irow[e];
          }
        }
      }
    }
  }
}

// SoA line accumulation: for every lattice line along `ax`, contract
// local axis `ax` of t with the position-selected block matrix and the
// off-diagonal couplings, accumulating into y.  Element ranges with a
// uniform matrix are contiguous by construction (see header comment).
//
// nruns runs of length rl (stride between line positions = rs elems):
//   ax=0: 1 run,  rl = c1*c2 per position, positions strided rs=c1*c2
//         -> treat as runs over position blocks (contiguous).
//   general: iterate (pre, m) with pre the slower lattice axes; for
//   fixed m the elements {pre, m, post} with post contiguous length pl.
void soa_line(const double* t, double* y, int64_t nb, int64_t n,
              int64_t pre, int64_t nax, int64_t pl,
              const double* Di, const double* Dl, const double* Dh,
              const double* F12, const double* F21, int64_t l0, int64_t l1) {
  // local-axis decomposition: local index = (a0, k, a1) with sizes
  // (l0, nb, l1); element index = (p, m, q) with sizes (pre, nax, pl).
  // Full contiguous passes with the interior matrix + small strided
  // boundary corrections — the coupling-mask runs would be short for
  // the fastest lattice axis (pl = 1), so instead every (j, k) pair
  // streams y and the (shifted) t rows over the WHOLE element range
  // and the line-boundary positions are fixed up afterwards.
  const int64_t rs = pl;            // stride between line positions
  const int64_t lb = nax * pl;      // elements per line bundle
#ifdef _OPENMP
#pragma omp parallel for collapse(2) schedule(static)
#endif
  for (int64_t a0 = 0; a0 < l0; ++a0) {
    for (int64_t a1 = 0; a1 < l1; ++a1) {
      const int64_t lrow = (a0 * nb) * l1 + a1;
      for (int64_t j = 0; j < nb; ++j) {
        double* yrow = y + (lrow + j * l1) * n;
        for (int64_t k = 0; k < nb; ++k) {
          const double* trow = t + (lrow + k * l1) * n;
          const double di = Di[j * nb + k], dl = Dl[j * nb + k],
                       dh = Dh[j * nb + k], fd = F12[j * nb + k],
                       fu = F21[j * nb + k];
          if (nax == 1) {  // degenerate line: D_lo holds it all
            for (int64_t e = 0; e < n; ++e) yrow[e] += dl * trow[e];
            continue;
          }
          // interior diagonal over everything, then boundary fix-ups
          for (int64_t e = 0; e < n; ++e) yrow[e] += di * trow[e];
          const double cl = dl - di, ch = dh - di;
          for (int64_t b0 = 0; b0 < n; b0 += lb) {
            double* yl = yrow + b0;
            const double* tl = trow + b0;
            const int64_t hi = (nax - 1) * rs;
            for (int64_t q = 0; q < rs; ++q) {
              yl[q] += cl * tl[q];
              yl[hi + q] += ch * tl[hi + q];
            }
            // couplings within the bundle (positions 0..nax-2 / 1..)
            for (int64_t e = 0; e < hi; ++e) yl[e] += fd * tl[e + rs];
            for (int64_t e = rs; e < lb; ++e) yl[e] += fu * tl[e - rs];
          }
        }
      }
    }
  }
}

}  // namespace

extern "C" int hpdg_sipg_fact_apply3(
    int64_t c0, int64_t c1, int64_t c2, int32_t nb_in,
    const double* Mm, const double* Dint, const double* Dlo,
    const double* Dhi, const double* F12, const double* F21,
    const double* u, double* y, double* s1, double* s2, double* s3) {
  const int64_t nb = nb_in;
  const int64_t n = c0 * c1 * c2;
  const int64_t nb3 = nb * nb * nb;
  const int64_t bb = nb * nb;
  const int64_t cells[3] = {c0, c1, c2};

  fact_transpose(u, s1, n, nb3);  // s1 = u^T  (nb3, n)
  // accumulator in SoA
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
  for (int64_t i = 0; i < n * nb3; ++i) s3[i] = 0.0;

  for (int ax = 0; ax < 3; ++ax) {
    // transverse Mm contractions over the local axes != ax
    const double* src = s1;
    double* dst = s2;
    double* spare = y;  // reuse output buffer as second scratch
    for (int t = 0; t < 3; ++t) {
      if (t == ax) continue;
      // local decomposition around contracted axis t
      int64_t L0 = 1, L1 = 1;
      for (int k = 0; k < t; ++k) L0 *= nb;
      for (int k = t + 1; k < 3; ++k) L1 *= nb;
      soa_contract(src, dst, Mm, L0, nb, L1, n);
      src = dst;
      dst = (dst == s2) ? spare : s2;
    }
    // line step along cell axis ax, contracting local axis ax
    int64_t l0 = 1, l1 = 1, pre = 1, pl = 1;
    for (int k = 0; k < ax; ++k) { l0 *= nb; pre *= cells[k]; }
    for (int k = ax + 1; k < 3; ++k) { l1 *= nb; pl *= cells[k]; }
    soa_line(src, s3, nb, n, pre, cells[ax], pl,
             Dint + ax * bb, Dlo + ax * bb, Dhi + ax * bb,
             F12 + ax * bb, F21 + ax * bb, l0, l1);
  }
  fact_transpose(s3, y, nb3, n);  // y = result^T back to (n, nb3)
  return 0;
}
