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

// ---------------------------------------------------------------------
// Arbitrary (non-lattice) hex/quad connectivity: face matching + BFS
// parametric frame assignment.  Native twin of the Python reference in
// hpdg_tpu/mesh/geometry.py::from_cell_vertices (which stays the
// readable fallback): cells arrive as vertex ids in the BIT corner
// convention (axis 0 slowest), each cell is assigned a cube-symmetry
// corner permutation so every shared face pairs inside-high with
// outside-low at identity tangential correspondence, and the face
// arrays are emitted directly.  Return codes: 0 ok, 1 face shared by
// >2 cells, 2 twisted (no identity-aligned assignment), 3 disconnected,
// 4 degenerate cell, 5 capacity.
// ---------------------------------------------------------------------

#include <unordered_map>
#include <array>
#include <queue>
#include <algorithm>

namespace {

struct FaceKeyHash {
  size_t operator()(const std::array<int64_t, 4> &k) const {
    uint64_t h = 1469598103934665603ull;  // FNV-1a over the 4 ids
    for (int64_t v : k) {
      for (int b = 0; b < 8; ++b) {
        h ^= (uint64_t)((v >> (8 * b)) & 0xff);
        h *= 1099511628211ull;
      }
    }
    return (size_t)h;
  }
};

// corner indices of face (axis, side) in ascending order (bit
// convention: ascending corner index == ascending tangential bits,
// last tangential axis fastest — matches geometry._frame_faces)
static inline void face_corners(int dim, int axis, int side, int *out) {
  int nc = 1 << dim, j = 0;
  for (int c = 0; c < nc; ++c)
    if (((c >> (dim - 1 - axis)) & 1) == side) out[j++] = c;
}

}  // namespace

extern "C" int hpdg_frame_cells(
    int64_t n, int32_t dim, const int64_t *cells_bit, int64_t *order,
    int32_t *f_inside, int32_t *f_outside, int32_t *f_axis, int64_t cap_f,
    int32_t *b_elem, int32_t *b_axis, int32_t *b_side, int64_t cap_b,
    int64_t *nf_out, int64_t *nbf_out) {
  if (dim != 2 && dim != 3) return 4;
  const int nc = 1 << dim, nfpc = 2 * dim, fsize = nc / 2;

  // face corner index tables for all (axis, side)
  int fc[6][4] = {};
  for (int a = 0; a < dim; ++a)
    for (int s = 0; s < 2; ++s) face_corners(dim, a, s, fc[2 * a + s]);

  auto face_key = [&](const int64_t *corners, int lf) {
    std::array<int64_t, 4> k{{-1, -1, -1, -1}};
    for (int i = 0; i < fsize; ++i) k[i] = corners[fc[lf][i]];
    std::sort(k.begin(), k.begin() + fsize);
    return k;
  };

  // match faces of the INPUT (default-frame) cells by sorted key;
  // vertex SETS are frame-independent, so partners are final
  std::unordered_map<std::array<int64_t, 4>, int64_t, FaceKeyHash> first;
  first.reserve(2 * (size_t)n * nfpc);
  std::vector<int64_t> partner((size_t)n * nfpc, -1);
  for (int64_t e = 0; e < n; ++e)
    for (int lf = 0; lf < nfpc; ++lf) {
      auto k = face_key(cells_bit + e * nc, lf);
      auto it = first.find(k);
      int64_t fid = e * nfpc + lf;
      if (it == first.end()) {
        first.emplace(k, fid);
      } else if (it->second >= 0) {
        partner[fid] = it->second;
        partner[it->second] = fid;
        it->second = -2;  // mark consumed
      } else {
        return 1;  // third cell on the same face
      }
    }

  // BFS frame assignment
  std::vector<int8_t> seen(n, 0);
  std::fill(order, order + n * nc, -1);
  for (int c = 0; c < nc; ++c) order[c] = cells_bit[c];
  seen[0] = 1;
  std::queue<int64_t> q;
  q.push(0);
  int64_t visited = 1;
  std::vector<int> ids_q_buf;

  auto face_of = [&](const int64_t *ord, const std::array<int64_t, 4> &k,
                     int *axis, int *side) {
    for (int a = 0; a < dim; ++a)
      for (int s = 0; s < 2; ++s) {
        std::array<int64_t, 4> kk{{-1, -1, -1, -1}};
        for (int i = 0; i < fsize; ++i) kk[i] = ord[fc[2 * a + s][i]];
        std::sort(kk.begin(), kk.begin() + fsize);
        if (kk == k) { *axis = a; *side = s; return true; }
      }
    return false;
  };

  while (!q.empty()) {
    int64_t e = q.front();
    q.pop();
    for (int lf = 0; lf < nfpc; ++lf) {
      int64_t pf = partner[e * nfpc + lf];
      if (pf < 0) continue;
      int64_t qe = pf / nfpc;
      auto k = face_key(cells_bit + e * nc, lf);
      int a, s;
      if (!face_of(order + e * nc, k, &a, &s)) return 2;
      const int *ids_e = fc[2 * a + s];
      const int *ids_q = fc[2 * a + (1 - s)];
      const int *ids_q_opp = fc[2 * a + s];
      if (seen[qe]) {
        int aq, sq;
        if (!face_of(order + qe * nc, k, &aq, &sq)) return 2;
        if (aq != a || sq != (1 - s)) return 2;
        for (int i = 0; i < fsize; ++i)
          if (order[qe * nc + ids_q[i]] != order[e * nc + ids_e[i]])
            return 2;
        continue;
      }
      // q's frame: shared vertices at the opposite face, their unique
      // off-face edge partners (corners differing in one bit) opposite
      int64_t oq[8];
      std::fill(oq, oq + nc, -1);
      const int64_t *cb = cells_bit + qe * nc;
      for (int i = 0; i < fsize; ++i) {
        int64_t v = order[e * nc + ids_e[i]];
        // v's corner position in q's default frame
        int pos = -1;
        for (int c = 0; c < nc; ++c)
          if (cb[c] == v) { pos = c; break; }
        if (pos < 0) return 2;
        // unique edge partner of v not on the shared face
        int64_t other = -1;
        int found = 0;
        for (int bit = 0; bit < dim; ++bit) {
          int64_t u = cb[pos ^ (1 << bit)];
          bool on_face = false;
          for (int j = 0; j < fsize; ++j)
            if (k[j] == u) { on_face = true; break; }
          if (!on_face) { other = u; ++found; }
        }
        if (found != 1) return 4;
        oq[ids_q[i]] = v;
        oq[ids_q_opp[i]] = other;
      }
      // validate: oq is a permutation of q's vertex list
      std::array<int64_t, 8> sa{}, sb{};
      for (int c = 0; c < nc; ++c) { sa[c] = oq[c]; sb[c] = cb[c]; }
      std::sort(sa.begin(), sa.begin() + nc);
      std::sort(sb.begin(), sb.begin() + nc);
      for (int c = 0; c < nc; ++c) if (sa[c] != sb[c]) return 2;
      for (int c = 0; c < nc; ++c) order[qe * nc + c] = oq[c];
      seen[qe] = 1;
      ++visited;
      q.push(qe);
    }
  }
  if (visited != n) return 3;

  // emit faces/bfaces from the assigned frames
  int64_t nf = 0, nbf = 0;
  std::unordered_map<std::array<int64_t, 4>, int8_t, FaceKeyHash> done;
  done.reserve((size_t)n * nfpc);
  for (int64_t e = 0; e < n; ++e)
    for (int a = 0; a < dim; ++a)
      for (int s = 0; s < 2; ++s) {
        std::array<int64_t, 4> k{{-1, -1, -1, -1}};
        for (int i = 0; i < fsize; ++i)
          k[i] = order[e * nc + fc[2 * a + s][i]];
        std::sort(k.begin(), k.begin() + fsize);
        // find this face's slot in the INPUT-frame matching
        int lf = -1;
        for (int j = 0; j < nfpc; ++j)
          if (face_key(cells_bit + e * nc, j) == k) { lf = j; break; }
        if (lf < 0) return 2;
        int64_t pf = partner[e * nfpc + lf];
        if (pf < 0) {
          if (nbf >= cap_b) return 5;
          b_elem[nbf] = (int32_t)e;
          b_axis[nbf] = a;
          b_side[nbf] = s;
          ++nbf;
          continue;
        }
        if (done.count(k)) continue;
        done.emplace(k, 1);
        if (nf >= cap_f) return 5;
        int64_t qe = pf / nfpc;
        f_inside[nf] = (int32_t)(s == 1 ? e : qe);
        f_outside[nf] = (int32_t)(s == 1 ? qe : e);
        f_axis[nf] = a;
        ++nf;
      }
  *nf_out = nf;
  *nbf_out = nbf;
  return 0;
}
