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
