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
// Build: g++ -O3 -march=native -std=c++17 -shared -fPIC -o libmeshkit.so meshkit.cc
//
// C ABI (ctypes): all arrays caller-allocated; capacities passed in
// (cap_f, cap_b).  Each interior face consumes at least one unique
// (element, axis, half) slot, and so does each boundary face, so
// 2 * dim * n bounds both counts.  Returns nonzero on overflow (the
// Python wrapper then falls back to the numpy matcher).

#include <cmath>
#include <cstdint>
#include <unordered_map>
#include <vector>

namespace {

struct KeyHash {
  size_t operator()(const std::vector<int64_t> &k) const {
    size_t h = 1469598103934665603ull;
    for (auto v : k) {
      h ^= (size_t)v;
      h *= 1099511628211ull;
    }
    return h;
  }
};

}  // namespace

extern "C" int hpdg_build_faces(
    int64_t n, int32_t dim, const double *lower, const double *extent,
    double tol,
    int32_t *f_inside, int32_t *f_outside, int32_t *f_axis, int32_t *f_nc,
    int32_t *b_elem, int32_t *b_axis, int32_t *b_side,
    int64_t cap_f, int64_t cap_b,
    int64_t *nf_out, int64_t *nbf_out) {
  const double scale = 1.0 / tol;
  int64_t nf = 0, nbf = 0;

  using Key = std::vector<int64_t>;
  for (int32_t axis = 0; axis < dim; ++axis) {
    const int nt = dim - 1;
    // key: (plane, tang lower..., tang ext...); value: packed (elem, half)
    std::unordered_map<Key, int64_t, KeyHash> table;
    table.reserve(2 * n);
    std::vector<Key> keys(2 * n);
    auto make_key = [&](int64_t e, int half) {
      Key k;
      k.reserve(1 + 2 * nt);
      double plane = lower[e * dim + axis] + (half == 0 ? extent[e * dim + axis] : 0.0);
      k.push_back((int64_t)llround(plane * scale));
      for (int a = 0; a < dim; ++a) {
        if (a == axis) continue;
        k.push_back((int64_t)llround(lower[e * dim + a] * scale));
        k.push_back((int64_t)llround(extent[e * dim + a] * scale));
      }
      return k;
    };
    // pass 1: exact conforming matches.  half 0 = elem's HIGH face
    // (element on the low side), half 1 = elem's LOW face.
    std::vector<int8_t> matched(2 * n, 0);
    for (int64_t e = 0; e < n; ++e) {
      for (int half = 0; half < 2; ++half) {
        Key k = make_key(e, half);
        keys[2 * e + half] = k;
        k.push_back(half);  // separate the halves in the table
        table.emplace(std::move(k), e);
      }
    }
    for (int64_t e = 0; e < n; ++e) {
      // my high face (half 0) against neighbor's low face (half 1)
      Key k = keys[2 * e + 0];
      k.push_back(1);
      auto it = table.find(k);
      if (it != table.end()) {
        if (nf >= cap_f) return 1;
        f_inside[nf] = (int32_t)e;
        f_outside[nf] = (int32_t)it->second;
        f_axis[nf] = axis;
        f_nc[nf] = 0;
        ++nf;
        matched[2 * e + 0] = 1;
        matched[2 * it->second + 1] = 1;
      }
    }
    // pass 2: 2:1 hanging-node matches (small face inside a big face)
    std::vector<int8_t> used_big(2 * n, 0);
    for (int64_t e = 0; e < n; ++e) {
      for (int half = 0; half < 2; ++half) {
        if (matched[2 * e + half]) continue;
        const Key &k = keys[2 * e + half];
        bool found = false;
        for (int sub = 0; sub < (1 << nt) && !found; ++sub) {
          Key big;
          big.reserve(2 + 2 * nt);
          big.push_back(k[0]);
          for (int t = 0; t < nt; ++t) {
            int bit = (sub >> (nt - 1 - t)) & 1;
            int64_t tl = k[1 + 2 * t], te = k[2 + 2 * t];
            big.push_back(tl - bit * te);
            big.push_back(2 * te);
          }
          big.push_back(1 - half);
          auto it = table.find(big);
          if (it != table.end()) {
            int64_t eb = it->second;
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
