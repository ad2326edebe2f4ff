// Native generation post-processing: validity proxy, canonicalization,
// and exact unique/novel counting over token matrices.
//
// After the fused TPU kernels emit a [N, L] token matrix, the CLI-side
// quality metrics (validity %, uniqueness, novelty — data/prepare.py
// selfies_validity, data/metrics.py) are the remaining wall-clock at the
// 1M-molecule bulk-generation scale (BASELINE config 5): generation itself
// takes ~3s while the Python per-row loops take an order of magnitude
// longer. These loops have no reference counterpart (the reference's
// generation path ends at raw token arrays,
// /root/reference/models/decoder_sampling.py:126-128) and no device
// component — they are host-side runtime, so they live in C++ alongside the
// data packer. Semantics mirror the numpy/Python implementations exactly;
// parity is pinned by tests/test_postproc.py against the pure-Python paths.
//
// Exposed via a C ABI and loaded with ctypes (no pybind11 in the image).

#include <cstdint>
#include <cstring>
#include <unordered_set>
#include <vector>

namespace {

// 64-bit FNV-1a over a row's bytes. Used only to bucket candidates; row
// identity is always confirmed with memcmp (exact counting, no collision
// risk).
inline uint64_t fnv1a(const int32_t* row, int64_t len) {
    const unsigned char* p = reinterpret_cast<const unsigned char*>(row);
    const size_t n = static_cast<size_t>(len) * sizeof(int32_t);
    uint64_t h = 1469598103934665603ULL;
    for (size_t i = 0; i < n; ++i) {
        h ^= p[i];
        h *= 1099511628211ULL;
    }
    return h;
}

struct RowRef {
    const int32_t* ptr;
    int64_t len;
};

struct RowHash {
    size_t operator()(const RowRef& r) const {
        return static_cast<size_t>(fnv1a(r.ptr, r.len));
    }
};

struct RowEq {
    bool operator()(const RowRef& a, const RowRef& b) const {
        return a.len == b.len &&
               std::memcmp(a.ptr, b.ptr,
                           static_cast<size_t>(a.len) * sizeof(int32_t)) == 0;
    }
};

using RowSet = std::unordered_set<RowRef, RowHash, RowEq>;

}  // namespace

extern "C" {

// Structural validity proxy (data/prepare.py:selfies_validity, the
// no-rdkit branch): a row is valid iff it contains `eos` and at least one
// token > eos appears strictly before the first `eos`. Returns the number
// of valid rows.
int64_t validity_proxy(const int32_t* tokens, int64_t n, int64_t L,
                       int32_t eos) {
    int64_t ok = 0;
    for (int64_t i = 0; i < n; ++i) {
        const int32_t* row = tokens + i * L;
        bool nonempty = false;
        for (int64_t t = 0; t < L; ++t) {
            if (row[t] == eos) {
                ok += nonempty;
                break;
            }
            nonempty |= row[t] > eos;
        }
    }
    return ok;
}

// Canonical molecule identity (data/metrics.py:canonical_tokens): each
// row's tokens >= num_specials strictly before its first `eos`,
// left-compacted in order; remaining positions are -1 (never a token id).
void canonicalize_rows(const int32_t* tokens, int64_t n, int64_t L,
                       int32_t eos, int32_t num_specials, int32_t* out) {
    for (int64_t i = 0; i < n; ++i) {
        const int32_t* row = tokens + i * L;
        int32_t* dst = out + i * L;
        int64_t k = 0;
        for (int64_t t = 0; t < L; ++t) {
            const int32_t v = row[t];
            if (v == eos) break;
            if (v >= num_specials) dst[k++] = v;
        }
        for (; k < L; ++k) dst[k] = -1;
    }
}

// Number of distinct rows in a canonical [n, L] matrix (exact: hashed
// buckets, memcmp-confirmed).
int64_t count_unique(const int32_t* canon, int64_t n, int64_t L) {
    RowSet seen;
    seen.reserve(static_cast<size_t>(n) * 2);
    for (int64_t i = 0; i < n; ++i)
        seen.insert(RowRef{canon + i * L, L});
    return static_cast<int64_t>(seen.size());
}

// Distinct generated rows and how many of those are absent from the
// reference matrix. Both inputs must be canonical and share width L
// (the Python wrapper pads to a common width, matching
// data/metrics.py:novelty).
void count_novel(const int32_t* gen, int64_t n_gen,
                 const int32_t* ref, int64_t n_ref, int64_t L,
                 int64_t* distinct_out, int64_t* novel_out) {
    RowSet ref_set;
    ref_set.reserve(static_cast<size_t>(n_ref) * 2);
    for (int64_t i = 0; i < n_ref; ++i)
        ref_set.insert(RowRef{ref + i * L, L});
    RowSet gen_set;
    gen_set.reserve(static_cast<size_t>(n_gen) * 2);
    for (int64_t i = 0; i < n_gen; ++i)
        gen_set.insert(RowRef{gen + i * L, L});
    int64_t novel = 0;
    for (const RowRef& r : gen_set)
        novel += ref_set.find(r) == ref_set.end();
    *distinct_out = static_cast<int64_t>(gen_set.size());
    *novel_out = novel;
}

}  // extern "C"
