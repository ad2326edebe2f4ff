// Native data packer: ragged token lists -> dense padded int32 matrix.
//
// This is the host-side hot loop of the data layer (the reference pads each
// sequence in Python per __getitem__, /root/reference/mlx_data/dataloader.py:70-84;
// we pack the whole corpus once, in C++). Exposed via a tiny C ABI and loaded
// with ctypes — no pybind11 required.
//
// Layout contract (see mlx_vae_tpu/data/packer.py):
//   tokens:  int32[total]        — all sequences concatenated
//   offsets: int64[n + 1]        — sequence i is tokens[offsets[i]:offsets[i+1]]
//   out:     int32[n * max_len]  — pre-allocated, written in place

#include <cstdint>
#include <cstring>
#include <algorithm>

extern "C" {

void pack_sequences(const int32_t* tokens,
                    const int64_t* offsets,
                    int64_t n,
                    int64_t max_len,
                    int32_t pad_token,
                    int32_t* out) {
    for (int64_t i = 0; i < n; ++i) {
        const int64_t start = offsets[i];
        const int64_t len = std::min<int64_t>(offsets[i + 1] - start, max_len);
        int32_t* row = out + i * max_len;
        std::memcpy(row, tokens + start, static_cast<size_t>(len) * sizeof(int32_t));
        std::fill(row + len, row + max_len, pad_token);
    }
}

// Gather rows of a padded matrix into a contiguous batch (shuffle-gather).
void gather_rows(const int32_t* data,
                 const int64_t* indices,
                 int64_t batch,
                 int64_t row_len,
                 int32_t* out) {
    for (int64_t i = 0; i < batch; ++i) {
        std::memcpy(out + i * row_len,
                    data + indices[i] * row_len,
                    static_cast<size_t>(row_len) * sizeof(int32_t));
    }
}

}  // extern "C"
