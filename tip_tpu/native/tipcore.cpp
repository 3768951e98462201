// tipcore — native host-side runtime for tip_tpu's data packing.
//
// The TPU compute path is XLA/Pallas; this library covers the host hot
// loops around it: edge sorting, chunk-aligned padding, membership-bitmap
// construction, and degree counting.  These are the packing equivalents of
// what the reference does in Python/scipy at load time (reference:
// data/utils.py, prepare.py) — here they run in C++ so repacking the 9.3M-
// edge Decagon multigraph is sub-second instead of ~8 s.
//
// Build: g++ -O3 -march=native -shared -fPIC tipcore.cpp -o libtipcore.so
// ABI: plain C functions over caller-allocated buffers (ctypes-friendly).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Fill `order` with the permutation sorting edges by (et, dst, src).
void tip_sort_edges(const int32_t* et, const int32_t* dst, const int32_t* src,
                    int64_t n_edges, int64_t n_nodes, int64_t* order) {
  std::vector<std::pair<int64_t, int64_t>> keyed(n_edges);
  for (int64_t i = 0; i < n_edges; ++i) {
    int64_t key = ((int64_t)et[i] * n_nodes + dst[i]) * n_nodes + src[i];
    keyed[i] = {key, i};
  }
  std::sort(keyed.begin(), keyed.end());
  for (int64_t i = 0; i < n_edges; ++i) order[i] = keyed[i].second;
}

// OR each key's bit into a caller-zeroed uint32 bitmap.
void tip_build_bitmap(const int64_t* keys, int64_t n_keys, uint32_t* bitmap) {
  for (int64_t i = 0; i < n_keys; ++i) {
    int64_t k = keys[i];
    bitmap[k >> 5] |= (uint32_t)1 << (k & 31);
  }
}

// Chunk-aligned padding of a type-binned edge buffer (see
// data/packing.py:pad_typed_edges for the layout contract).
// starts/ends: [n_et] input ranges; out_starts: [n_et] output offsets.
// psrc must be pre-zeroed, pdst pre-filled with n_nodes, valid pre-zeroed.
void tip_pad_typed(const int32_t* src, const int32_t* dst,
                   const int64_t* starts, const int64_t* ends,
                   const int64_t* out_starts, int64_t n_et,
                   int32_t* psrc, int32_t* pdst, uint8_t* valid) {
  for (int64_t t = 0; t < n_et; ++t) {
    int64_t s = starts[t], n = ends[t] - starts[t], o = out_starts[t];
    std::memcpy(psrc + o, src + s, n * sizeof(int32_t));
    std::memcpy(pdst + o, dst + s, n * sizeof(int32_t));
    std::memset(valid + o, 1, n);
  }
}

// In-degree count over int32 destinations into a caller-zeroed int64 buffer.
void tip_bincount(const int32_t* x, int64_t n, int64_t* out) {
  for (int64_t i = 0; i < n; ++i) out[x[i]] += 1;
}

}  // extern "C"
