// Native host-side kernels for the map database hot paths.
//
// The reference's runtime layer is C++ (SURVEY.md §2: data/graph bookkeeping
// under mutexes).  Our device math is JAX/XLA, but the host-side set/counting
// operations (covisibility recount on every keyframe insertion, inverted-
// index accumulation for BoW queries, packed-descriptor medians) are hot
// python loops — reimplemented here and exposed through a C ABI for ctypes.
//
// Build: g++ -O3 -shared -fPIC -o libmapcore.so map_core.cpp
#include <algorithm>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

extern "C" {

// Count shared landmarks between a query keyframe's landmark set and every
// other keyframe, given the flat observation table of the map.
//
//  lm_ids:      (n_query) landmark ids observed by the query KF
//  obs_lm/obs_kf: (n_obs) flattened landmark->keyframe observation pairs
//  out_kf/out_count: caller-allocated (max_out); returns #entries written.
int32_t covis_count(const int64_t* lm_ids, int64_t n_query,
                    const int64_t* obs_lm, const int64_t* obs_kf,
                    int64_t n_obs, int64_t exclude_kf,
                    int64_t* out_kf, int32_t* out_count, int64_t max_out) {
  // index observations by landmark
  std::unordered_map<int64_t, std::vector<int64_t>> by_lm;
  by_lm.reserve(n_obs * 2);
  for (int64_t i = 0; i < n_obs; ++i) by_lm[obs_lm[i]].push_back(obs_kf[i]);

  std::unordered_map<int64_t, int32_t> counts;
  counts.reserve(256);
  for (int64_t i = 0; i < n_query; ++i) {
    auto it = by_lm.find(lm_ids[i]);
    if (it == by_lm.end()) continue;
    for (int64_t kf : it->second)
      if (kf != exclude_kf) ++counts[kf];
  }
  int64_t n = 0;
  for (auto& kv : counts) {
    if (n >= max_out) break;
    out_kf[n] = kv.first;
    out_count[n] = kv.second;
    ++n;
  }
  return static_cast<int32_t>(n);
}

// Shared-word counting for BoW queries: for each unique word of the query,
// accumulate +1 for every keyframe in that word's inverted list.
//  inv_offsets: (n_words+1) CSR offsets into inv_kfs
//  query_words: (n_query) word ids (may repeat; deduplicated internally)
int32_t bow_shared_words(const int32_t* query_words, int64_t n_query,
                         const int64_t* inv_offsets, const int64_t* inv_kfs,
                         int64_t n_words,
                         int64_t* out_kf, int32_t* out_count, int64_t max_out) {
  std::vector<uint8_t> seen(n_words, 0);
  std::unordered_map<int64_t, int32_t> counts;
  counts.reserve(512);
  for (int64_t i = 0; i < n_query; ++i) {
    int32_t w = query_words[i];
    if (w < 0 || w >= n_words || seen[w]) continue;
    seen[w] = 1;
    for (int64_t j = inv_offsets[w]; j < inv_offsets[w + 1]; ++j)
      ++counts[inv_kfs[j]];
  }
  int64_t n = 0;
  for (auto& kv : counts) {
    if (n >= max_out) break;
    out_kf[n] = kv.first;
    out_count[n] = kv.second;
    ++n;
  }
  return static_cast<int32_t>(n);
}

// Representative-descriptor selection: index of the descriptor with minimum
// median Hamming distance to the others.  descs: (n, 8) packed u32.
int32_t min_median_hamming(const uint32_t* descs, int64_t n) {
  if (n <= 1) return 0;
  std::vector<std::vector<int32_t>> d(n, std::vector<int32_t>(n, 0));
  for (int64_t i = 0; i < n; ++i)
    for (int64_t j = i + 1; j < n; ++j) {
      int32_t h = 0;
      for (int k = 0; k < 8; ++k)
        h += __builtin_popcount(descs[i * 8 + k] ^ descs[j * 8 + k]);
      d[i][j] = h;
      d[j][i] = h;
    }
  int32_t best = 0, best_med = 1 << 30;
  for (int64_t i = 0; i < n; ++i) {
    std::vector<int32_t> row = d[i];
    std::nth_element(row.begin(), row.begin() + n / 2, row.end());
    int32_t med = row[n / 2];
    if (med < best_med) { best_med = med; best = static_cast<int32_t>(i); }
  }
  return best;
}

}  // extern "C"
