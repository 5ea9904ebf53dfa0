// Batched Levenshtein edit distance — the TPU-build equivalent of the
// reference's fairseq.libnat extension (fairseq/fairseq/clib/libnat/
// edit_dist.cpp: edit-distance + alignment ops used by NAT training and by
// WER scoring). Host-side C++, bound via ctypes (no pybind11 in this image).
//
// C ABI:
//   edit_distances(a_flat, a_lens, b_flat, b_lens, n, out)
//     a_flat/b_flat: concatenated int64 token ids; a_lens/b_lens: [n] lengths;
//     out: [n] int64 distances.

#include <algorithm>
#include <cstdint>
#include <vector>

extern "C" {

void edit_distances(const int64_t* a_flat, const int64_t* a_lens,
                    const int64_t* b_flat, const int64_t* b_lens,
                    int64_t n, int64_t* out) {
  int64_t a_off = 0, b_off = 0;
  std::vector<int64_t> dp;
  for (int64_t s = 0; s < n; ++s) {
    const int64_t la = a_lens[s], lb = b_lens[s];
    const int64_t* a = a_flat + a_off;
    const int64_t* b = b_flat + b_off;
    dp.resize(lb + 1);
    for (int64_t j = 0; j <= lb; ++j) dp[j] = j;
    for (int64_t i = 1; i <= la; ++i) {
      int64_t prev = dp[0];
      dp[0] = i;
      for (int64_t j = 1; j <= lb; ++j) {
        const int64_t cur = dp[j];
        const int64_t sub = prev + (a[i - 1] != b[j - 1] ? 1 : 0);
        dp[j] = std::min(std::min(dp[j] + 1, dp[j - 1] + 1), sub);
        prev = cur;
      }
    }
    out[s] = dp[lb];
    a_off += la;
    b_off += lb;
  }
}

}  // extern "C"
