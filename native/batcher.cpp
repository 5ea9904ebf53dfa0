// Token-bucketing batch construction — C++ equivalent of the reference's Cython
// hot path `fairseq/fairseq/data/data_utils_fast.pyx:batch_by_size_fn` (see
// fairseq/setup.py:60-130 native extension list).
//
// Given indices (already length-sorted or arbitrary) and per-index token counts,
// greedily packs batches so that:
//   max(sentence_tokens) * batch_size <= max_tokens   (padding-aware cost model)
//   batch_size <= max_sentences (if > 0)
//   batch_size is a multiple of bsz_mult when possible (GPU/TPU-friendly shapes)
//
// Exposed via a C ABI for ctypes (no pybind11 in this image).

#include <cstdint>
#include <vector>

extern "C" {

// Returns the number of batches. batch_offsets[i] = start position of batch i in
// `indices` (caller slices indices[offsets[i]:offsets[i+1]]).
// batch_offsets must have room for num_indices + 1 entries.
int64_t batch_by_size(const int64_t* indices, const int64_t* num_tokens,
                      int64_t num_indices, int64_t max_tokens,
                      int64_t max_sentences, int64_t bsz_mult,
                      int64_t* batch_offsets) {
    int64_t n_batches = 0;
    int64_t batch_start = 0;
    int64_t batch_max_tokens = 0;

    auto batch_full = [&](int64_t count, int64_t max_tok) {
        if (count == 0) return false;
        if (max_sentences > 0 && count == max_sentences) return true;
        if (max_tokens > 0 && count * max_tok > max_tokens) return true;
        return false;
    };

    batch_offsets[0] = 0;
    for (int64_t i = 0; i < num_indices; ++i) {
        int64_t tok = num_tokens[indices[i]];
        int64_t new_max = tok > batch_max_tokens ? tok : batch_max_tokens;
        int64_t count = i - batch_start + 1;
        if (batch_full(count, new_max)) {
            // close the batch BEFORE i, rounded down to a multiple of bsz_mult
            int64_t size = i - batch_start;
            int64_t mod = size % bsz_mult;
            if (size > bsz_mult && mod != 0) size -= mod;
            if (size == 0) size = i - batch_start;  // single overlong sentence
            if (size == 0) size = 1;                // degenerate: emit alone
            batch_start += size;
            batch_offsets[++n_batches] = batch_start;
            batch_max_tokens = 0;
            for (int64_t j = batch_start; j <= i; ++j) {
                int64_t t = num_tokens[indices[j]];
                if (t > batch_max_tokens) batch_max_tokens = t;
            }
        } else {
            batch_max_tokens = new_max;
        }
    }
    if (batch_start < num_indices) {
        batch_offsets[++n_batches] = num_indices;
    }
    return n_batches;
}

}  // extern "C"
