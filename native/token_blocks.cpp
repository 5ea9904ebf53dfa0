// Token-block dataset indexing — C++ equivalent of the reference's Cython
// extension `fairseq/fairseq/data/token_block_utils_fast.pyx` (built as
// `fairseq.data.token_block_utils_fast` in fairseq/setup.py:60-130).
//
// Two entry points, both over a flat corpus described by per-sentence sizes:
//   token_block_slice_indices  — partition the concatenated token stream into
//     blocks under one of four break modes ("none", "complete", "complete_doc",
//     "eos"); returns [num_blocks, 2] (start, end) token offsets.
//   token_block_dataset_index  — map each (start, end) token slice back to
//     (start_sentence, start_offset, end_sentence) triples with a single
//     monotonic two-pointer sweep (the reference re-seeks per block via a
//     stateful DatasetSearcher; blocks are sorted so one forward pass suffices).
//
// Exposed via a C ABI for ctypes (no pybind11 in this image).

#include <cstdint>

extern "C" {

// break modes
enum { BREAK_NONE = 0, BREAK_COMPLETE = 1, BREAK_COMPLETE_DOC = 2,
       BREAK_EOS = 3 };

// Writes up to max_out (start,end) pairs into out[2*i], out[2*i+1].
// Returns the number of blocks, or -1 on invalid mode.
// A call with out == nullptr only counts (max_out ignored).
int64_t token_block_slice_indices(const int64_t* sizes, int64_t n,
                                  int32_t break_mode, int64_t block_size,
                                  int64_t document_sep_len, int64_t* out,
                                  int64_t max_out) {
    int64_t count = 0;
    auto emit = [&](int64_t s, int64_t e) {
        if (out != nullptr && count < max_out) {
            out[2 * count] = s;
            out[2 * count + 1] = e;
        }
        ++count;
    };

    if (break_mode == BREAK_NONE) {
        int64_t total = 0;
        for (int64_t i = 0; i < n; ++i) total += sizes[i];
        for (int64_t start = 0; start < total; start += block_size) {
            int64_t end = start + block_size;
            emit(start, end < total ? end : total);
        }
    } else if (break_mode == BREAK_COMPLETE) {
        // pack whole sentences up to block_size; oversize sentences get a
        // block of their own (curr == 0 admits anything).
        int64_t tok = 0, curr = 0;
        for (int64_t i = 0; i < n;) {
            if (curr == 0 || curr + sizes[i] <= block_size) {
                curr += sizes[i];
                ++i;
            } else {
                emit(tok, tok + curr);
                tok += curr;
                curr = 0;
            }
        }
        if (curr > 0) emit(tok, tok + curr);
    } else if (break_mode == BREAK_COMPLETE_DOC) {
        // like complete, but a sentence of length document_sep_len marks an
        // end-of-document boundary; sep tokens are skipped, single-token
        // blocks dropped (reference keeps only curr > 1).
        int64_t tok = 0, curr = 0;
        for (int64_t i = 0; i < n;) {
            bool is_sep = sizes[i] == document_sep_len;
            if (!is_sep && (curr == 0 || curr + sizes[i] <= block_size)) {
                curr += sizes[i];
                ++i;
            } else {
                if (curr > 1) emit(tok, tok + curr);
                tok += curr;
                curr = 0;
                if (is_sep) {
                    tok += sizes[i];
                    ++i;
                }
            }
        }
        if (curr > 1) emit(tok, tok + curr);
    } else if (break_mode == BREAK_EOS) {
        int64_t tok = 0;
        for (int64_t i = 0; i < n; ++i) {
            emit(tok, tok + sizes[i]);
            tok += sizes[i];
        }
    } else {
        return -1;
    }
    return count;
}

// blocks: [num_blocks, 2] (start, end) token offsets, sorted by start.
// out: [num_blocks, 3] (start_sentence, start_offset, end_sentence).
// Single forward sweep — O(num_blocks + n).
void token_block_dataset_index(const int64_t* sizes, int64_t n,
                               const int64_t* blocks, int64_t num_blocks,
                               int64_t* out) {
    int64_t sent = 0;        // current sentence index
    int64_t sent_start = 0;  // token offset where sentence `sent` begins
    auto advance_to = [&](int64_t tok) {
        // move `sent` forward until sizes cumsum covers token offset `tok`
        while (sent < n - 1 && sent_start + sizes[sent] <= tok) {
            sent_start += sizes[sent];
            ++sent;
        }
    };
    for (int64_t b = 0; b < num_blocks; ++b) {
        int64_t s = blocks[2 * b];
        int64_t e = blocks[2 * b + 1];
        advance_to(s);
        int64_t start_sent = sent;
        int64_t start_off = s - sent_start;
        int64_t end_sent = start_sent;
        if (e > s) {
            advance_to(e - 1);
            end_sent = sent;
        }
        out[3 * b] = start_sent;
        out[3 * b + 1] = start_off;
        out[3 * b + 2] = end_sent;
    }
}

}  // extern "C"
