// Fast corpus-BLEU n-gram counting — C++ equivalent of the reference's
// fairseq.libbleu extension (`fairseq/fairseq/clib/libbleu/libbleu.cpp`,
// listed in fairseq/setup.py:60-130). Used for train-time BLEU scoring where
// sacrebleu's Python tokenization would dominate.
//
// C ABI for ctypes. Accumulates modified n-gram precision counts (n = 1..4)
// plus reference/hypothesis lengths across sentence pairs.

#include <cstdint>
#include <unordered_map>
#include <vector>

namespace {

struct NGramKey {
    uint64_t h;
    bool operator==(const NGramKey& o) const { return h == o.h; }
};

struct NGramHash {
    size_t operator()(const NGramKey& k) const { return (size_t)k.h; }
};

uint64_t hash_ngram(const int32_t* toks, int64_t start, int n) {
    uint64_t h = 14695981039346656037ULL;
    for (int i = 0; i < n; ++i) {
        h ^= (uint64_t)(toks[start + i] + 1);
        h *= 1099511628211ULL;
        h ^= (uint64_t)n;  // disambiguate orders
        h *= 1099511628211ULL;
    }
    return h;
}

}  // namespace

extern "C" {

// counts layout: [match1, total1, match2, total2, match3, total3, match4,
// total4, ref_len, hyp_len] — accumulated in place.
void bleu_add_sentence(const int32_t* ref, int64_t ref_len, const int32_t* hyp,
                       int64_t hyp_len, int64_t* counts) {
    for (int n = 1; n <= 4; ++n) {
        std::unordered_map<NGramKey, int64_t, NGramHash> ref_counts;
        for (int64_t i = 0; i + n <= ref_len; ++i) {
            ref_counts[{hash_ngram(ref, i, n)}]++;
        }
        int64_t match = 0;
        std::unordered_map<NGramKey, int64_t, NGramHash> used;
        for (int64_t i = 0; i + n <= hyp_len; ++i) {
            NGramKey k{hash_ngram(hyp, i, n)};
            auto it = ref_counts.find(k);
            if (it != ref_counts.end() && used[k] < it->second) {
                used[k]++;
                match++;
            }
        }
        counts[2 * (n - 1)] += match;
        counts[2 * (n - 1) + 1] += hyp_len - n + 1 > 0 ? hyp_len - n + 1 : 0;
    }
    counts[8] += ref_len;
    counts[9] += hyp_len;
}

}  // extern "C"
