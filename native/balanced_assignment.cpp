// Balanced token→expert assignment via the auction algorithm — C++ equivalent
// of the reference's fairseq.libbase extension
// (`fairseq/fairseq/clib/libbase/balanced_assignment.cpp`, used by BASE layers
// `fairseq/fairseq/modules/base_layer.py:14`).
//
// Capacity auction (Bertsekas): every expert holds up to cap = tokens/experts
// tokens; its price is the lowest standing bid among its holders. An unassigned
// token bids best-value-minus-second-value + eps above the expert's price; the
// lowest bidder is evicted when the expert is over capacity. Epsilon scaling
// drives the result toward the optimum of the expanded assignment problem.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <queue>
#include <vector>

extern "C" {

void balanced_assignment(const float* scores, int64_t num_tokens,
                         int64_t num_experts, int64_t* out_expert) {
    const int64_t cap = num_tokens / num_experts;
    std::vector<int64_t> assigned(num_tokens, -1);
    std::vector<std::vector<std::pair<int64_t, double>>> holders(num_experts);
    std::vector<double> price(num_experts, 0.0);

    double max_abs = 1e-6;
    for (int64_t i = 0; i < num_tokens * num_experts; ++i) {
        max_abs = std::max(max_abs, (double)std::fabs(scores[i]));
    }
    double eps = max_abs / 2.0;
    const double eps_min = max_abs / (2.0 * (double)num_tokens *
                                      (double)num_experts + 2.0);

    while (true) {
        std::fill(assigned.begin(), assigned.end(), -1);
        for (auto& h : holders) h.clear();
        std::fill(price.begin(), price.end(), 0.0);
        std::queue<int64_t> open;
        for (int64_t t = 0; t < num_tokens; ++t) open.push(t);

        int64_t guard = 0;
        const int64_t guard_max = num_tokens * num_experts * 256;
        while (!open.empty() && guard++ < guard_max) {
            int64_t tok = open.front();
            open.pop();
            double best = -std::numeric_limits<double>::infinity();
            double second = best;
            int64_t best_e = 0;
            for (int64_t e = 0; e < num_experts; ++e) {
                double v = (double)scores[tok * num_experts + e] - price[e];
                if (v > best) {
                    second = best;
                    best = v;
                    best_e = e;
                } else if (v > second) {
                    second = v;
                }
            }
            if (num_experts == 1) second = best;
            double bid = price[best_e] + (best - second) + eps;
            auto& h = holders[best_e];
            h.emplace_back(tok, bid);
            assigned[tok] = best_e;
            if ((int64_t)h.size() > cap) {
                size_t worst = 0;
                for (size_t i = 1; i < h.size(); ++i) {
                    if (h[i].second < h[worst].second) worst = i;
                }
                int64_t evicted = h[worst].first;
                h.erase(h.begin() + worst);
                assigned[evicted] = -1;
                open.push(evicted);
            }
            if ((int64_t)h.size() == cap) {
                double min_bid = std::numeric_limits<double>::infinity();
                for (auto& p : h) min_bid = std::min(min_bid, p.second);
                price[best_e] = min_bid;
            }
        }
        // stragglers from the guard: place into any non-full expert
        for (int64_t t = 0; t < num_tokens; ++t) {
            if (assigned[t] < 0) {
                for (int64_t e = 0; e < num_experts; ++e) {
                    if ((int64_t)holders[e].size() < cap) {
                        holders[e].emplace_back(t, 0.0);
                        assigned[t] = e;
                        break;
                    }
                }
            }
        }
        if (eps < eps_min) break;
        eps /= 4.0;
    }
    std::memcpy(out_expert, assigned.data(), sizeof(int64_t) * num_tokens);
}

}  // extern "C"
