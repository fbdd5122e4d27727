// Native host kernels for famsa_tpu.
//
// The TPU (Pallas/XLA) path handles large batched work; these C++ kernels
// cover the host-side hot loops where per-call device dispatch would
// dominate: small/medium profile-alignment DP (incl. the guided band used
// by refinement), the SLINK recurrence, and the CLARANS delta loops.
// Semantics are line-for-line equivalent to the validated NumPy reference
// implementations in famsa_tpu/core/dp.py, famsa_tpu/tree/slink.py and
// famsa_tpu/tree/clarans.py (which mirror the reference FAMSA
// profile_seq.cpp / SingleLinkage.cpp / Clustering.cpp).
//
// Build: g++ -O3 -std=c++17 -shared -fPIC -o libfamsa_native.so famsa_native.cpp

#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <atomic>
#include <thread>
#include <vector>
#include <algorithm>
#include <cmath>

namespace {

constexpr int64_t NEG_INF = -(int64_t(1) << 62);
constexpr int NO_SYMBOLS = 32;
constexpr int NO_AMINOACIDS = 24;
constexpr int NO_AA_GAPS = 30;
constexpr int GAP_OPEN = 25;
constexpr int GAP_EXT = 26;
constexpr int GAP_TERM_EXT = 27;
constexpr int GAP_TERM_OPEN = 28;

enum { DIR_D = 0, DIR_H = 1, DIR_V = 2 };

struct GapCosts { int64_t go, ge, gto, gte; };

struct RowElem { int64_t D, H, V; };

inline void set_packed(uint8_t* cell, int d, int h, int v) {
    *cell = uint8_t(d | (h << 2) | (v << 4));
}

// DP_SolveGapsProblemWhenStarting (profile.cpp:1223-1278)
inline void solve_starting(const int64_t* counters, int64_t j, int64_t w,
                           int64_t card, int64_t& so, int64_t& se,
                           int64_t& sto, int64_t& ste) {
    const int64_t* col = counters + j * NO_SYMBOLS;
    if (j >= w) {
        int64_t cnt = col[GAP_TERM_OPEN] + col[GAP_TERM_EXT];
        so = 0; se = 0; ste = cnt; sto = card - cnt;
    } else {
        const int64_t* nxt = counters + (j + 1) * NO_SYMBOLS;
        sto = nxt[GAP_TERM_OPEN];
        ste = col[GAP_TERM_OPEN] + col[GAP_TERM_EXT];
        se = col[GAP_OPEN] + col[GAP_EXT];
        so = card - se - sto - ste;
    }
}

// DP_SolveGapsProblemWhenContinuing (profile.cpp:1281-1315)
inline void solve_continuing(const int64_t* counters, int64_t j, int64_t w,
                             int64_t card, int64_t& ce, int64_t& cte) {
    if (j == w) {
        cte = card; ce = 0;
    } else {
        const int64_t* col = counters + j * NO_SYMBOLS;
        const int64_t* nxt = counters + (j + 1) * NO_SYMBOLS;
        cte = nxt[GAP_TERM_OPEN] + col[GAP_TERM_OPEN] + col[GAP_TERM_EXT];
        ce = card - cte;
    }
}

} // namespace

extern "C" {

// ---------------------------------------------------------------------
// Sequence-sequence DP (reference profile_seq.cpp:24-162)
// seq arrays: int8 symbols, 0-based, length w (guardless)
void dp_seq_seq(const int8_t* seq1, const int8_t* seq2,
                int64_t w1, int64_t w2,
                const int64_t* sm /* 24x24 */,
                int64_t go, int64_t ge, int64_t gto, int64_t gte,
                uint8_t* dirs /* (w1+1)*(w2+1) packed */,
                int64_t* last /* 3 */) {
    const int64_t stride = w2 + 1;
    std::vector<RowElem> prev(w2 + 1), curr(w2 + 1);

    std::memset(dirs, 0, size_t(w1 + 1) * stride);

    prev[0] = {0, NEG_INF, NEG_INF};
    for (int64_t j = 1; j <= w2; ++j) prev[j] = {NEG_INF, NEG_INF, NEG_INF};
    if (w2 >= 1) {
        prev[1].H = gto;
        set_packed(dirs + 1, DIR_H, DIR_H, DIR_H);
    }
    for (int64_t j = 2; j <= w2; ++j) {
        prev[j].H = std::max(prev[j - 1].H, prev[j - 1].D) + gte;
        set_packed(dirs + j, DIR_H, DIR_H, DIR_H);
    }
    prev[w2].H = NEG_INF;

    for (int64_t i = 1; i <= w1; ++i) {
        uint8_t* drow = dirs + i * stride;
        curr[0].D = NEG_INF;
        curr[0].H = NEG_INF;
        set_packed(drow, DIR_V, DIR_V, DIR_V);
        if (i < w1)
            curr[0].V = std::max(prev[0].V, prev[0].D) + (i == 1 ? gto : gte);
        else
            curr[0].V = NEG_INF;

        const int64_t* srow = sm + int64_t(seq1[i - 1]) * NO_AMINOACIDS;
        const int64_t h_open = (i < w1) ? go : gto;
        const int64_t h_ext = (i < w1) ? ge : gte;

        for (int64_t j = 1; j <= w2; ++j) {
            int d_D, d_H, d_V;
            // D channel (tie: t_H >= t_V -> H)
            int64_t tD = prev[j - 1].D, tH = prev[j - 1].H, tV = prev[j - 1].V;
            int64_t sc = srow[int64_t(seq2[j - 1])];
            if (tD > tH && tD > tV) { curr[j].D = tD + sc; d_D = DIR_D; }
            else if (tH >= tV)      { curr[j].D = tH + sc; d_D = DIR_H; }
            else                    { curr[j].D = tV + sc; d_D = DIR_V; }

            // H channel (2-dir)
            tD = curr[j - 1].D + h_open;
            tH = curr[j - 1].H + h_ext;
            if (tD > tH) { curr[j].H = tD; d_H = DIR_D; }
            else         { curr[j].H = tH; d_H = DIR_H; }

            // V channel (2-dir)
            int64_t v_open = (j < w2) ? go : gto;
            int64_t v_ext = (j < w2) ? ge : gte;
            tD = prev[j].D + v_open;
            tV = prev[j].V + v_ext;
            if (tD > tV) { curr[j].V = tD; d_V = DIR_D; }
            else         { curr[j].V = tV; d_V = DIR_V; }

            set_packed(drow + j, d_D, d_H, d_V);
        }
        std::swap(prev, curr);
    }
    last[0] = prev[w2].D; last[1] = prev[w2].H; last[2] = prev[w2].V;
}

// ---------------------------------------------------------------------
// Profile-profile DP (reference profile_seq.cpp:495-892).  Also covers
// sequence-profile: pass profile1 of cardinality 1 (identical recurrence;
// see famsa_tpu/ops/dp_jax.py docstring).
//
// counters/scores: row-major [w+1][32] int64.
// row_ranges: nullptr (unguided) or int64 [2*(w1+2)] (lo,hi per row).
void dp_prof_prof(const int64_t* counters1, const int64_t* scores1,
                  int64_t w1, int64_t card1,
                  const int64_t* counters2, const int64_t* scores2,
                  int64_t w2, int64_t card2,
                  int64_t go, int64_t ge, int64_t gto, int64_t gte,
                  const int64_t* row_ranges,
                  uint8_t* dirs, int64_t* last) {
    const int64_t stride = w2 + 1;
    std::vector<RowElem> prev(w2 + 1), curr(w2 + 1);

    std::memset(dirs, 0, size_t(w1 + 1) * stride);

    // profile2 per-column precomputes
    std::vector<int64_t> p2o(w2 + 1), p2e(w2 + 1), p2to(w2 + 1), p2te(w2 + 1);
    std::vector<int64_t> g2so(w2 + 1), g2se(w2 + 1), g2sto(w2 + 1),
        g2ste(w2 + 1), g2ce(w2 + 1), g2cte(w2 + 1);
    std::vector<int64_t> gaps2_change(w2 + 1);
    for (int64_t j = 0; j <= w2; ++j) {
        const int64_t* s2 = scores2 + j * NO_SYMBOLS;
        p2o[j] = s2[GAP_OPEN]; p2e[j] = s2[GAP_EXT];
        p2to[j] = s2[GAP_TERM_OPEN]; p2te[j] = s2[GAP_TERM_EXT];
        if (j >= 1) {
            solve_starting(counters2, j, w2, card2, g2so[j], g2se[j],
                           g2sto[j], g2ste[j]);
            solve_continuing(counters2, j, w2, card2, g2ce[j], g2cte[j]);
            const int64_t* c2 = counters2 + j * NO_SYMBOLS;
            gaps2_change[j] = c2[GAP_OPEN] * (ge - go)
                            + c2[GAP_TERM_OPEN] * (gte - gto);
        }
    }

    prev[0] = {0, NEG_INF, NEG_INF};
    for (int64_t j = 1; j <= w2; ++j) prev[j] = {NEG_INF, NEG_INF, NEG_INF};
    if (w2 >= 1) {
        prev[1].H = prev[0].D + p2to[1] * card1;
        set_packed(dirs + 1, DIR_H, DIR_H, DIR_H);
    }
    for (int64_t j = 2; j <= w2; ++j) {
        prev[j].H = prev[j - 1].H + p2te[j] * card1;
        set_packed(dirs + j, DIR_H, DIR_H, DIR_H);
    }
    prev[w2].H = NEG_INF;

    // row segment [jlo, jhi] of row i (shared by the single-thread path
    // and the 2-thread column-split wavefront; per-row precomputes are
    // (re)derived per call - O(32), negligible vs the cell loop)
    auto row_segment = [&](int64_t i, int64_t jlo, int64_t jhi,
                           const RowElem* prevr, RowElem* currr, bool head) {
        uint8_t* drow = dirs + i * stride;
        const int64_t* c1 = counters1 + i * NO_SYMBOLS;
        const int64_t* s1 = scores1 + i * NO_SYMBOLS;
        const int64_t s1go = s1[GAP_OPEN], s1ge = s1[GAP_EXT];
        const int64_t s1gto = s1[GAP_TERM_OPEN], s1gte = s1[GAP_TERM_EXT];

        if (head) {
            currr[0].D = NEG_INF;
            currr[0].H = NEG_INF;
            set_packed(drow, DIR_V, DIR_V, DIR_V);
            if (i < w1) {
                currr[0].V = std::max(prevr[0].D, prevr[0].V)
                           + (i == 1 ? s1gto : s1gte) * card2;
            } else {
                currr[0].V = NEG_INF;
            }
        }

        int64_t col1_sym[NO_AA_GAPS];
        int64_t col1_cnt[NO_AA_GAPS];
        int n_col1 = 0;
        int64_t col1_nng = 0;
        for (int k = 0; k < NO_AA_GAPS; ++k) {
            if (c1[k]) {
                col1_sym[n_col1] = k;
                col1_cnt[n_col1] = c1[k];
                ++n_col1;
                if (k < NO_AMINOACIDS) col1_nng += c1[k];
            }
        }

        int64_t n1so, n1se, n1sto, n1ste, n1ce, n1cte;
        solve_starting(counters1, i, w1, card1, n1so, n1se, n1sto, n1ste);
        solve_continuing(counters1, i, w1, card1, n1ce, n1cte);
        const int64_t n1_change = c1[GAP_OPEN];
        const int64_t n1_term_change = c1[GAP_TERM_OPEN];

        for (int64_t j = jlo; j <= jhi; ++j) {
            int d_D, d_H, d_V;
            const int64_t* s2col = scores2 + j * NO_SYMBOLS;

            int64_t t = 0;
            for (int k = 0; k < n_col1; ++k)
                t += col1_cnt[k] * s2col[col1_sym[k]];

            // D channel
            int64_t tD = prevr[j - 1].D + t;
            int64_t delta = n1_change * (s2col[GAP_EXT] - s2col[GAP_OPEN])
                + n1_term_change * (s2col[GAP_TERM_EXT] - s2col[GAP_TERM_OPEN]);
            int64_t tH = prevr[j - 1].H + t + delta;
            int64_t tV = prevr[j - 1].V + t + gaps2_change[j] * col1_nng;
            if (tD > tH && tD > tV) { currr[j].D = tD; d_D = DIR_D; }
            else if (tH > tV)       { currr[j].D = tH; d_D = DIR_H; }
            else                    { currr[j].D = tV; d_D = DIR_V; }

            const bool three = (i > 1) && (j > 1);

            // H channel
            int64_t gh_s = p2o[j] * n1so + p2e[j] * n1se
                         + p2to[j] * n1sto + p2te[j] * n1ste;
            int64_t gh_c = p2e[j] * n1ce + p2te[j] * n1cte;
            tD = currr[j - 1].D + gh_s;
            tH = currr[j - 1].H + gh_c;
            if (three) {
                tV = currr[j - 1].V + gh_s;
                if (tD > tH && tD > tV) { currr[j].H = tD; d_H = DIR_D; }
                else if (tV > tH)       { currr[j].H = tV; d_H = DIR_V; }
                else                    { currr[j].H = tH; d_H = DIR_H; }
            } else {
                if (tD > tH) { currr[j].H = tD; d_H = DIR_D; }
                else         { currr[j].H = tH; d_H = DIR_H; }
            }

            // V channel
            int64_t gv_s = s1go * g2so[j] + s1ge * g2se[j]
                         + s1gto * g2sto[j] + s1gte * g2ste[j];
            int64_t gv_c = s1ge * g2ce[j] + s1gte * g2cte[j];
            tD = prevr[j].D + gv_s;
            tV = prevr[j].V + gv_c;
            if (three) {
                tH = prevr[j].H + gv_s;
                if (tD > tH && tD > tV) { currr[j].V = tD; d_V = DIR_D; }
                else if (tH > tV)       { currr[j].V = tH; d_V = DIR_H; }
                else                    { currr[j].V = tV; d_V = DIR_V; }
            } else {
                if (tD > tV) { currr[j].V = tD; d_V = DIR_D; }
                else         { currr[j].V = tV; d_V = DIR_V; }
            }

            set_packed(drow + j, d_D, d_H, d_V);
        }
    };

    // 2-thread column-split wavefront (reference profile_par.cpp:441-905,
    // column stripes + staggered starts): the right half of each row runs
    // one row behind the left half on a second thread; 3 rotating row
    // buffers keep writer and laggard off shared rows.  Same per-cell
    // arithmetic -> byte-identical to the single-thread path.
    static const char* mt_env = std::getenv("FAMSA_TPU_DP_MT");
    static const bool mt_allow = !mt_env || mt_env[0] != '0';
    const bool mt = mt_allow && row_ranges == nullptr && w2 >= 512
                    && w1 * w2 >= (int64_t(1) << 21)
                    && std::thread::hardware_concurrency() >= 2;
    if (mt) {
        std::vector<RowElem> ring(3 * (w2 + 1));
        RowElem* rows[3] = {ring.data(), ring.data() + (w2 + 1),
                            ring.data() + 2 * (w2 + 1)};
        std::copy(prev.begin(), prev.end(), rows[0]);
        const int64_t m = w2 / 2;
        std::atomic<int64_t> left_row{0}, right_row{0};

        std::thread right_thr([&]() {
            for (int64_t i = 1; i <= w1; ++i) {
                while (left_row.load(std::memory_order_acquire) < i)
                    std::this_thread::yield();
                row_segment(i, m + 1, w2, rows[(i - 1) % 3], rows[i % 3],
                            false);
                right_row.store(i, std::memory_order_release);
            }
        });
        for (int64_t i = 1; i <= w1; ++i) {
            while (i >= 3 &&
                   right_row.load(std::memory_order_acquire) < i - 2)
                std::this_thread::yield();
            row_segment(i, 1, m, rows[(i - 1) % 3], rows[i % 3], true);
            left_row.store(i, std::memory_order_release);
        }
        right_thr.join();
        const RowElem* lastr = rows[w1 % 3];
        last[0] = lastr[w2].D; last[1] = lastr[w2].H; last[2] = lastr[w2].V;
        return;
    }

    for (int64_t i = 1; i <= w1; ++i) {
        int64_t lo_i = 0, hi_i = w2;
        if (row_ranges) { lo_i = row_ranges[2 * i]; hi_i = row_ranges[2 * i + 1]; }
        if (lo_i)
            curr[lo_i - 1] = {NEG_INF, NEG_INF, NEG_INF};
        if (i < w1 && row_ranges) {
            int64_t hi_clear = std::min(row_ranges[2 * (i + 1) + 1], w2);
            for (int64_t j = hi_i + 1; j <= hi_clear; ++j)
                curr[j] = {NEG_INF, NEG_INF, NEG_INF};
        }
        const int64_t min_j = std::max(int64_t(1), lo_i);
        const int64_t max_j = std::min(hi_i, w2);
        row_segment(i, min_j, max_j, prev.data(), curr.data(), true);
        std::swap(prev, curr);
    }
    last[0] = prev[w2].D; last[1] = prev[w2].H; last[2] = prev[w2].V;
}


// ---------------------------------------------------------------------
// SLINK inner update for one row i (reference SingleLinkage.cpp:99-154).
// dv_d/dv_p: distance vector (pair values) of length >= i; pi/lam_*: n.
void slink_update_row(int64_t i, double* dv_d, uint64_t* dv_p,
                      int64_t* pi, double* lam_d, uint64_t* lam_p) {
    auto less = [](double d1, uint64_t p1, double d2, uint64_t p2) {
        return d1 == d2 ? p1 > p2 : d1 < d2;
    };
    for (int64_t j = 0; j < i; ++j) {
        int64_t nxt = pi[j];
        if (less(lam_d[j], lam_p[j], dv_d[j], dv_p[j])) {
            if (less(dv_d[j], dv_p[j], dv_d[nxt], dv_p[nxt])) {
                dv_d[nxt] = dv_d[j]; dv_p[nxt] = dv_p[j];
            }
        } else {
            if (less(lam_d[j], lam_p[j], dv_d[nxt], dv_p[nxt])) {
                dv_d[nxt] = lam_d[j]; dv_p[nxt] = lam_p[j];
            }
            pi[j] = i;
            lam_d[j] = dv_d[j]; lam_p[j] = dv_p[j];
        }
    }
    for (int64_t j = 0; j < i; ++j) {
        int64_t nxt = pi[j];
        bool leq = lam_d[nxt] == lam_d[j] ? lam_p[nxt] >= lam_p[j]
                                          : lam_d[nxt] <= lam_d[j];
        if (leq) pi[j] = i;
    }
}

// ---------------------------------------------------------------------
// CLARANS delta loop for one swap candidate (reference Clustering.cpp:104-135).
// Exact float32 accumulation order.
void clarans_deltas(const float* dmat, int64_t n_elems, int64_t n_medoids,
                    int64_t xx, const int64_t* candidate,
                    const float* dists_nearest, const float* dists_second,
                    const int64_t* assign_nearest, float* deltas) {
    for (int64_t k = 0; k < n_medoids; ++k) deltas[k] = 0.0f;
    const int64_t x = candidate[xx];
    const float* drow = dmat + x * n_elems;
    for (int64_t yy = n_medoids; yy < n_elems; ++yy) {
        if (yy == xx) continue;
        int64_t y = candidate[yy];
        float dxy = drow[y];
        int64_t nn = assign_nearest[y];
        float dn = dists_nearest[y];
        float ds = dists_second[y];
        deltas[nn] += std::min(dxy, ds) - dn;
        float change = dxy - dn;
        if (change < 0) {
            for (int64_t kk = 0; kk < nn; ++kk) deltas[kk] += change;
            for (int64_t kk = nn + 1; kk < n_medoids; ++kk) deltas[kk] += change;
        }
    }
}

// Two closest medoids of x (reference Clustering.cpp:264-299)
static void update_assignment(const float* dmat, int64_t n_elems,
                              const int64_t* candidate, int64_t n_medoids,
                              int64_t x, float& dn, float& ds,
                              int64_t& an, int64_t& as_) {
    dn = 3.4028234663852886e+38f; ds = dn; an = -1; as_ = -1;
    for (int64_t mm = 0; mm < n_medoids; ++mm) {
        int64_t m = candidate[mm];
        float d = dmat[m * n_elems + x];
        if (d < dn) { ds = dn; as_ = an; dn = d; an = mm; }
        else if (d < ds) { ds = d; as_ = mm; }
    }
}

// CLARANS post-swap update (reference Clustering.cpp:157-227).
// Returns updated current cost.
float clarans_apply_swap(const float* dmat, int64_t n_elems,
                         int64_t n_medoids, int64_t xx, int64_t mm_new,
                         int64_t* candidate, float* dists_nearest,
                         float* dists_second, int64_t* assign_nearest,
                         int64_t* assign_second, float cur_cost) {
    std::swap(candidate[mm_new], candidate[xx]);
    int64_t m_new = candidate[mm_new];

    cur_cost -= dists_nearest[m_new];
    dists_nearest[m_new] = 0;
    dists_second[m_new] = -1;
    assign_nearest[m_new] = -1;
    assign_second[m_new] = -1;

    const float* mrow = dmat + m_new * n_elems;

    for (int64_t yy = n_medoids; yy < n_elems; ++yy) {
        int64_t y = candidate[yy];
        float d_new = mrow[y];
        float dn = dists_nearest[y];
        int64_t an = assign_nearest[y];

        if (yy == xx) {
            update_assignment(dmat, n_elems, candidate, n_medoids, y,
                              dists_nearest[y], dists_second[y],
                              assign_nearest[y], assign_second[y]);
            cur_cost += dists_nearest[y];
            continue;
        }
        if (an == mm_new) {
            float ds = dists_second[y];
            if (d_new < ds) {
                dists_nearest[y] = d_new;
                assign_nearest[y] = mm_new;
                cur_cost += d_new - dn;
            } else {
                update_assignment(dmat, n_elems, candidate, n_medoids, y,
                                  dists_nearest[y], dists_second[y],
                                  assign_nearest[y], assign_second[y]);
                cur_cost += ds - dn;
            }
        } else if (d_new < dn) {
            dists_second[y] = dn;
            assign_second[y] = an;
            dists_nearest[y] = d_new;
            assign_nearest[y] = mm_new;
            cur_cost += d_new - dn;
        } else {
            float ds = dists_second[y];
            int64_t as_ = assign_second[y];
            if (as_ != mm_new && d_new < ds) {
                dists_second[y] = d_new;
                assign_second[y] = mm_new;
            } else {
                update_assignment(dmat, n_elems, candidate, n_medoids, y,
                                  dists_nearest[y], dists_second[y],
                                  assign_nearest[y], assign_second[y]);
            }
        }
    }
    return cur_cost;
}

// CLARANS init assignments (reference Clustering.cpp:77-83); returns cost.
float clarans_init(const float* dmat, int64_t n_elems, int64_t n_medoids,
                   const int64_t* candidate, float* dists_nearest,
                   float* dists_second, int64_t* assign_nearest,
                   int64_t* assign_second) {
    float cost = 0.0f;
    for (int64_t xx = n_medoids; xx < n_elems; ++xx) {
        int64_t x = candidate[xx];
        update_assignment(dmat, n_elems, candidate, n_medoids, x,
                          dists_nearest[x], dists_second[x],
                          assign_nearest[x], assign_second[x]);
        cost += dists_nearest[x];
    }
    return cost;
}

// ---------------------------------------------------------------------
// Traceback walk over the packed direction matrix (construct.py:
// _trace_path semantics, reference ConstructProfile's path build,
// profile.cpp:710-760): returns the number of entries written to
// out_path; the forward move list is out_path[1..n-1] (entry 0 is the
// boundary cut, dropped by the caller).  total written to out_total.
int64_t trace_path(const uint8_t* dirs, int64_t w1, int64_t w2,
                   int64_t d0, int64_t h0, int64_t v0,
                   int64_t* out_path, int64_t* out_total) {
    int dir;
    int64_t total;
    if (d0 >= h0 && d0 >= v0) { dir = 0; total = d0; }
    else if (h0 > v0) { dir = 1; total = h0; }
    else { dir = 2; total = v0; }
    const int64_t stride = w2 + 1;
    int64_t i = w1, j = w2, n = 0;
    out_path[n++] = dir;
    while (i || j) {
        const uint8_t cell = dirs[i * stride + j];
        if (dir == 0) { dir = cell & 3; --i; --j; }
        else if (dir == 1) { dir = (cell >> 2) & 3; --j; }
        else { dir = (cell >> 4) & 3; --i; }
        out_path[n++] = dir;
    }
    for (int64_t a = 0, b = n - 1; a < b; ++a, --b) {
        const int64_t tmp = out_path[a];
        out_path[a] = out_path[b];
        out_path[b] = tmp;
    }
    *out_total = total;
    return n;
}

} // extern "C"


extern "C" {

// ---------------------------------------------------------------------
// Batched bit-parallel LCS: one reference (per-symbol u64 masks) vs N
// queries (reference lcsbp_classic.h:49-221).  Pad symbols >= 20 are
// no-ops by construction (zero masks).
void lcs_batch(const uint64_t* masks /* 32 x bv_len */, int64_t bv_len,
               const int8_t* queries /* n x l */, int64_t n, int64_t l,
               int64_t* out /* n */) {
    std::vector<uint64_t> X(bv_len);
    for (int64_t q = 0; q < n; ++q) {
        const int8_t* seq = queries + q * l;
        for (int64_t k = 0; k < bv_len; ++k) X[k] = ~uint64_t(0);
        for (int64_t t = 0; t < l; ++t) {
            const uint64_t* s0b = masks + uint64_t(uint8_t(seq[t])) * bv_len;
            uint64_t carry = 0;
            for (int64_t k = 0; k < bv_len; ++k) {
                uint64_t v = X[k];
                uint64_t tb = v & s0b[k];
                uint64_t v2 = v + tb + carry;
                carry = v2 < v;
                X[k] = v2 | (v - tb);
            }
        }
        int64_t lcs = 0;
        for (int64_t k = 0; k < bv_len; ++k)
            lcs += __builtin_popcountll(~X[k]);
        out[q] = lcs;
    }
}

// ---------------------------------------------------------------------
// Batched all-gap-column insertion over a profile's member sequences
// (reference FinalizeGaps, profile.cpp:1052-1106): deltas[r] gap columns
// inserted just before OLD column idxs[r] (ascending) plus `trail`
// trailing columns, applied to every member's n_gaps run-length array.
// ptrs[m] is the raw int64* of member m's n_gaps ([size+1] entries);
// the Python wrapper guarantees no cached position line is live.
void apply_column_inserts_batch(const uint64_t* ptrs, const int64_t* sizes,
                                int64_t n_members, const int64_t* idxs,
                                const int64_t* deltas, int64_t n_runs,
                                int64_t trail) {
    std::vector<int64_t> ks(static_cast<size_t>(n_runs));
    int64_t sumd = 0;
    for (int64_t r = 0; r < n_runs; ++r) sumd += deltas[r];
    for (int64_t m = 0; m < n_members; ++m) {
        int64_t* g = reinterpret_cast<int64_t*>(ptrs[m]);
        const int64_t size = sizes[m];
        if (size == 0) { g[0] += sumd + trail; continue; }
        // two-pointer walk: ks[r] = #symbols with (old) position <
        // idxs[r]; deferred application so the walk reads pristine gaps
        int64_t x = 0, cum = 0;
        for (int64_t r = 0; r < n_runs; ++r) {
            const int64_t i = idxs[r];
            while (x < size) {
                const int64_t nxt = cum + g[x] + 1;
                if (nxt < i) { cum = nxt; ++x; } else break;
            }
            ks[r] = x;
        }
        for (int64_t r = 0; r < n_runs; ++r) g[ks[r]] += deltas[r];
        g[size] += trail;
    }
}

} // extern "C"
