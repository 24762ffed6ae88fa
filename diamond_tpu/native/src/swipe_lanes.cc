// Lane-parallel score-only banded SWIPE (native transplant of the
// framework's own batched formulation, ops/banded_swipe.py
// banded_swipe_batch_np): consecutive jobs sharing one query batch into
// LANES-wide groups, so the column loop's per-row ops vectorize across
// lanes (the serial lazy-F chain of the scalar kernel becomes
// independent per lane).  Unlike the TPU kernel, no uniform-band target
// shift is used — profile lookups are per-lane scalar gathers, so each
// lane keeps its own diagonal origin and T stays the max target length
// of the group.  Exact int32 parity with the numpy twin (the oracle).

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int LANES = 16;
constexpr int32_t NEGB = -1000000000;

struct Prof {
    std::vector<int32_t> rows;  // [qlen][32]
    int64_t q_off = -1;
    int64_t qlen = 0;
    int use_bias = -1;
};

void build_prof(Prof& p, const int8_t* q, int64_t qlen, const int32_t* bias,
                const int32_t* matrix32) {
    p.rows.resize((size_t)qlen * 32);
    for (int64_t i = 0; i < qlen; ++i) {
        const int32_t* mrow = matrix32 + (q[i] & 31) * 32;
        int32_t* out = p.rows.data() + i * 32;
        const int32_t b = bias ? bias[i] : 0;
        for (int c = 0; c < 32; ++c)
            out[c] = mrow[c] + b;
    }
}

}  // namespace

extern "C" void banded_swipe_score_lanes(
    const int8_t* q_base, const int32_t* bias_base,
    const int64_t* q_off, const int64_t* q_len, const uint8_t* use_bias,
    const int8_t* t_cat, const int64_t* t_off, const int64_t* t_len,
    const int64_t* d_begin, const int64_t* band_arr, int64_t njobs,
    const int32_t* matrix32, int64_t go64, int64_t ge64, int64_t* out) {
    const int32_t go = (int32_t)go64, ge = (int32_t)ge64;
    Prof prof;
    std::vector<int32_t> H, E, cur0, F, scores;
    int64_t k0 = 0;
    while (k0 < njobs) {
        int64_t k1 = k0 + 1;
        while (k1 < njobs && k1 - k0 < LANES && q_off[k1] == q_off[k0]
               && use_bias[k1] == use_bias[k0])
            ++k1;
        const int L = (int)(k1 - k0);
        const int64_t qoff = q_off[k0];
        const int64_t qlen = q_len[k0];
        if (prof.q_off != qoff || prof.qlen != qlen
            || prof.use_bias != (int)use_bias[k0]) {
            build_prof(prof, q_base + qoff, qlen,
                       use_bias[k0] && bias_base ? bias_base + qoff
                                                 : nullptr,
                       matrix32);
            prof.q_off = qoff;
            prof.qlen = qlen;
            prof.use_bias = use_bias[k0];
        }
        int64_t band = 0, T = 0;
        int64_t d0_l[LANES] = {0}, blen[LANES] = {0}, tlen_l[LANES] = {0};
        const int8_t* tp[LANES] = {nullptr};
        for (int l = 0; l < L; ++l) {
            const int64_t k = k0 + l;
            if (band_arr[k] > band)
                band = band_arr[k];
            if (t_len[k] > T)
                T = t_len[k];
            d0_l[l] = d_begin[k];
            blen[l] = band_arr[k];
            tlen_l[l] = t_len[k];
            tp[l] = t_cat + t_off[k];
        }
        const size_t cells = (size_t)band * LANES;
        H.assign(cells, 0);
        E.assign(cells, 0);
        cur0.resize(cells);
        F.resize(cells);
        scores.resize(cells);
        int32_t best[LANES] = {0};
        int32_t max_col[LANES] = {0};
        int32_t max_row[LANES] = {0};
        int8_t tlet[LANES];
        int8_t in_t[LANES];

        for (int64_t j = 0; j < T; ++j) {
            for (int l = 0; l < LANES; ++l) {
                tlet[l] = 31;
                in_t[l] = 0;
            }
            for (int l = 0; l < L; ++l)
                if (j < tlen_l[l]) {
                    tlet[l] = tp[l][j] & 31;
                    in_t[l] = 1;
                }
            // scores[r][l] = prof[j + d0_l + r][tlet[l]]; NEG outside the
            // query / band / target (the numpy twin's `valid` mask)
            for (int64_t r = 0; r < band; ++r) {
                int32_t* srow = scores.data() + r * LANES;
                for (int l = 0; l < LANES; ++l) {
                    const int64_t qi = j + d0_l[l] + r;
                    srow[l] = (in_t[l] && r < blen[l] && qi >= 0
                               && qi < qlen)
                                  ? prof.rows[qi * 32 + tlet[l]]
                                  : NEGB;
                }
            }
            // cur0 = max(H + scores, E, 0)
            for (int64_t r = 0; r < band; ++r) {
                const int32_t* h = H.data() + r * LANES;
                const int32_t* e = E.data() + r * LANES;
                const int32_t* s = scores.data() + r * LANES;
                int32_t* c = cur0.data() + r * LANES;
                for (int l = 0; l < LANES; ++l) {
                    int32_t v = h[l] + s[l];
                    if (e[l] > v)
                        v = e[l];
                    c[l] = v > 0 ? v : 0;
                }
            }
            // lazy-F chain per lane (vector across lanes)
            {
                int32_t run[LANES];
                for (int l = 0; l < LANES; ++l) {
                    run[l] = NEGB;
                    F[l] = 0;
                }
                for (int64_t r = 1; r < band; ++r) {
                    const int32_t* cprev = cur0.data() + (r - 1) * LANES;
                    int32_t* f = F.data() + r * LANES;
                    const int32_t rg = (int32_t)(r - 1) * ge;
                    for (int l = 0; l < LANES; ++l) {
                        const int32_t g = cprev[l] - go + rg;
                        if (g > run[l])
                            run[l] = g;
                        const int32_t fv = run[l] - rg;
                        f[l] = fv > 0 ? fv : 0;
                    }
                }
            }
            // Hn = valid ? max(cur0, F) : 0; column best tracking
            int32_t cb[LANES] = {0};
            int32_t cbr[LANES] = {0};
            for (int64_t r = 0; r < band; ++r) {
                const int32_t* s = scores.data() + r * LANES;
                const int32_t* f = F.data() + r * LANES;
                int32_t* c = cur0.data() + r * LANES;  // becomes Hn
                for (int l = 0; l < LANES; ++l) {
                    int32_t v = c[l];
                    if (f[l] > v)
                        v = f[l];
                    if (s[l] <= NEGB / 2)
                        v = 0;
                    c[l] = v;
                    if (v >= cb[l]) {
                        cb[l] = v;
                        cbr[l] = (int32_t)r;
                    }
                }
            }
            for (int l = 0; l < L; ++l)
                if (cb[l] > best[l]) {
                    best[l] = cb[l];
                    max_col[l] = (int32_t)j;
                    max_row[l] = cbr[l];
                }
            // E update + row shift (E[r] <- E_out[r+1])
            for (int64_t r = 0; r < band; ++r) {
                const int32_t* c = cur0.data() + r * LANES;
                int32_t* e = E.data() + r * LANES;
                for (int l = 0; l < LANES; ++l) {
                    int32_t v = e[l] - ge;
                    const int32_t o = c[l] - go;
                    if (o > v)
                        v = o;
                    e[l] = v > 0 ? v : 0;
                }
            }
            std::memmove(E.data(), E.data() + LANES,
                         (cells - LANES) * sizeof(int32_t));
            std::memset(E.data() + cells - LANES, 0, LANES * sizeof(int32_t));
            std::swap(H, cur0);
        }
        for (int l = 0; l < L; ++l) {
            const int64_t k = k0 + l;
            out[3 * k] = best[l];
            out[3 * k + 1] = max_col[l];
            out[3 * k + 2] = max_col[l] + d0_l[l] + max_row[l];
        }
        k0 = k1;
    }
}
