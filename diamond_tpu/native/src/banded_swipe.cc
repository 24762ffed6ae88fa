// Banded Smith-Waterman score DP (native twin of
// diamond_tpu/ops/banded_swipe.py banded_swipe_np / banded_swipe_batch_np;
// reference semantics from src/dp/swipe/banded_swipe.h:200-360,
// cell_update.h:102-141).
//
// Computes the column DP exactly like the numpy oracle (int64 cells,
// lazy vertical-gap chain, last-row-attaining column max, first column
// strictly improving) and optionally emits the four trace-mask planes
// (gapv/gaph/openv/openh as 0/1 bytes, [tlen, band] row-major) consumed
// by the Python _traceback walk, which remains the traceback oracle.
// On TPU the same DP runs as the Pallas kernel (ops/swipe_pallas.py);
// this is the host path.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {
constexpr int64_t NEGB = -1000000000LL;  // matches the oracle's -(10**9)

inline int64_t max64(int64_t a, int64_t b) { return a > b ? a : b; }

void swipe_one(const int8_t* q_letters, int64_t qlen, const int32_t* bias,
               const int8_t* t_letters, int64_t tlen, int64_t d_begin,
               int64_t band, const int32_t* matrix32, int64_t go, int64_t ge,
               int64_t* out3, uint8_t* gapv, uint8_t* gaph, uint8_t* openv,
               uint8_t* openh, std::vector<int64_t>& Hbuf,
               std::vector<int64_t>& Ebuf, std::vector<int64_t>& c0buf,
               std::vector<int64_t>& Fbuf, std::vector<int64_t>& gmbuf) {
    Hbuf.assign(band, 0);
    Ebuf.assign(band + 1, 0);
    c0buf.resize(band);
    Fbuf.resize(band);
    gmbuf.resize(band);
    int64_t* H = Hbuf.data();
    int64_t* E = Ebuf.data();
    int64_t* cur0 = c0buf.data();
    int64_t* F = Fbuf.data();
    int64_t* gm = gmbuf.data();

    int64_t best = 0, max_col = 0, max_row_band = 0;

    for (int64_t j = 0; j < tlen; ++j) {
        const int64_t i_lo = j + d_begin;
        const int64_t r_lo = max64(0, -i_lo);
        const int64_t r_hi = band < qlen - i_lo ? band : qlen - i_lo;
        if (r_lo >= r_hi) {
            std::memset(H, 0, band * sizeof(int64_t));
            std::memset(E, 0, band * sizeof(int64_t));
            continue;
        }
        const int32_t* mrow_base = matrix32;
        const int64_t tl = t_letters[j] & 31;

        // cur0 = max(H + score, E, 0), zeroed outside [r_lo, r_hi)
        for (int64_t r = 0; r < band; ++r) {
            int64_t v;
            if (r >= r_lo && r < r_hi) {
                const int64_t ql = q_letters[i_lo + r] & 31;
                int64_t sc = mrow_base[ql * 32 + tl];
                if (bias)
                    sc += bias[i_lo + r];
                v = H[r] + sc;
                if (E[r] > v)
                    v = E[r];
                if (v < 0)
                    v = 0;
            } else {
                v = 0;
            }
            cur0[r] = v;
        }
        // lazy vertical-gap chain: g[r] = cur0[r] - go + r*ge, running max;
        // F[r] = max(gm[r-1] - (r-1)*ge, 0), zeroed through row r_lo
        {
            int64_t run = NEGB;
            for (int64_t r = 0; r < band; ++r) {
                const int64_t g = cur0[r] - go + r * ge;
                if (g > run)
                    run = g;
                gm[r] = run;
            }
            F[0] = 0;
            for (int64_t r = 1; r < band; ++r)
                F[r] = max64(gm[r - 1] - (r - 1) * ge, 0);
            for (int64_t r = 0; r <= r_lo && r < band; ++r)
                F[r] = 0;
        }
        // cur = max(cur0, F), zeroed outside the valid rows; column best is
        // the LAST row attaining the max (VectorRowCounter)
        int64_t cb = 0, cbr = r_lo;
        for (int64_t r = 0; r < band; ++r) {
            int64_t v = r >= r_lo && r < r_hi ? max64(cur0[r], F[r]) : 0;
            cur0[r] = v;  // cur0 now holds cur
            if (r >= r_lo && r < r_hi && v >= cb && v > 0) {
                if (v > cb)
                    cb = v;
                cbr = r;
            }
        }
        if (cb > best) {
            best = cb;
            max_col = j;
            max_row_band = cbr;
        }
        // E update + trace masks (gaph compares against the OLD E)
        for (int64_t r = 0; r < band; ++r) {
            const int64_t cu = cur0[r];
            const int64_t opn = max64(cu - go, 0);
            const int64_t e_next = max64(E[r] - ge, 0);
            if (gapv) {
                const int64_t base = j * band + r;
                gapv[base] = cu == F[r];
                gaph[base] = cu == E[r];
                openv[base] = opn >= max64(F[r] - ge, 0);
                openh[base] = opn >= e_next;
            }
            int64_t en = max64(e_next, opn);
            if (r < r_lo || r >= r_hi)
                en = 0;
            F[r] = en;  // F reused as Enew scratch
        }
        std::memcpy(H, cur0, band * sizeof(int64_t));
        std::memcpy(E, F + 1, (band - 1) * sizeof(int64_t));
        E[band - 1] = 0;
    }
    out3[0] = best;
    out3[1] = max_col;
    out3[2] = max_row_band;
}
}  // namespace

// Batched entry: njobs jobs over one query.  targets are concatenated in
// t_cat with per-job offsets/lengths; per-job band geometry in d_begin/band.
// out: [njobs, 3] (score, max_col, max_row_band).  When mask_off is
// non-null, the four mask planes for job k are written at mask_off[k]
// within the gapv/gaph/openv/openh buffers ([tlen_k, band_k] each).
extern "C" void banded_swipe_many(
    const int8_t* q_letters, int64_t qlen, const int32_t* bias,
    const int8_t* t_cat, const int64_t* t_off, const int64_t* t_len,
    const int64_t* d_begin, const int64_t* band, int64_t njobs,
    const int32_t* matrix32, int64_t go, int64_t ge, int64_t* out,
    const int64_t* mask_off, uint8_t* gapv, uint8_t* gaph, uint8_t* openv,
    uint8_t* openh) {
    std::vector<int64_t> Hbuf, Ebuf, c0buf, Fbuf, gmbuf;
    for (int64_t k = 0; k < njobs; ++k) {
        uint8_t *gv = nullptr, *gh = nullptr, *ov = nullptr, *oh = nullptr;
        if (mask_off) {
            const int64_t off = mask_off[k];
            gv = gapv + off;
            gh = gaph + off;
            ov = openv + off;
            oh = openh + off;
        }
        swipe_one(q_letters, qlen, bias, t_cat + t_off[k], t_len[k],
                  d_begin[k], band[k], matrix32, go, ge, out + 3 * k, gv, gh,
                  ov, oh, Hbuf, Ebuf, c0buf, Fbuf, gmbuf);
    }
}
