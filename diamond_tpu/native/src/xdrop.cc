// Two-sided x-drop ungapped extension (native twin of
// diamond_tpu/align/chain.py xdrop_ungapped; reference semantics from
// src/dp/ungapped_align.cpp:151-213).
//
// Pointers are padded views into the concatenated block arrays: reads
// beyond either sequence hit delimiter letters (31) and terminate the
// loops exactly like the Python oracle.

#include <cstdint>

namespace {
constexpr int8_t DELIMITER = 31;
}

extern "C" void xdrop_ungapped_one(const int8_t* query, const int8_t* bias,
                                   const int8_t* target, int64_t qa,
                                   int64_t sa, const int32_t* matrix32,
                                   int32_t xdrop, int64_t* out /* i,j,len,score */) {
    int64_t score = 0, st = 0, n = 1, delta = 0, ln = 0;

    int64_t qi = qa - 1, si = sa - 1;
    while (score - st < xdrop) {
        const int8_t ql = query[qi];
        const int8_t sl = target[si];
        if (ql == DELIMITER || sl == DELIMITER)
            break;
        st += matrix32[(ql & 31) * 32 + (sl & 31)];
        if (bias)
            st += bias[qi];
        if (st > score) {
            score = st;
            delta = n;
        }
        --qi;
        --si;
        ++n;
    }

    qi = qa;
    si = sa;
    st = score;
    n = 1;
    while (score - st < xdrop) {
        const int8_t ql = query[qi];
        const int8_t sl = target[si];
        if (ql == DELIMITER || sl == DELIMITER)
            break;
        st += matrix32[(ql & 31) * 32 + (sl & 31)];
        if (bias)
            st += bias[qi];
        if (st > score) {
            score = st;
            ln = n;
        }
        ++qi;
        ++si;
        ++n;
    }

    out[0] = qa - delta;
    out[1] = sa - delta;
    out[2] = ln + delta;
    out[3] = score;
}
