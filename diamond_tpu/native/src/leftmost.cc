// Left-most dedup filter (native twin of
// diamond_tpu/search/left_most_batch.py; reference semantics from
// src/search/left_most.h:31-110).
//
// left_most_filter_many runs the COMPLETE per-hit filter — stage-2 window
// geometry, subject-side delimiter clip, reduced match-mask packing,
// pattern-matcher table lookups, and candidate verification — in one pass
// per hit with no temporaries.  leftmost_verify remains exported for the
// numpy batch fallback, which is the bit-identical oracle.

#include <cstdint>

namespace {

constexpr int8_t DELIMITER = 31;
constexpr int8_t MASK_LETTER = 23;
constexpr int8_t STOP_LETTER = 24;

inline uint8_t verify_one(
    const int8_t* q_letters, const int8_t* s_letters,
    int64_t qs, int64_t ss, uint64_t hit_bits, uint64_t match_mask,
    int32_t left,
    uint64_t shape_mask, const int64_t* shape_positions,
    int32_t shape_weight,
    const int8_t* reduction_map, int64_t reduction_size,
    int32_t chunked, int64_t part_lo, int64_t part_hi, uint64_t seedp_mask,
    int32_t hamming_filter_id) {
    uint64_t m = hit_bits;
    while (m) {
        const int bit = __builtin_ctzll(m);
        m &= m - 1;
        const int64_t qpos = qs + bit;
        const int64_t spos = ss + bit;
        if (chunked) {
            const uint64_t mm = match_mask >> bit;
            if ((mm & shape_mask) == shape_mask) {
                bool good = true;
                int64_t key = 0;
                for (int32_t c = 0; c < shape_weight; ++c) {
                    const int l = s_letters[spos + shape_positions[c]] & 31;
                    if (l >= 20) {
                        good = false;
                        break;
                    }
                    key = key * reduction_size + reduction_map[l];
                }
                if (!good)
                    continue;
                const int64_t part = key & (int64_t)seedp_mask;
                if (left ? !(part < part_hi) : !(part < part_lo))
                    continue;
            }
        }
        int32_t ident = 0;
        for (int o = -16; o < 32; ++o)
            ident += (q_letters[qpos + o] & 31) == (s_letters[spos + o] & 31);
        if (ident >= hamming_filter_id)
            return 1;
    }
    return 0;
}

// PatternMatcher.hit for one packed match mask (left_most_batch.py:47-60).
inline uint64_t matcher_hit(uint64_t h, int64_t length, const uint8_t* table,
                            uint64_t suffix_mask, int32_t min_len,
                            int32_t empty) {
    if (empty)
        return 0;
    uint64_t out = 0;
    const int64_t end = length - min_len + 1;
    for (int64_t i = 0; i < end; ++i)
        if (table[(h >> i) & suffix_mask])
            out |= 1ull << i;
    return out;
}

}  // namespace

extern "C" void leftmost_verify(
    const int8_t* q_letters, const int8_t* s_letters,
    const int64_t* qs, const int64_t* ss,
    const uint64_t* hit_bits, const uint64_t* match_masks,
    int64_t n, int32_t left,
    uint64_t shape_mask, const int64_t* shape_positions,
    int32_t shape_weight,
    const int8_t* reduction_map, int64_t reduction_size,
    int32_t chunked, int64_t part_lo, int64_t part_hi, uint64_t seedp_mask,
    int32_t hamming_filter_id, uint8_t* out) {
    for (int64_t i = 0; i < n; ++i)
        out[i] = verify_one(q_letters, s_letters, qs[i], ss[i], hit_bits[i],
                            match_masks[i], left, shape_mask, shape_positions,
                            shape_weight, reduction_map, reduction_size,
                            chunked, part_lo, part_hi, seedp_mask,
                            hamming_filter_id);
}

extern "C" void left_most_filter_many(
    const int8_t* q_letters, const int8_t* s_letters,
    const uint8_t* q_seed_mask,
    const int8_t* reduction_map, int64_t reduction_size,
    const int64_t* qp, const int64_t* sp, const int64_t* seed_offsets,
    const int64_t* window_lefts, const int64_t* window_rights, int64_t n,
    uint64_t shape_mask, const int64_t* shape_positions,
    int32_t shape_weight, int64_t shape_length,
    int32_t first_shape, int32_t chunked,
    const uint8_t* cur_table, uint64_t cur_suffix_mask, int32_t cur_min_len,
    int32_t cur_empty,
    const uint8_t* prev_table, uint64_t prev_suffix_mask,
    int32_t prev_min_len, int32_t prev_empty,
    int64_t part_lo, int64_t part_hi, uint64_t seedp_mask,
    int32_t hamming_filter_id, uint8_t* out) {
    for (int64_t i = 0; i < n; ++i) {
        // stage2 window geometry (reference stage2.h:95-105)
        const int64_t wl0 = window_lefts[i];
        const int64_t wr0 = window_rights[i];
        const int64_t interval_mod = seed_offsets[i] % 32;
        int64_t overhang = wl0 - interval_mod;
        if (overhang < 0)
            overhang = 0;
        const int64_t seed_off = wl0 - overhang;
        const int64_t win_len0 = wl0 + wr0 - overhang;

        // left_most entry geometry (reference left_most.h:74-88)
        int64_t d = seed_off - 16;
        if (d < 0)
            d = 0;
        int64_t wl = seed_off < 16 ? seed_off : 16;
        int64_t qs = qp[i] - seed_off + d;
        int64_t ss = sp[i] - seed_off + d;
        int64_t window = win_len0 - d;
        if (window > wl + 1 + 32)
            window = wl + 1 + 32;

        // subject-side delimiter clip around the anchor at wl
        int64_t first_after = window;
        int64_t last_before = -1;
        for (int64_t o = 0; o < window; ++o) {
            if (s_letters[ss + o] == DELIMITER) {
                if (o >= wl) {
                    first_after = o;
                    break;
                }
                last_before = o;
            }
        }
        const int64_t dd = last_before >= 0 ? last_before + 1 : 0;
        qs += dd;
        ss += dd;
        wl -= dd;
        window = first_after - dd;

        // reduced match mask + seed-mask bits over the clipped window
        uint64_t match_mask = 0, smask = 0;
        for (int64_t o = 0; o < window; ++o) {
            const int ql = q_letters[qs + o] & 31;
            const int sl = s_letters[ss + o] & 31;
            const bool aaq =
                ql != MASK_LETTER && ql != DELIMITER && ql != STOP_LETTER;
            const bool aas =
                sl != MASK_LETTER && sl != DELIMITER && sl != STOP_LETTER;
            if (aaq && aas && reduction_map[ql] == reduction_map[sl])
                match_mask |= 1ull << o;
            if (q_seed_mask[qs + o])
                smask |= 1ull << o;
        }
        const uint64_t query_seed_mask = ~smask;

        const int64_t len_left = wl + shape_length - 1;
        const uint64_t bits_left = (1ull << len_left) - 1;
        const uint64_t mm_left = match_mask & bits_left;
        const uint64_t qm_left = query_seed_mask & bits_left;
        const uint64_t left_hit =
            matcher_hit(mm_left, len_left, cur_table, cur_suffix_mask,
                        cur_min_len, cur_empty) & qm_left;

        if (first_shape && !chunked) {
            out[i] = left_hit == 0
                         ? 1
                         : (uint8_t)!verify_one(
                               q_letters, s_letters, qs, ss, left_hit,
                               mm_left, 1, shape_mask, shape_positions,
                               shape_weight, reduction_map, reduction_size,
                               chunked, part_lo, part_hi, seedp_mask,
                               hamming_filter_id);
            continue;
        }

        const int64_t len_right = window - wl - 1;
        const uint64_t shift = (uint64_t)(wl + 1);
        const uint64_t mm_right = (match_mask >> shift) & 0xFFFFFFFFull;
        const uint64_t qm_right = (query_seed_mask >> shift) & 0xFFFFFFFFull;
        const uint8_t* r_table = chunked ? cur_table : prev_table;
        const uint64_t r_sm = chunked ? cur_suffix_mask : prev_suffix_mask;
        const int32_t r_ml = chunked ? cur_min_len : prev_min_len;
        const int32_t r_empty = chunked ? cur_empty : prev_empty;
        const uint64_t right_hit =
            matcher_hit(mm_right, len_right, r_table, r_sm, r_ml, r_empty) &
            qm_right;

        uint8_t keep = 1;
        if (left_hit)
            keep &= (uint8_t)!verify_one(
                q_letters, s_letters, qs, ss, left_hit, mm_left, 1,
                shape_mask, shape_positions, shape_weight, reduction_map,
                reduction_size, chunked, part_lo, part_hi, seedp_mask,
                hamming_filter_id);
        if (keep && right_hit)
            keep &= (uint8_t)!verify_one(
                q_letters, s_letters, qs + (int64_t)shift,
                ss + (int64_t)shift, right_hit, mm_right, 0, shape_mask,
                shape_positions, shape_weight, reduction_map, reduction_size,
                chunked, part_lo, part_hi, seedp_mask, hamming_filter_id);
        out[i] = keep;
    }
}
