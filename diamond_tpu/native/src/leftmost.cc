// Left-most dedup hit verification (native twin of
// diamond_tpu/search/left_most_batch.py _verify_batch; reference
// semantics from src/search/left_most.h:31-60 verify_hit/verify_hits).
//
// Per hit, iterate the set bits of the pattern-matcher hit mask and
// verify each candidate position: under chunked search, a full shape
// match recomputes the seed from subject letters and checks its
// partition bound (set_seed failure fails the bit); then the 48-letter
// fingerprint identity count decides.  Early-exits on the first
// verified bit — the reason this runs ~50x faster than the batched
// numpy formulation, which must evaluate every bit of every hit.

#include <cstdint>

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
    for (int64_t i = 0; i < n; ++i) {
        uint64_t m = hit_bits[i];
        uint8_t v = 0;
        while (m) {
            const int bit = __builtin_ctzll(m);
            m &= m - 1;
            const int64_t qpos = qs[i] + bit;
            const int64_t spos = ss[i] + bit;
            if (chunked) {
                const uint64_t mm = match_masks[i] >> bit;
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
            if (ident >= hamming_filter_id) {
                v = 1;
                break;
            }
        }
        out[i] = v;
    }
}
