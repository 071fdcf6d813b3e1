/* COCO-compatible run-length codec for binary masks.
 *
 * TPU-native rebuild of the reference's pycocotools.mask.encode/decode
 * dependency (src/nuscenes/gen_2d_masks_detic.py:471,
 * src/nuscenes/2d_to_3d.py:425). RLE is host I/O work, not TPU work
 * (SURVEY.md §2.2), so it lives in C feeding device buffers.
 *
 * Wire format (identical to the public COCO API):
 *   - column-major (Fortran) scan of an h x w uint8 mask,
 *   - alternating run counts starting with the zero-run,
 *   - counts delta-coded against count[i-2] for i >= 2,
 *   - each value emitted as little-endian 5-bit groups with a continuation
 *     bit, biased by 48 into printable ASCII.
 *
 * Built with: cc -O3 -shared -fPIC rle.c -o librle.so (see native/__init__.py)
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

/* Encode alternating run counts of a Fortran-order mask.
 * mask: h*w bytes, column-major. out_counts: caller-allocated, capacity
 * h*w+1 entries. Returns number of counts. */
long rle_runs_encode(const uint8_t *mask, long h, long w, uint32_t *out_counts) {
    long n = h * w;
    long m = 0;
    uint32_t cnt = 0;
    uint8_t prev = 0; /* runs start with zeros */
    for (long i = 0; i < n; i++) {
        uint8_t v = mask[i] ? 1 : 0;
        if (v != prev) {
            out_counts[m++] = cnt;
            cnt = 0;
            prev = v;
        }
        cnt++;
    }
    out_counts[m++] = cnt;
    return m;
}

/* Decode run counts into a Fortran-order mask buffer of h*w bytes. */
void rle_runs_decode(const uint32_t *counts, long m, uint8_t *mask, long n) {
    long pos = 0;
    uint8_t v = 0;
    for (long i = 0; i < m && pos < n; i++) {
        uint32_t c = counts[i];
        if ((long)c > n - pos) c = (uint32_t)(n - pos);
        memset(mask + pos, v, c);
        pos += c;
        v = !v;
    }
}

/* Compress counts to the COCO ASCII string. out capacity must be >=
 * m * 7 + 1. Returns string length. */
long rle_string_encode(const uint32_t *counts, long m, char *out) {
    long p = 0;
    for (long i = 0; i < m; i++) {
        int64_t x = (int64_t)counts[i];
        if (i > 2) x -= (int64_t)counts[i - 2];
        int more = 1;
        while (more) {
            int64_t c = x & 0x1f;
            x >>= 5;
            more = (c & 0x10) ? (x != -1) : (x != 0);
            if (more) c |= 0x20;
            out[p++] = (char)(c + 48);
        }
    }
    out[p] = 0;
    return p;
}

/* Decompress the COCO ASCII string. out_counts capacity: strlen(s) entries
 * is always enough. Returns number of counts. */
long rle_string_decode(const char *s, long slen, uint32_t *out_counts) {
    long m = 0;
    long p = 0;
    while (p < slen) {
        int64_t x = 0;
        int k = 0;
        int more = 1;
        while (more && p < slen) {
            int64_t c = (int64_t)(s[p++]) - 48;
            x |= (c & 0x1f) << (5 * k);
            more = (int)(c & 0x20);
            k++;
            if (!more && (c & 0x10)) x |= (int64_t)(-1) << (5 * k);
        }
        if (m > 2) x += (int64_t)out_counts[m - 2];
        out_counts[m++] = (uint32_t)x;
    }
    return m;
}

/* ---- packed bit-plane -> RLE encode (the mask-stage write hot path) ----
 *
 * Input: Y-MAJOR bit-planes [H, W, mw] uint32 — bit mask_idx%32 of word
 * (y*W + x)*mw + mask_idx/32. COCO counts scan the [W, H] mask in Fortran
 * order (x fastest, then y), which in this layout is a fully SEQUENTIAL
 * memory walk. (The lift-side [W, H, mw] layout scans with a 9 KB stride
 * per pixel — measured 10x slower; callers transpose or ask the device for
 * y-major planes.) Unpacking 128 dense masks and re-scanning them
 * dominated host time (~760 ms/keyframe measured); these two single-pass
 * functions encode ALL masks straight from the planes by tracking per-mask
 * run starts and emitting only on bit CHANGES (XOR with the previous
 * pixel's words), so per-pixel work is O(mw) + O(#flips).
 *
 * Pass 1: count runs per mask (exact allocation).
 * Pass 2: fill per-mask count arrays at caller-provided offsets.
 */

/* Pass 1: out_m[mask] = number of RLE counts for that mask. */
void rle_packed_count_runs(const uint32_t *words, long W, long H, long mw,
                           long n_masks, uint32_t *out_m) {
    long n_words_mask = (n_masks + 31) / 32;
    if (n_words_mask > mw) n_words_mask = mw;
    if (n_words_mask > 64) n_words_mask = 64; /* prev[] capacity */
    uint32_t *flips = (uint32_t *)calloc((size_t)n_masks, sizeof(uint32_t));
    uint32_t prev[64] = {0};
    const long n = W * H;
    for (long f = 0; f < n; f++) {
        const uint32_t *cur = words + (size_t)f * mw;
        for (long wo = 0; wo < n_words_mask; wo++) {
            uint32_t d = cur[wo] ^ prev[wo];
            prev[wo] = cur[wo];
            while (d) {
                int b = __builtin_ctz(d);
                d &= d - 1;
                long m = wo * 32 + b;
                if (m < n_masks) flips[m]++;
            }
        }
    }
    /* every flip emits one count, plus the trailing run to pixel n */
    for (long m = 0; m < n_masks; m++) out_m[m] = flips[m] + 1;
    free(flips);
}

/* Pass 2: fill counts. offsets[m] = start index into counts_buf for mask m
 * (capacity out_m[m] from pass 1). Returns 0. */
long rle_packed_fill_runs(const uint32_t *words, long W, long H, long mw,
                          long n_masks, const int64_t *offsets,
                          uint32_t *counts_buf) {
    long n_words_mask = (n_masks + 31) / 32;
    if (n_words_mask > mw) n_words_mask = mw;
    if (n_words_mask > 64) n_words_mask = 64; /* prev[] capacity */
    int64_t *wpos = (int64_t *)malloc((size_t)n_masks * sizeof(int64_t));
    int64_t *start = (int64_t *)calloc((size_t)n_masks, sizeof(int64_t));
    for (long m = 0; m < n_masks; m++) wpos[m] = offsets[m];
    uint32_t prev[64] = {0};
    const long n = W * H;
    for (long f = 0; f < n; f++) {
        const uint32_t *cur = words + (size_t)f * mw;
        for (long wo = 0; wo < n_words_mask; wo++) {
            uint32_t d = cur[wo] ^ prev[wo];
            prev[wo] = cur[wo];
            while (d) {
                int b = __builtin_ctz(d);
                d &= d - 1;
                long m = wo * 32 + b;
                if (m < n_masks) {
                    counts_buf[wpos[m]++] = (uint32_t)(f - start[m]);
                    start[m] = f;
                }
            }
        }
    }
    for (long m = 0; m < n_masks; m++)
        counts_buf[wpos[m]++] = (uint32_t)(n - start[m]);
    free(wpos);
    free(start);
    return 0;
}

/* Decode a compressed RLE string DIRECTLY into packed uint32 bit-planes,
 * skipping the dense mask entirely (the dense->pack path dominates host
 * time at production scale). The RLE covers an [h, w] Fortran-order mask
 * (h = mask W, w = mask H in the artifact layout); bit `mask_idx % 32` of
 * word (row * w + col) * mw + mask_idx / 32 is set for every 1-run pixel.
 * Returns the number of pixels set. */
long rle_decode_packed(const char *s, long slen, long h, long w,
                       long mask_idx, uint32_t *words, long mw) {
    const uint32_t bit = (uint32_t)1 << (mask_idx & 31);
    const long word_off = mask_idx >> 5;
    long m = 0;
    long pos = 0;
    const long n = h * w;
    uint8_t v = 0;
    long total = 0;
    long p = 0;
    long prev2 = 0, prev1 = 0; /* counts[i-2], counts[i-1] */
    long idx_count = 0;
    while (p < slen && pos < n) {
        int64_t x = 0;
        int k = 0;
        int more = 1;
        while (more && p < slen) {
            int64_t c = (int64_t)(s[p++]) - 48;
            x |= (c & 0x1f) << (5 * k);
            more = (int)(c & 0x20);
            k++;
            if (!more && (c & 0x10)) x |= (int64_t)(-1) << (5 * k);
        }
        if (idx_count > 2) x += prev2;
        prev2 = prev1;
        prev1 = x;
        idx_count++;
        long cnt = (long)x;
        if (cnt > n - pos) cnt = n - pos;
        if (v) {
            for (long f = pos; f < pos + cnt; f++) {
                const long row = f % h;
                const long col = f / h;
                words[(row * w + col) * mw + word_off] |= bit;
            }
            total += cnt;
        }
        pos += cnt;
        v = !v;
        (void)m;
    }
    return total;
}
