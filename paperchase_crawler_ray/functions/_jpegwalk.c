/* Sequential baseline-JPEG Huffman walk — C twin of the pure-Python
 * loop in jpeg.py:jpeg_decode (kept there as the portable fallback and
 * the behavioral spec; tests assert bit-identical outputs). One call
 * decodes ONE entropy segment (DC predictors reset per segment, per
 * T.81 restart semantics).
 *
 * Compiled on demand by cwalk.py with the system toolchain; no
 * third-party dependency. Control flow mirrors the Python walk
 * EXACTLY, including its truncation behavior: a DC amplitude read that
 * would cross nbits aborts the component loop (block counter still
 * advances), an AC read that would cross nbits ends that block's AC
 * list, and an unknown code prefix returns -1 (caller raises).
 *
 * seg must carry >= 10 bytes of 0xFF padding beyond nbytes (same
 * contract as the Python side's _trips24) so window reads just past a
 * truncated tail stay in bounds.
 */
#include <stdint.h>

#define WIN16(seg, p) ((int32_t)((((uint32_t)(seg)[(p) >> 3] << 16) | \
    ((uint32_t)(seg)[((p) >> 3) + 1] << 8) | \
    (uint32_t)(seg)[((p) >> 3) + 2]) >> (8 - ((p) & 7))) & 0xFFFF)

#define WIN24(seg, p) ((int64_t)(((uint32_t)(seg)[(p) >> 3] << 16) | \
    ((uint32_t)(seg)[((p) >> 3) + 1] << 8) | \
    (uint32_t)(seg)[((p) >> 3) + 2]))

int64_t pc_jpeg_walk(const uint8_t *seg, int64_t nbits,
                     int64_t nb, int64_t b0, int32_t ncomp,
                     const int16_t *sym_tabs, const uint8_t *len_tabs,
                     const int32_t *comp_dc, const int32_t *comp_ac,
                     int64_t *out_idx, int64_t *out_val,
                     int64_t *out_b)
{
    int64_t prev[8] = {0};
    int64_t p = 0, b = b0, n = 0;
    while (b < nb && p < nbits) {
        for (int32_t ci = 0; ci < ncomp; ci++) {
            const int16_t *dsym = sym_tabs + (int64_t)comp_dc[ci] * 65536;
            const uint8_t *dlen = len_tabs + (int64_t)comp_dc[ci] * 65536;
            const int16_t *asym = sym_tabs + (int64_t)comp_ac[ci] * 65536;
            const uint8_t *alen = len_tabs + (int64_t)comp_ac[ci] * 65536;
            int32_t t = WIN16(seg, p);
            int32_t s = dsym[t];
            int32_t L = dlen[t];
            if (L == 0) return -1;
            p += L;
            if (s) {
                if (p >= nbits) break;      /* mirrors the Python break */
                int64_t full = ((int64_t)1 << s) - 1;
                int64_t a = (WIN24(seg, p) >> (24 - s - (p & 7))) & full;
                p += s;
                if (a < ((int64_t)1 << (s - 1))) a -= full;
                prev[ci] += a;
            }
            int64_t base = (b * ncomp + ci) << 6;
            out_idx[n] = base;
            out_val[n] = prev[ci];
            n++;
            int32_t k = 1;
            while (k < 64) {
                if (p >= nbits) break;
                t = WIN16(seg, p);
                int32_t sym = asym[t];
                L = alen[t];
                if (L == 0) return -1;
                p += L;
                if (sym == 0x00) break;              /* EOB */
                if (sym == 0xF0) { k += 16; continue; } /* ZRL */
                k += sym >> 4;
                s = sym & 0x0F;
                if (k >= 64) return -2;              /* AC run overflow */
                int64_t a = 0;
                if (s) {   /* nonstandard run>0,size=0 symbols: a == 0
                              (mirrors the Python walk; also avoids the
                              1 << -1 UB) */
                    int64_t full = ((int64_t)1 << s) - 1;
                    a = (WIN24(seg, p) >> (24 - s - (p & 7))) & full;
                    p += s;
                    if (a < ((int64_t)1 << (s - 1))) a -= full;
                }
                out_idx[n] = base | k;
                out_val[n] = a;
                n++;
                k++;
            }
        }
        b++;
    }
    *out_b = b;
    return n;
}

/* Entropy-encode one interleaved 4:4:4 scan — C twin of
 * jpeg.py:_encode_scan + _pack_fields for this encoder's FLAT-LENGTH
 * canonical tables (DC codeword == size category, 4 bits; AC codeword
 * == index in _AC_SYMBOLS, 8 bits). Emits T.81 F.1.2.3 1-padding and
 * FF00 byte stuffing inline. A is the interleaved (nb*ncomp, 64)
 * zigzag coefficient table. Returns bytes written. out must hold at
 * least n*64*4 bytes. */
static inline int32_t pc_bitlen(int64_t v)
{
    int32_t s = 0;
    while (v) { s++; v >>= 1; }
    return s;
}

int64_t pc_jpeg_pack(const int64_t *A, int64_t n, int32_t ncomp,
                     uint8_t *out, int64_t cap)
{
    uint64_t acc = 0;      /* bit accumulator, MSB-first */
    int32_t nacc = 0;
    int64_t w = 0;
#define EMIT(code, len) do { \
    acc = (acc << (len)) | ((uint64_t)(code) & ((1ULL << (len)) - 1)); \
    nacc += (len); \
    while (nacc >= 8) { \
        uint8_t byte = (uint8_t)(acc >> (nacc - 8)); \
        if (w + 2 > cap) return -3;   /* caller buffer too small */ \
        out[w++] = byte; \
        if (byte == 0xFF) out[w++] = 0x00; \
        nacc -= 8; \
    } \
} while (0)

    for (int64_t i = 0; i < n; i++) {
        const int64_t *row = A + i * 64;
        int64_t diff = row[0] - (i >= ncomp ? (A + (i - ncomp) * 64)[0] : 0);
        int32_t s = pc_bitlen(diff < 0 ? -diff : diff);
        EMIT(s, 4);
        if (s) {
            int64_t amp = diff >= 0 ? diff : diff + (((int64_t)1 << s) - 1);
            EMIT(amp, s);
        }
        int32_t run = 0;
        for (int32_t k = 1; k < 64; k++) {
            int64_t v = row[k];
            if (v == 0) { run++; continue; }
            while (run >= 16) { EMIT(1, 8); run -= 16; }
            s = pc_bitlen(v < 0 ? -v : v);   /* v != 0 here, so s >= 1 */
            EMIT(2 + run * 10 + (s - 1), 8);
            int64_t amp = v >= 0 ? v : v + (((int64_t)1 << s) - 1);
            EMIT(amp, s);
            run = 0;
        }
        if (row[63] == 0) EMIT(0, 8);        /* EOB */
    }
    if (nacc) {                              /* 1-pad the final byte */
        uint8_t byte = (uint8_t)((acc << (8 - nacc)) | ((1U << (8 - nacc)) - 1));
        if (w + 2 > cap) return -3;   /* same guard as EMIT: the pad may
                                         write 2 bytes (0xFF stuffing) */
        out[w++] = byte;
        if (byte == 0xFF) out[w++] = 0x00;
    }
#undef EMIT
    return w;
}
