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
                int64_t full = ((int64_t)1 << s) - 1;
                int64_t a = (WIN24(seg, p) >> (24 - s - (p & 7))) & full;
                p += s;
                if (a < ((int64_t)1 << (s - 1))) a -= full;
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
