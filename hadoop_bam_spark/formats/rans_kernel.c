#include <stdint.h>
#include <stdlib.h>
#include <string.h>

/* rANS-4x8 (CRAM 3.0 spec section 13; htslib rans_static stream layout).
 * Returns 0 on success, -1 on truncated/invalid input.
 * `data`/`len` is the stream AFTER the 9-byte outer header
 * (order byte + comp size u32 + raw size u32); `out`/`n_out` is the
 * caller-allocated raw buffer. */

#define TF_SHIFT 12
#define TOTFREQ  (1 << TF_SHIFT)
#define RANS_LOW (1u << 23)

typedef struct {
    uint16_t freq[256];
    uint16_t cum[256];
    uint8_t  lookup[TOTFREQ];   /* f -> symbol */
} table_t;

/* Shared symbol-RLE frequency-table reader (the inner table of both
 * orders). Advances *pp; returns 0/-1. */
static int read_freqs(const uint8_t *data, int64_t len, int64_t *pp,
                      table_t *t) {
    int64_t p = *pp;
    int sym, last = 0, rle = 0;
    uint32_t cum = 0;
    memset(t, 0, sizeof(*t));
    if (p >= len) return -1;
    sym = data[p++];
    for (;;) {
        uint32_t f;
        if (p >= len) return -1;
        f = data[p++];
        if (f >= 128) {
            if (p >= len) return -1;
            f = ((f & 127) << 8) | data[p++];
        }
        t->freq[sym] = (uint16_t)f;
        if (rle > 0) {
            rle--;
            sym++;
            if (sym > 255) return -1;
        } else {
            last = sym;
            if (p >= len) return -1;
            sym = data[p++];
            if (sym == last + 1) {
                if (p >= len) return -1;
                rle = data[p++];
            }
        }
        if (sym == 0) break;
    }
    for (int i = 0; i < 256; i++) {
        t->cum[i] = (uint16_t)cum;
        if (t->freq[i]) {
            if (cum + t->freq[i] > TOTFREQ) return -1;
            memset(t->lookup + cum, i, t->freq[i]);
            cum += t->freq[i];
        }
    }
    *pp = p;
    return 0;
}

int rans_decode0(const uint8_t *data, int64_t len,
                 uint8_t *out, int64_t n_out) {
    table_t t;
    int64_t p = 0;
    uint32_t s[4];
    if (read_freqs(data, len, &p, &t) != 0) return -1;
    if (p + 16 > len) return -1;
    for (int j = 0; j < 4; j++) {
        s[j] = (uint32_t)data[p] | ((uint32_t)data[p + 1] << 8)
             | ((uint32_t)data[p + 2] << 16) | ((uint32_t)data[p + 3] << 24);
        p += 4;
    }
    for (int64_t i = 0; i < n_out; i++) {
        uint32_t x = s[i & 3];
        uint32_t f = x & (TOTFREQ - 1);
        uint8_t sym = t.lookup[f];
        out[i] = sym;
        x = t.freq[sym] * (x >> TF_SHIFT) + f - t.cum[sym];
        while (x < RANS_LOW) {
            if (p >= len) return -1;
            x = (x << 8) | data[p++];
        }
        s[i & 3] = x;
    }
    return 0;
}

static int rans_decode1_inner(const uint8_t *data, int64_t len,
                              uint8_t *out, int64_t n_out,
                              table_t *tabs, uint8_t *have) {
    /* per-context tables; contexts RLE-compressed like symbols */
    int64_t p = 0;
    int ctx, last = 0, rle = 0;
    uint32_t s[4];
    if (p >= len) return -1;
    ctx = data[p++];
    for (;;) {
        if (read_freqs(data, len, &p, &tabs[ctx]) != 0) return -1;
        have[ctx] = 1;
        if (rle > 0) {
            rle--;
            ctx++;
            if (ctx > 255) return -1;
        } else {
            last = ctx;
            if (p >= len) return -1;
            ctx = data[p++];
            if (ctx == last + 1) {
                if (p >= len) return -1;
                rle = data[p++];
            }
        }
        if (ctx == 0) break;
    }
    if (p + 16 > len) return -1;
    for (int j = 0; j < 4; j++) {
        s[j] = (uint32_t)data[p] | ((uint32_t)data[p + 1] << 8)
             | ((uint32_t)data[p + 2] << 16) | ((uint32_t)data[p + 3] << 24);
        p += 4;
    }
    int64_t q = n_out >> 2;
    int64_t ptrs[4] = {0, q, 2 * q, 3 * q};
    int ctxs[4] = {0, 0, 0, 0};
    int have0 = have[0];
    for (int64_t i = 0; i < q; i++) {
        for (int j = 0; j < 4; j++) {
            int c = ctxs[j];
            if (!have[c]) {
                /* unseen context falls back to ctx-0 (scalar parity:
                 * `freqs[ctx] or freqs[0]`); no ctx-0 table either ->
                 * malformed stream, error like the Python KeyError */
                if (!have0) return -1;
                c = 0;
            }
            table_t *t = &tabs[c];
            uint32_t x = s[j];
            uint32_t f = x & (TOTFREQ - 1);
            uint8_t sym = t->lookup[f];
            out[ptrs[j]++] = sym;
            x = t->freq[sym] * (x >> TF_SHIFT) + f - t->cum[sym];
            while (x < RANS_LOW) {
                if (p >= len) return -1;
                x = (x << 8) | data[p++];
            }
            s[j] = x;
            ctxs[j] = sym;
        }
    }
    /* ragged tail carried by state 3; renorm only while input remains
     * (final symbols of a well-formed stream need none) */
    {
        uint32_t x = s[3];
        int c3 = ctxs[3];
        for (int64_t i = 4 * q; i < n_out; i++) {
            int c = c3;
            if (!have[c]) {
                if (!have0) return -1;
                c = 0;
            }
            table_t *t = &tabs[c];
            uint32_t f = x & (TOTFREQ - 1);
            uint8_t sym = t->lookup[f];
            out[i] = sym;
            x = t->freq[sym] * (x >> TF_SHIFT) + f - t->cum[sym];
            while (x < RANS_LOW && p < len)
                x = (x << 8) | data[p++];
            c3 = sym;
        }
    }
    return 0;
}

/* ---- encode-side state walks (r11) -------------------------------------
 * The Python encoder (formats/rans.py) keeps ALL format decisions —
 * frequency quantization, table serialization, header — and these
 * kernels perform only the mechanical reverse state walk with the
 * tables Python computed, so native and pure-Python streams are
 * byte-identical by construction. `rev` receives renorm bytes in
 * EMISSION order (the caller reverses once); returns the byte count,
 * or -1 if it would overflow `rev_cap`. freq/cum are uint16[256]
 * (order-0) or uint16[256*256] ctx-major (order-1), summing to 4096
 * per (context) table for every symbol that occurs. */

int64_t rans_encode0_walk(const uint8_t *data, int64_t n,
                          const uint16_t *freq, const uint16_t *cum,
                          uint8_t *rev, int64_t rev_cap,
                          uint32_t *states_out) {
    uint32_t s[4] = {RANS_LOW, RANS_LOW, RANS_LOW, RANS_LOW};
    int64_t k = 0;
    for (int64_t i = n - 1; i >= 0; i--) {
        int j = (int)(i & 3);
        uint32_t f = freq[data[i]];
        if (f == 0) return -1;  /* inconsistent table: a SIGFPE here
                                 * would kill the executor; the Python
                                 * walk raises instead */
        uint32_t xm = ((RANS_LOW >> TF_SHIFT) << 8) * f;
        uint32_t x = s[j];
        while (x >= xm) {
            if (k >= rev_cap) return -1;
            rev[k++] = (uint8_t)(x & 0xFF);
            x >>= 8;
        }
        s[j] = ((x / f) << TF_SHIFT) + (x % f) + cum[data[i]];
    }
    for (int j = 0; j < 4; j++) states_out[j] = s[j];
    return k;
}

int64_t rans_encode1_walk(const uint8_t *data, int64_t n,
                          const uint16_t *freq, const uint16_t *cum,
                          uint8_t *rev, int64_t rev_cap,
                          uint32_t *states_out) {
    uint32_t s[4] = {RANS_LOW, RANS_LOW, RANS_LOW, RANS_LOW};
    int64_t k = 0;
    int64_t q = n >> 2;
    /* reverse of the decoder's consumption order: ragged tail first
     * (state 3), then the interleaved main loop i = q-1..0, j = 3..0;
     * a symbol's context is the previous byte of its quarter, 0 at
     * quarter starts (positions 0, q, 2q, 3q) */
    for (int64_t p = n - 1; p >= 4 * q; p--) {
        int ctx = (p == 0) ? 0 : data[p - 1];
        uint32_t f = freq[ctx * 256 + data[p]];
        if (f == 0) return -1;
        uint32_t xm = ((RANS_LOW >> TF_SHIFT) << 8) * f;
        uint32_t x = s[3];
        while (x >= xm) {
            if (k >= rev_cap) return -1;
            rev[k++] = (uint8_t)(x & 0xFF);
            x >>= 8;
        }
        s[3] = ((x / f) << TF_SHIFT) + (x % f) + cum[ctx * 256 + data[p]];
    }
    for (int64_t i = q - 1; i >= 0; i--) {
        for (int j = 3; j >= 0; j--) {
            int64_t p = (int64_t)j * q + i;
            int ctx = (i == 0) ? 0 : data[p - 1];
            uint32_t f = freq[ctx * 256 + data[p]];
            if (f == 0) return -1;
            uint32_t xm = ((RANS_LOW >> TF_SHIFT) << 8) * f;
            uint32_t x = s[j];
            while (x >= xm) {
                if (k >= rev_cap) return -1;
                rev[k++] = (uint8_t)(x & 0xFF);
                x >>= 8;
            }
            s[j] = ((x / f) << TF_SHIFT) + (x % f)
                 + cum[ctx * 256 + data[p]];
        }
    }
    for (int j = 0; j < 4; j++) states_out[j] = s[j];
    return k;
}

int rans_decode1(const uint8_t *data, int64_t len,
                 uint8_t *out, int64_t n_out) {
    /* Tables are heap-allocated (1.2 MB): too big for the stack, and
     * TLS in a dlopen'd lib is allocator-dependent. calloc, not malloc:
     * a malformed stream may reference a table the have[] fallback
     * didn't guard in an earlier revision — zeroed tables decode
     * deterministically (and the have0 check above errors first). */
    table_t *tabs = (table_t *)calloc(256, sizeof(table_t));
    uint8_t have[256];
    int rc;
    if (!tabs) return -1;
    memset(have, 0, sizeof(have));
    rc = rans_decode1_inner(data, len, out, n_out, tabs, have);
    free(tabs);
    return rc;
}
