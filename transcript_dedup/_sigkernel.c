/* Native signature kernel — bit-identical C implementation of
 * signatures.compute_signature_row over a whole Arrow batch.
 *
 * Same polynomial rolling hashes, same splitmix64 finalizer, same constants
 * and operation order as the numpy path (signatures.py); all arithmetic is
 * uint64 with natural wraparound, exactly matching numpy's uint64 ops.
 * The numpy path stays as the fallback and the parity oracle
 * (tests/test_native_kernel.py pins native == compute_signature_row).
 *
 * Compiled on demand by signatures._native_lib() with
 *   gcc -O3 -march=native -shared -fPIC
 * and cached in $TMPDIR keyed on the source hash; any compile/load/parity
 * failure silently falls back to the numpy kernel.
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>
#ifdef __AVX512DQ__
#include <immintrin.h>
#endif

static const uint64_t POLY_P = 0x100000001B3ULL;   /* FNV-ish odd base */
static const uint64_t POLY_Q = 0x9E3779B97F4A7C15ULL; /* golden-ratio base */
static const uint64_t POLY_P_INV = 0xce965057aff6957bULL; /* P^-1 mod 2^64 */
static const uint64_t SIG_FILL = 0xFFFFFFFFFFFFFFFFULL;

static inline uint64_t splitmix64(uint64_t x) {
    x += 0x9E3779B97F4A7C15ULL;
    x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9ULL;
    x = (x ^ (x >> 27)) * 0x94D049BB133111EBULL;
    return x ^ (x >> 31);
}

/* sort + dedup in place (binary insertion — arrays here are the per-doc
 * sampled grams, ~n/mod elements, so O(n^2) never bites; qsort's
 * comparator-callback overhead measured ~12 us/doc on the shingle arrays
 * before it was replaced), returns unique count */
static int64_t sort_unique(uint64_t *v, int64_t n) {
    for (int64_t i = 1; i < n; i++) {
        uint64_t key = v[i];
        int64_t j = i - 1;
        while (j >= 0 && v[j] > key) { v[j + 1] = v[j]; j--; }
        v[j + 1] = key;
    }
    if (n <= 1) return n;
    int64_t u = 1;
    for (int64_t i = 1; i < n; i++)
        if (v[i] != v[u - 1]) v[u++] = v[i];
    return u;
}

/* distinct count via open-addressing (values are splitmix64 outputs, so the
 * low bits are already uniform) — replaces sort+dedup for the shingle
 * arrays, whose ORDER nothing needs: MinHash minima are duplicate-invariant,
 * only the distinct count (n_shingles) leaves the doc */
static int64_t distinct_count(const uint64_t *v, int64_t n, uint64_t *slots,
                              int64_t nslots /* power of two, >= 2n */) {
    if (n <= 1) return n;
    const uint64_t mask = (uint64_t)nslots - 1;
    memset(slots, 0, (size_t)nslots * sizeof(uint64_t));
    int64_t u = 0;
    int have_zero = 0; /* 0 marks an empty slot; count the value 0 aside */
    for (int64_t i = 0; i < n; i++) {
        uint64_t key = v[i];
        if (!key) { u += !have_zero; have_zero = 1; continue; }
        uint64_t s = key & mask;
        while (slots[s] && slots[s] != key) s = (s + 1) & mask;
        if (!slots[s]) { slots[s] = key; u++; }
    }
    return u;
}

/* Batch entry point.
 *
 * data/offs: concatenated UTF-8 bytes of ndocs docs; doc d = data[offs[d]..offs[d+1])
 * a, b: num_perm MinHash permutation params
 * shingle_k / gram_k / gram_mod: cfg.shingle_k / substring_gram_k / substring_mod
 * sig_out: ndocs*num_perm u64 (row-major); sim_out: ndocs i64;
 * nsh_out: ndocs i32 (unique shingle count)
 * gram_out/gram_cap/gram_cnt_out: flat sampled-gram hashes per doc (unique,
 *   ascending u64 order, written as the same bits i64) + per-doc counts.
 * Returns total grams needed; if > gram_cap the caller must retry with a
 * larger buffer (counts/sig/sim/nsh are still valid; gram_out is partial).
 * Returns -1 on allocation failure. */
int64_t td_sig_batch(
    const uint8_t *data, const int64_t *offs, int64_t ndocs,
    const uint64_t *a, const uint64_t *b, int64_t num_perm,
    int64_t shingle_k, int64_t gram_k, uint64_t gram_mod,
    uint64_t *sig_out, int64_t *sim_out, int32_t *nsh_out,
    int64_t *gram_out, int64_t gram_cap, int32_t *gram_cnt_out)
{
    /* scratch sized to the largest doc in the batch */
    int64_t max_len = 0;
    for (int64_t d = 0; d < ndocs; d++) {
        int64_t L = offs[d + 1] - offs[d];
        if (L > max_len) max_len = L;
    }
    /* tokens <= bytes+1; shingles <= tokens; grams <= bytes */
    uint64_t *th = malloc((size_t)(max_len + 2) * sizeof(uint64_t));
    uint64_t *sh = malloc((size_t)(max_len + 2) * sizeof(uint64_t));
    uint64_t *gr = malloc((size_t)(max_len + 2) * sizeof(uint64_t));
    int64_t nslots = 16;
    while (nslots < 2 * (max_len + 2)) nslots <<= 1;
    uint64_t *slots = malloc((size_t)nslots * sizeof(uint64_t));
    if (!th || !sh || !gr || !slots) {
        free(th); free(sh); free(gr); free(slots);
        return -1;
    }

    /* P^t for t < gram_k (direct window hashes need P^(gram_k-1)) */
    uint64_t p_pow_k1 = 1; /* P^(gram_k-1) */
    for (int64_t t = 0; t + 1 < gram_k; t++) p_pow_k1 *= POLY_P;
    const int mod_pow2 = gram_mod && ((gram_mod & (gram_mod - 1)) == 0);
    const uint64_t mod_mask = gram_mod - 1;

    int64_t gram_total = 0;

    for (int64_t d = 0; d < ndocs; d++) {
        const uint8_t *x = data + offs[d];
        const int64_t n = offs[d + 1] - offs[d];
        uint64_t *sig = sig_out + d * num_perm;
        int64_t m = 0; /* token count */

        if (n == 0) {
            for (int64_t i = 0; i < num_perm; i++) sig[i] = SIG_FILL;
            sim_out[d] = 0;
            nsh_out[d] = 0;
            gram_cnt_out[d] = 0;
            continue;
        }

        /* ---- token hashes: split on the space byte, empties kept (matches
         * the numpy boundary construction exactly) ---- */
        {
            int64_t start = 0;
            uint64_t h = 0, p = 1;
            for (int64_t i = 0; i < n; i++) {
                if (x[i] == 32) {
                    th[m++] = splitmix64(h * POLY_Q + (uint64_t)(i - start));
                    start = i + 1; h = 0; p = 1;
                } else {
                    h += (uint64_t)x[i] * p;
                    p *= POLY_P;
                }
            }
            th[m++] = splitmix64(h * POLY_Q + (uint64_t)(n - start));
        }

        /* ---- shingles: rolling combine of kk token hashes. MinHash minima
         * are duplicate-invariant, so the raw (possibly duplicated) array
         * feeds the min loop directly; only the distinct count is needed as
         * an output ---- */
        int64_t kk = shingle_k < m ? shingle_k : m;
        int64_t nsh_raw = m - kk + 1;
        for (int64_t i = 0; i < nsh_raw; i++) {
            uint64_t w = 0, q = 1;
            for (int64_t t = 0; t < kk; t++) { w += th[i + t] * q; q *= POLY_Q; }
            sh[i] = splitmix64(w);
        }
        nsh_out[d] = (int32_t)distinct_count(sh, nsh_raw, slots, nslots);

        /* ---- MinHash: per-permutation min of a*sh+b over the shingles ---- */
#ifdef __AVX512DQ__
        for (int64_t i = 0; i < num_perm; i += 8) {
            __m512i ai = _mm512_loadu_si512(a + i);
            __m512i bi = _mm512_loadu_si512(b + i);
            __m512i mn = _mm512_set1_epi64(-1); /* SIG_FILL */
            for (int64_t j = 0; j < nsh_raw; j++) {
                __m512i sj = _mm512_set1_epi64((int64_t)sh[j]);
                __m512i v = _mm512_add_epi64(_mm512_mullo_epi64(ai, sj), bi);
                mn = _mm512_min_epu64(mn, v);
            }
            _mm512_storeu_si512(sig + i, mn);
        }
        /* num_perm not a multiple of 8: redo the tail scalar (overwrites) */
        for (int64_t i = num_perm & ~7LL; i < num_perm; i++) {
            const uint64_t ai = a[i], bi = b[i];
            uint64_t mn = SIG_FILL;
            for (int64_t j = 0; j < nsh_raw; j++) {
                uint64_t v = ai * sh[j] + bi;
                if (v < mn) mn = v;
            }
            sig[i] = mn;
        }
#else
        for (int64_t i = 0; i < num_perm; i++) {
            const uint64_t ai = a[i], bi = b[i];
            uint64_t mn = SIG_FILL;
            for (int64_t j = 0; j < nsh_raw; j++) {
                uint64_t v = ai * sh[j] + bi;
                if (v < mn) mn = v;
            }
            sig[i] = mn;
        }
#endif

        /* ---- SimHash: per-bit votes over ALL token hashes. 64x64 bit
         * transpose per 64-token block, then one popcount per bit column —
         * ~8x fewer ops than the shift-and-add-per-bit loop ---- */
        {
            int64_t cnt[64];
            memset(cnt, 0, sizeof(cnt));
            uint64_t blk[64];
            for (int64_t j0 = 0; j0 < m; j0 += 64) {
                int64_t bn = m - j0 < 64 ? m - j0 : 64;
                for (int64_t j = 0; j < bn; j++) blk[j] = th[j0 + j];
                for (int64_t j = bn; j < 64; j++) blk[j] = 0;
                /* in-place 64x64 bit-matrix transpose (Hacker's Delight,
                 * fig. 7-3 generalized to 64): MSB-first column convention,
                 * so transposed row r = original column r = bit (63-r) */
                uint64_t msk = 0x00000000FFFFFFFFULL;
                for (int j = 32; j; j >>= 1, msk ^= msk << j) {
                    for (int k = 0; k < 64; k = ((k | j) + 1) & ~j) {
                        uint64_t t = (blk[k] ^ (blk[k | j] >> j)) & msk;
                        blk[k] ^= t;
                        blk[k | j] ^= (t << j);
                    }
                }
                for (int r = 0; r < 64; r++)
                    cnt[63 - r] += __builtin_popcountll(blk[r]);
            }
            uint64_t sim = 0;
            for (int bno = 0; bno < 64; bno++)
                if (2 * cnt[bno] - m > 0) sim |= (1ULL << bno);
            sim_out[d] = (int64_t)sim; /* two's-complement reinterpret */
        }

        /* ---- sampled substring grams: rolling k-byte window hash ---- */
        int64_t gcount = 0;
        if (n >= gram_k) {
            uint64_t G = 0, p = 1;
            for (int64_t t = 0; t < gram_k; t++) { G += (uint64_t)x[t] * p; p *= POLY_P; }
            for (int64_t i = 0;; i++) {
                uint64_t g = splitmix64(G);
                if (mod_pow2 ? ((g & mod_mask) == 0) : (g % gram_mod == 0))
                    gr[gcount++] = g;
                if (i + gram_k >= n) break;
                G = (G - (uint64_t)x[i]) * POLY_P_INV + (uint64_t)x[i + gram_k] * p_pow_k1;
            }
            gcount = sort_unique(gr, gcount);
        }
        gram_cnt_out[d] = (int32_t)gcount;
        if (gram_total + gcount <= gram_cap)
            memcpy(gram_out + gram_total, gr, (size_t)gcount * sizeof(uint64_t));
        gram_total += gcount;
    }

    free(th); free(sh); free(gr); free(slots);
    return gram_total;
}

/* Tiny-path pattern probe: emit (doc index, pattern index) for every raw
 * k-byte gram of each doc whose polynomial hash equals a pattern hash.
 *
 * Bit-identical to signatures.probe_gram_matches: the same POLY_P rolling
 * window hash (position-normalized, NO splitmix — the probe matches raw
 * gram hashes), the same low-bits bitmap prefilter, and an exact binary
 * search over the signed-ascending pattern array (the numpy path sorts
 * patterns as int64; comparisons here are int64 so indices agree).
 * Windows never cross doc boundaries (per-doc loop == the numpy path's
 * post-hoc boundary discard). Duplicate (doc, pattern) hits are emitted
 * raw; the Python wrapper dedups exactly like the numpy path.
 *
 * Returns the number of matches found; if > out_cap the caller must retry
 * with larger buffers (only the first out_cap are written). */
int64_t td_probe_batch(
    const uint8_t *data, const int64_t *offs, int64_t ndocs,
    int64_t gram_k,
    const int64_t *pat, int64_t npat,      /* ascending int64 order */
    const uint8_t *bitmap, uint64_t bm_mask,
    int64_t *out_doc, int64_t *out_pat, int64_t out_cap)
{
    if (npat <= 0) return 0;
    uint64_t p_pow_k1 = 1; /* P^(gram_k-1) */
    for (int64_t t = 0; t + 1 < gram_k; t++) p_pow_k1 *= POLY_P;
    int64_t nout = 0;
    for (int64_t d = 0; d < ndocs; d++) {
        const uint8_t *x = data + offs[d];
        const int64_t n = offs[d + 1] - offs[d];
        if (n < gram_k) continue;
        uint64_t G = 0, p = 1;
        for (int64_t t = 0; t < gram_k; t++) { G += (uint64_t)x[t] * p; p *= POLY_P; }
        for (int64_t i = 0;; i++) {
            if (bitmap[G & bm_mask]) {
                const int64_t g = (int64_t)G;
                int64_t lo = 0, hi = npat;
                while (lo < hi) {
                    int64_t mid = (lo + hi) >> 1;
                    if (pat[mid] < g) lo = mid + 1; else hi = mid;
                }
                if (lo < npat && pat[lo] == g) {
                    if (nout < out_cap) { out_doc[nout] = d; out_pat[nout] = lo; }
                    nout++;
                }
            }
            if (i + gram_k >= n) break;
            G = (G - (uint64_t)x[i]) * POLY_P_INV + (uint64_t)x[i + gram_k] * p_pow_k1;
        }
    }
    return nout;
}
