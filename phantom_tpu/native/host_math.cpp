// Native host-math core: 64-bit modular arithmetic, Miller-Rabin prime
// search, NTT twiddle-table generation, Blake2b.
//
// TPU-native equivalent of the reference's C++ host layer
// (include/host/uintarithsmallmod.h, src/host/numth.cu:129-249,
// src/host/ntt.cu, src/host/blake2b.cu): the precompute that feeds device
// constant buffers.  Exposed as a plain C ABI consumed via ctypes
// (phantom_tpu/native/__init__.py); pure-Python fallbacks remain in
// phantom_tpu/host/ for environments without a compiler.
//
// Build: cc -O2 -shared -fPIC host_math.cpp -o libphantom_host.so

#include <cstdint>
#include <cstring>
#include <initializer_list>

extern "C" {

typedef unsigned __int128 u128;

// ---- small-modulus arithmetic -------------------------------------------

static inline uint64_t mulmod(uint64_t a, uint64_t b, uint64_t q) {
    return (uint64_t)((u128)a * b % q);
}

uint64_t pt_powmod(uint64_t base, uint64_t exp, uint64_t q) {
    uint64_t r = 1 % q;
    base %= q;
    while (exp) {
        if (exp & 1) r = mulmod(r, base, q);
        base = mulmod(base, base, q);
        exp >>= 1;
    }
    return r;
}

uint64_t pt_compute_shoup(uint64_t value, uint64_t q) {
    return (uint64_t)(((u128)value << 64) / q);
}

// ---- Miller-Rabin primality (deterministic for 64-bit) ------------------

static const uint64_t kWitnesses[] = {2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37};

int pt_is_prime(uint64_t n) {
    if (n < 2) return 0;
    for (uint64_t p : {2ull, 3ull, 5ull, 7ull, 11ull, 13ull, 17ull, 19ull,
                       23ull, 29ull, 31ull, 37ull}) {
        if (n == p) return 1;
        if (n % p == 0) return 0;
    }
    uint64_t d = n - 1;
    int r = 0;
    while ((d & 1) == 0) { d >>= 1; r++; }
    for (uint64_t a : kWitnesses) {
        uint64_t x = pt_powmod(a, d, n);
        if (x == 1 || x == n - 1) continue;
        int ok = 0;
        for (int i = 0; i < r - 1; i++) {
            x = mulmod(x, x, n);
            if (x == n - 1) { ok = 1; break; }
        }
        if (!ok) return 0;
    }
    return 1;
}

// Find `count` primes p == 1 (mod factor) with bit length == bit_size,
// searching downward from 2^bit_size.  Returns number found.
// (reference: get_primes, src/host/numth.cu:207)
int pt_get_primes(uint64_t factor, int bit_size, int count, uint64_t *out) {
    uint64_t value = (1ULL << bit_size) - 1;
    value -= (value - 1) % factor;
    int found = 0;
    while (found < count && (value >> (bit_size - 1)) == 1) {
        if (pt_is_prime(value)) out[found++] = value;
        if (value < factor) break;
        value -= factor;
    }
    return found;
}

int pt_get_primes_below(uint64_t upper, uint64_t factor, int count,
                        uint64_t *out) {
    uint64_t value = upper - 1;
    value -= (value - 1) % factor;
    int found = 0;
    while (found < count && value > factor) {
        if (pt_is_prime(value)) out[found++] = value;
        value -= factor;
    }
    return found;
}

// ---- NTT twiddle tables --------------------------------------------------

static inline uint32_t bitrev(uint32_t x, int bits) {
    uint32_t r = 0;
    for (int i = 0; i < bits; i++) { r = (r << 1) | (x & 1); x >>= 1; }
    return r;
}

// Fill root_powers[i] = psi^{bitrev(i)} and shoup words; same for inverse.
// psi must be a primitive 2n-th root of unity mod q.
// (reference: host NTT table init, src/host/ntt.cu)
void pt_fill_ntt_tables(uint64_t q, uint64_t psi, uint64_t psi_inv, int logn,
                        uint64_t *root_powers, uint64_t *root_shoup,
                        uint64_t *inv_root_powers, uint64_t *inv_root_shoup) {
    const uint64_t n = 1ULL << logn;
    uint64_t p = 1, pi = 1;
    for (uint64_t i = 0; i < n; i++) {
        uint32_t r = bitrev((uint32_t)i, logn);
        root_powers[r] = p;
        root_shoup[r] = pt_compute_shoup(p, q);
        inv_root_powers[r] = pi;
        inv_root_shoup[r] = pt_compute_shoup(pi, q);
        p = mulmod(p, psi, q);
        pi = mulmod(pi, psi_inv, q);
    }
}

// ---- Blake2b (RFC 7693) --------------------------------------------------
// (reference heritage: src/host/blake2b.cu; used for parameter hashing)

static const uint64_t blake2b_iv[8] = {
    0x6a09e667f3bcc908ULL, 0xbb67ae8584caa73bULL, 0x3c6ef372fe94f82bULL,
    0xa54ff53a5f1d36f1ULL, 0x510e527fade682d1ULL, 0x9b05688c2b3e6c1fULL,
    0x1f83d9abfb41bd6bULL, 0x5be0cd19137e2179ULL};

static const uint8_t blake2b_sigma[12][16] = {
    {0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15},
    {14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3},
    {11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4},
    {7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8},
    {9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13},
    {2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9},
    {12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11},
    {13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10},
    {6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5},
    {10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0},
    {0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15},
    {14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3}};

static inline uint64_t rotr64(uint64_t x, int n) {
    return (x >> n) | (x << (64 - n));
}

static void blake2b_compress(uint64_t h[8], const uint8_t block[128],
                             uint64_t t, int last) {
    uint64_t m[16], v[16];
    memcpy(m, block, 128);
    for (int i = 0; i < 8; i++) v[i] = h[i];
    for (int i = 0; i < 8; i++) v[i + 8] = blake2b_iv[i];
    v[12] ^= t;
    if (last) v[14] = ~v[14];
#define G(a, b, c, d, x, y)                                    \
    v[a] += v[b] + x; v[d] = rotr64(v[d] ^ v[a], 32);          \
    v[c] += v[d];     v[b] = rotr64(v[b] ^ v[c], 24);          \
    v[a] += v[b] + y; v[d] = rotr64(v[d] ^ v[a], 16);          \
    v[c] += v[d];     v[b] = rotr64(v[b] ^ v[c], 63);
    for (int r = 0; r < 12; r++) {
        const uint8_t *s = blake2b_sigma[r];
        G(0, 4, 8, 12, m[s[0]], m[s[1]]);
        G(1, 5, 9, 13, m[s[2]], m[s[3]]);
        G(2, 6, 10, 14, m[s[4]], m[s[5]]);
        G(3, 7, 11, 15, m[s[6]], m[s[7]]);
        G(0, 5, 10, 15, m[s[8]], m[s[9]]);
        G(1, 6, 11, 12, m[s[10]], m[s[11]]);
        G(2, 7, 8, 13, m[s[12]], m[s[13]]);
        G(3, 4, 9, 14, m[s[14]], m[s[15]]);
    }
#undef G
    for (int i = 0; i < 8; i++) h[i] ^= v[i] ^ v[i + 8];
}

// ---- Phantom-variant Salsa20 + reference samplers ------------------------
// The reference generates all device randomness with a nonstandard Salsa20
// core (src/prng.cu:17-133): key words at state positions 0-7/10-15 (56
// bytes of the 64-byte seed), a per-element 64-bit nonce at words 8-9, no
// sigma constants, no block counter.  This native path accelerates the
// seed-compressed wire-format load (regenerating c1 needs one block per 8
// coefficients per limb — utils/salsa20.py is the bit-exact numpy oracle).

static inline uint32_t rotl32(uint32_t x, int c) {
    return (x << c) | (x >> (32 - c));
}

static void phantom_salsa20_block(const uint32_t kw[14], uint64_t nonce,
                                  uint32_t out[16]) {
    uint32_t j[16], x[16];
    for (int w = 0; w < 8; w++) j[w] = kw[w];
    j[8] = (uint32_t)nonce;
    j[9] = (uint32_t)(nonce >> 32);
    for (int w = 8; w < 14; w++) j[w + 2] = kw[w];
    memcpy(x, j, sizeof(j));
    for (int r = 0; r < 10; r++) {
        // column rounds (same quarter-round schedule as prng.cu:63-97)
        x[4] ^= rotl32(x[0] + x[12], 7);
        x[8] ^= rotl32(x[4] + x[0], 9);
        x[12] ^= rotl32(x[8] + x[4], 13);
        x[0] ^= rotl32(x[12] + x[8], 18);
        x[9] ^= rotl32(x[5] + x[1], 7);
        x[13] ^= rotl32(x[9] + x[5], 9);
        x[1] ^= rotl32(x[13] + x[9], 13);
        x[5] ^= rotl32(x[1] + x[13], 18);
        x[14] ^= rotl32(x[10] + x[6], 7);
        x[2] ^= rotl32(x[14] + x[10], 9);
        x[6] ^= rotl32(x[2] + x[14], 13);
        x[10] ^= rotl32(x[6] + x[2], 18);
        x[3] ^= rotl32(x[15] + x[11], 7);
        x[7] ^= rotl32(x[3] + x[15], 9);
        x[11] ^= rotl32(x[7] + x[3], 13);
        x[15] ^= rotl32(x[11] + x[7], 18);
        // row rounds
        x[1] ^= rotl32(x[0] + x[3], 7);
        x[2] ^= rotl32(x[1] + x[0], 9);
        x[3] ^= rotl32(x[2] + x[1], 13);
        x[0] ^= rotl32(x[3] + x[2], 18);
        x[6] ^= rotl32(x[5] + x[4], 7);
        x[7] ^= rotl32(x[6] + x[5], 9);
        x[4] ^= rotl32(x[7] + x[6], 13);
        x[5] ^= rotl32(x[4] + x[7], 18);
        x[11] ^= rotl32(x[10] + x[9], 7);
        x[8] ^= rotl32(x[11] + x[10], 9);
        x[9] ^= rotl32(x[8] + x[11], 13);
        x[10] ^= rotl32(x[9] + x[8], 18);
        x[12] ^= rotl32(x[15] + x[14], 7);
        x[13] ^= rotl32(x[12] + x[15], 9);
        x[14] ^= rotl32(x[13] + x[12], 13);
        x[15] ^= rotl32(x[14] + x[13], 18);
    }
    for (int w = 0; w < 16; w++) out[w] = x[w] + j[w];
}

// One 64-byte keystream block per nonce; out is m*64 bytes (LE words).
void pt_salsa20_blocks(const uint8_t *seed56, const uint64_t *nonces,
                       uint64_t m, uint8_t *out) {
    uint32_t kw[14];
    memcpy(kw, seed56, 56);
    for (uint64_t i = 0; i < m; i++) {
        uint32_t blk[16];
        phantom_salsa20_block(kw, nonces[i], blk);
        memcpy(out + i * 64, blk, 64);
    }
}

// Reference sample_uniform_poly (prng.cu:174-205): one block per 8
// coefficients per limb, rejection sampling above the largest exact
// multiple of q, retry nonce stride = n * num_l.  Bit-exact vs
// utils/salsa20.py:sample_uniform_ref.  out is (num_l, n) uint64.
void pt_sample_uniform(const uint8_t *seed56, const uint64_t *qs, int num_l,
                       uint64_t n, uint64_t *out) {
    uint32_t kw[14];
    memcpy(kw, seed56, 56);
    const uint64_t groups = n >> 3;
    const uint64_t stride = n * (uint64_t)num_l;
    const uint64_t max_random = ~0ULL;
    for (int li = 0; li < num_l; li++) {
        const uint64_t q = qs[li];
        const uint64_t max_multiple = max_random - (max_random % q) - 1;
        for (uint64_t g = 0; g < groups; g++) {
            const uint64_t tid = (uint64_t)li * groups + g;
            uint64_t vals[8];
            uint32_t blk[16];
            phantom_salsa20_block(kw, tid, blk);
            memcpy(vals, blk, 64);
            uint64_t tries = 1;
            for (;;) {
                int first_bad = -1;
                for (int k = 0; k < 8; k++)
                    if (vals[k] > max_multiple) { first_bad = k; break; }
                if (first_bad < 0) break;
                // a rejected lane regenerates the whole block at nonce
                // tid + tries*stride; that lane and every later lane take
                // the fresh block (prng.cu:194-199 semantics)
                uint64_t nv[8];
                phantom_salsa20_block(kw, tid + tries * stride, blk);
                memcpy(nv, blk, 64);
                for (int k = first_bad; k < 8; k++) vals[k] = nv[k];
                tries++;
            }
            uint64_t *dst = out + (uint64_t)li * n + g * 8;
            for (int k = 0; k < 8; k++) dst[k] = vals[k] % q;
        }
    }
}

// Reference sample_ternary_poly (prng.cu:142-163): one block per
// coefficient, value = first keystream byte % 3 - 1, same ternary vector
// across limbs, mapped into [0, q).  out is (num_l, n) uint64.
void pt_sample_ternary(const uint8_t *seed56, const uint64_t *qs, int num_l,
                       uint64_t n, uint64_t *out) {
    uint32_t kw[14];
    memcpy(kw, seed56, 56);
    for (uint64_t i = 0; i < n; i++) {
        uint32_t blk[16];
        phantom_salsa20_block(kw, i, blk);
        const int v = (int)((uint8_t)blk[0] % 3) - 1;
        for (int li = 0; li < num_l; li++)
            out[(uint64_t)li * n + i] = v < 0 ? qs[li] - 1 : (uint64_t)v;
    }
}

// Reference sample_error_poly (prng.cu:212-244): centered binomial from
// keystream-byte hamming weights (bytes 0,1 + low-5-bits of 2, minus
// bytes 3,4 + low-5-bits of 5), same noise across limbs.
void pt_sample_error(const uint8_t *seed56, const uint64_t *qs, int num_l,
                     uint64_t n, uint64_t *out) {
    uint32_t kw[14];
    memcpy(kw, seed56, 56);
    for (uint64_t i = 0; i < n; i++) {
        uint32_t blk[16];
        phantom_salsa20_block(kw, i, blk);
        uint8_t b[8];
        memcpy(b, blk, 8);
        const int cbd = __builtin_popcount(b[0]) + __builtin_popcount(b[1]) +
                        __builtin_popcount(b[2] & 0x1F) -
                        __builtin_popcount(b[3]) - __builtin_popcount(b[4]) -
                        __builtin_popcount(b[5] & 0x1F);
        for (int li = 0; li < num_l; li++)
            out[(uint64_t)li * n + i] =
                cbd < 0 ? qs[li] - (uint64_t)(-cbd) : (uint64_t)cbd;
    }
}

void pt_blake2b(const uint8_t *in, uint64_t inlen, uint8_t *out, int outlen) {
    uint64_t h[8];
    for (int i = 0; i < 8; i++) h[i] = blake2b_iv[i];
    h[0] ^= 0x01010000 ^ (uint32_t)outlen;
    uint64_t t = 0;
    uint8_t block[128];
    while (inlen > 128) {
        memcpy(block, in, 128);
        t += 128;
        blake2b_compress(h, block, t, 0);
        in += 128;
        inlen -= 128;
    }
    memset(block, 0, 128);
    memcpy(block, in, inlen);
    t += inlen;
    blake2b_compress(h, block, t, 1);
    memcpy(out, h, outlen);
}

}  // extern "C"
