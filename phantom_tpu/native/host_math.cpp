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
