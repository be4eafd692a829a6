// Native host-side runtime for image_matching_tpu.
//
// The reference implements its whole runtime in C++ (dataset loading in
// src/main.cpp:216-230, big-integer arithmetic inside OpenFHE).  Our TPU
// compute path is JAX/XLA; this library covers the host-side pieces where
// Python is the wrong tool:
//
//   * imtpu_parse_dat: fast whitespace-separated integer parsing for the
//     .dat datasets (a 2^20 x 512 dataset is ~5e8 tokens — minutes in
//     Python, seconds here).
//   * imtpu_crt_compose_centered: exact CRT reconstruction of centered
//     coefficients from RNS residues with an arbitrary number of 31-bit
//     limbs — the exact decode path behind decryption.
//
// Exposed with a plain C ABI and loaded via ctypes (no pybind11 in the
// image); build with `make -C native`.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {

// Parse up to `max_vals` whitespace-separated numbers from a text file
// into out[]; returns the count parsed, or -1 on IO error.
long imtpu_parse_dat(const char* path, double* out, long max_vals) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    fseek(f, 0, SEEK_END);
    long size = ftell(f);
    fseek(f, 0, SEEK_SET);
    std::vector<char> buf(size + 1);
    if (fread(buf.data(), 1, size, f) != (size_t)size) {
        fclose(f);
        return -1;
    }
    fclose(f);
    buf[size] = '\0';
    long n = 0;
    const char* p = buf.data();
    const char* end = p + size;
    while (p < end && n < max_vals) {
        while (p < end && (*p == ' ' || *p == '\n' || *p == '\r' || *p == '\t'))
            ++p;
        if (p >= end) break;
        char* next;
        double v = strtod(p, &next);
        if (next == p) break;
        out[n++] = v;
        p = next;
    }
    return n;
}

namespace {

// Minimal little-endian multi-word unsigned integer helpers (32-bit words).
using words = std::vector<uint32_t>;

void add_mul_small(words& acc, const words& m, uint32_t c) {
    // acc += m * c
    if (acc.size() < m.size() + 1) acc.resize(m.size() + 1, 0);
    uint64_t carry = 0;
    size_t i = 0;
    for (; i < m.size(); ++i) {
        uint64_t t = (uint64_t)m[i] * c + acc[i] + carry;
        acc[i] = (uint32_t)t;
        carry = t >> 32;
    }
    for (; carry && i < acc.size(); ++i) {
        uint64_t t = (uint64_t)acc[i] + carry;
        acc[i] = (uint32_t)t;
        carry = t >> 32;
    }
    if (carry) acc.push_back((uint32_t)carry);
}

void mul_small(words& a, uint32_t c) {
    uint64_t carry = 0;
    for (size_t i = 0; i < a.size(); ++i) {
        uint64_t t = (uint64_t)a[i] * c + carry;
        a[i] = (uint32_t)t;
        carry = t >> 32;
    }
    if (carry) a.push_back((uint32_t)carry);
}

int cmp(const words& a, const words& b) {
    size_t la = a.size(), lb = b.size();
    while (la && a[la - 1] == 0) --la;
    while (lb && b[lb - 1] == 0) --lb;
    if (la != lb) return la < lb ? -1 : 1;
    for (size_t i = la; i-- > 0;) {
        if (a[i] != b[i]) return a[i] < b[i] ? -1 : 1;
    }
    return 0;
}

void sub_from(words& a, const words& b) {
    // a = a - b (requires a >= b)
    int64_t borrow = 0;
    for (size_t i = 0; i < a.size(); ++i) {
        int64_t t = (int64_t)a[i] - (i < b.size() ? b[i] : 0) - borrow;
        borrow = t < 0;
        a[i] = (uint32_t)(t + (borrow << 32));
    }
}

double to_double(const words& a, bool neg) {
    double v = 0;
    for (size_t i = a.size(); i-- > 0;) v = v * 4294967296.0 + a[i];
    return neg ? -v : v;
}

uint64_t mod_u64(const words& a, uint64_t q) {
    uint64_t r = 0;
    for (size_t i = a.size(); i-- > 0;) r = ((r << 32) | a[i]) % q;
    return r;
}

uint64_t inv_mod(uint64_t a, uint64_t m) {
    int64_t t = 0, nt = 1;
    int64_t r = (int64_t)m, nr = (int64_t)(a % m);
    while (nr) {
        int64_t qq = r / nr;
        int64_t tmp = t - qq * nt; t = nt; nt = tmp;
        tmp = r - qq * nr; r = nr; nr = tmp;
    }
    return (uint64_t)(t < 0 ? t + (int64_t)m : t);
}

}  // namespace

// res: uint32[L * n] standard-form residues (limb-major), primes: uint64[L].
// out: double[n] centered exact CRT values (as float64).
void imtpu_crt_compose_centered(const uint32_t* res, long L, long n,
                                const uint64_t* primes, double* out) {
    // Q and M_i = Qhat_i * (Qhat_i^{-1} mod q_i)
    words Q{1};
    for (long i = 0; i < L; ++i) mul_small(Q, (uint32_t)primes[i]);
    std::vector<words> M(L);
    for (long i = 0; i < L; ++i) {
        words Qi{1};
        for (long j = 0; j < L; ++j)
            if (j != i) mul_small(Qi, (uint32_t)primes[j]);
        uint64_t qi = primes[i];
        uint64_t inv = inv_mod(mod_u64(Qi, qi), qi);
        mul_small(Qi, (uint32_t)inv);  // inv < q_i < 2^31 fits a word
        M[i] = Qi;
    }
    words half = Q;  // Q/2
    {
        uint32_t carry = 0;
        for (size_t i = half.size(); i-- > 0;) {
            uint32_t cur = half[i];
            half[i] = (cur >> 1) | (carry << 31);
            carry = cur & 1;
        }
    }
    words acc;
    for (long k = 0; k < n; ++k) {
        acc.assign(Q.size() + 2, 0);
        for (long i = 0; i < L; ++i)
            add_mul_small(acc, M[i], res[i * n + k]);
        // acc mod Q via repeated shifted subtraction (acc < L * Q * 2^31,
        // so at most ~32+log2(L) subtraction rounds)
        words shifted = Q;
        int shifts = 0;
        while (cmp(shifted, acc) <= 0) {
            mul_small(shifted, 2);
            ++shifts;
        }
        for (int s = 0; s <= shifts; ++s) {
            // halve shifted once per round (first round: too big, skip sub)
            if (s > 0) {
                uint32_t carry = 0;
                for (size_t i = shifted.size(); i-- > 0;) {
                    uint32_t cur = shifted[i];
                    shifted[i] = (cur >> 1) | (carry << 31);
                    carry = cur & 1;
                }
            }
            if (cmp(shifted, acc) <= 0 && s > 0) sub_from(acc, shifted);
        }
        // center
        if (cmp(acc, half) > 0) {
            words t = Q;
            sub_from(t, acc);
            out[k] = to_double(t, true);
        } else {
            out[k] = to_double(acc, false);
        }
    }
}

}  // extern "C"
