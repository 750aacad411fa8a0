// SA-IS suffix array construction (induced sorting), C++17.
//
// Native replacement for the index-construction hot path: the reference
// builds its BWT with sais-lite / BWT-SW (is.c, bwt_gen/); we build the
// suffix array with our own SA-IS and derive the BWT in Python.  O(n) time;
// handles genome-scale inputs where the NumPy prefix-doubling fallback is
// too slow.  Classic formulation with an explicit unique sentinel, so the
// output order matches `shorter prefix-suffix first` (is.c semantics).
//
// Templated on the index type: inputs below 2^31-1 run entirely in
// int32 (+ uint16 text at the top level), roughly halving peak memory
// vs the original int64-only version (~20 B/char at the top level).
//
// Exposed via a plain C ABI for ctypes (no pybind11 dependency).

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// SA-IS over T[0..n-1] with values in [1, K) and T[n-1] == 0 the unique
// smallest sentinel.  SA receives n entries.
template <class I, class C>
void sais_core(const C* T, I* SA, I n, I K) {
    std::vector<bool> is_s(n);
    is_s[n - 1] = true;
    for (I i = n - 2; i >= 0; --i)
        is_s[i] = T[i] < T[i + 1] || (T[i] == T[i + 1] && is_s[i + 1]);

    auto is_lms = [&](I i) { return i > 0 && is_s[i] && !is_s[i - 1]; };

    std::vector<I> bkt(K, 0);
    for (I i = 0; i < n; ++i) ++bkt[T[i]];
    std::vector<I> cur(K);

    auto bucket_ends = [&]() {
        I sum = 0;
        for (I c = 0; c < K; ++c) { sum += bkt[c]; cur[c] = sum; }
    };
    auto bucket_starts = [&]() {
        I sum = 0;
        for (I c = 0; c < K; ++c) { cur[c] = sum; sum += bkt[c]; }
    };

    auto induce = [&]() {
        bucket_starts();
        for (I i = 0; i < n; ++i) {
            I j = SA[i];
            if (j > 0 && !is_s[j - 1]) SA[cur[T[j - 1]]++] = j - 1;
        }
        bucket_ends();
        for (I i = n - 1; i >= 0; --i) {
            I j = SA[i];
            if (j > 0 && is_s[j - 1]) SA[--cur[T[j - 1]]] = j - 1;
        }
    };

    // step 1: LMS suffixes at bucket ends, then induce
    std::memset(SA, -1, sizeof(I) * n);
    bucket_ends();
    for (I i = 1; i < n; ++i)
        if (is_lms(i)) SA[--cur[T[i]]] = i;
    induce();

    // step 2: name LMS substrings in sorted order.  LMS positions are
    // never adjacent, so names index by i >> 1 (halves the array).
    std::vector<I> lms_sorted;
    lms_sorted.reserve(n / 2 + 1);
    for (I i = 0; i < n; ++i)
        if (SA[i] > 0 && is_lms(SA[i])) lms_sorted.push_back(SA[i]);
    std::vector<I> name(n / 2 + 1, -1);
    I names = 0, prev = -1;
    for (I p : lms_sorted) {
        bool diff = prev < 0;
        for (I d = 0; !diff; ++d) {
            if (T[p + d] != T[prev + d] || is_s[p + d] != is_s[prev + d]) {
                diff = true;
                break;
            }
            if (d > 0 && (is_lms(p + d) || is_lms(prev + d))) {
                diff = !(is_lms(p + d) && is_lms(prev + d));
                break;
            }
        }
        if (diff) { ++names; prev = p; }
        name[p >> 1] = names - 1;
    }
    lms_sorted.clear();
    lms_sorted.shrink_to_fit();

    // reduced problem in text order (always ends at the sentinel LMS)
    std::vector<I> pos1, s1;
    for (I i = 1; i < n; ++i)
        if (is_lms(i)) { pos1.push_back(i); s1.push_back(name[i >> 1]); }
    name.clear();
    name.shrink_to_fit();
    I n1 = (I)s1.size();

    std::vector<I> SA1(n1);
    if (names < n1) {
        // recurse: sentinel of the reduced string is its last LMS (the
        // text sentinel position), whose name is unique smallest (0)
        sais_core<I, I>(s1.data(), SA1.data(), n1, names);
    } else {
        for (I i = 0; i < n1; ++i) SA1[s1[i]] = i;
    }
    s1.clear();
    s1.shrink_to_fit();

    // step 3: place LMS in final order, induce
    std::memset(SA, -1, sizeof(I) * n);
    bucket_ends();
    for (I x = n1 - 1; x >= 0; --x) {
        I j = pos1[SA1[x]];
        SA[--cur[T[j]]] = j;
    }
    induce();
}

template <class I, class C>
int sais_run_c(const uint8_t* T, int64_t* SA, int64_t n, int64_t K) {
    // append explicit sentinel, shift alphabet by +1
    std::vector<C> T2(n + 1);
    for (int64_t i = 0; i < n; ++i) T2[i] = (C)(T[i] + 1);
    T2[n] = 0;
    std::vector<I> SA2(n + 1);
    sais_core<I, C>(T2.data(), SA2.data(), (I)(n + 1), (I)K);
    // SA2[0] is the sentinel suffix; drop it
    for (int64_t i = 0; i < n; ++i) SA[i] = (int64_t)SA2[i + 1];
    return 0;
}

template <class C>
int sais_run64(const uint8_t* T, int64_t* SA, int64_t n, int64_t K) {
    // int64 indices: run in-place in the caller's buffer (n+1 entries,
    // see sais_u8_big) — saves an 8n-byte shadow copy at Gbp scale
    std::vector<C> T2(n + 1);
    for (int64_t i = 0; i < n; ++i) T2[i] = (C)(T[i] + 1);
    T2[n] = 0;
    sais_core<int64_t, C>(T2.data(), SA, n + 1, K);
    T2.clear();
    T2.shrink_to_fit();
    std::memmove(SA, SA + 1, sizeof(int64_t) * n);  // drop sentinel suffix
    return 0;
}

template <class I>
int sais_run(const uint8_t* T, int64_t* SA, int64_t n) {
    // narrow text type when the shifted alphabet fits a byte (genome
    // codes are 0..3; halves vs uint16 at the top level)
    uint8_t mx = 0;
    for (int64_t i = 0; i < n; ++i)
        if (T[i] > mx) mx = T[i];
    if (mx <= 254)
        return sais_run_c<I, uint8_t>(T, SA, n, (int64_t)mx + 2);
    return sais_run_c<I, uint16_t>(T, SA, n, 257);
}

}  // namespace

extern "C" {

// T: n bytes.  SA out: n int64.  Suffix order: lexicographic with the
// shorter suffix first on prefix ties.  Returns 0 on success.
int sais_u8(const uint8_t* T, int64_t* SA, int64_t n) {
    if (n < 0) return -1;
    if (n == 0) return 0;
    if (n + 1 < 0x7FFFFFFFLL)
        return sais_run<int32_t>(T, SA, n);
    return sais_run<int64_t>(T, SA, n);
}

// Gbp-scale entry: SA must have n+1 entries; the construction runs
// in-place in it (no 8n shadow buffer).  SA[0..n) receives the result;
// SA[n] is scratch.
int sais_u8_big(const uint8_t* T, int64_t* SA, int64_t n) {
    if (n < 0) return -1;
    if (n == 0) return 0;
    if (n + 1 < 0x7FFFFFFFLL)
        return sais_run<int32_t>(T, SA, n);
    uint8_t mx = 0;
    for (int64_t i = 0; i < n; ++i)
        if (T[i] > mx) mx = T[i];
    if (mx <= 254)
        return sais_run64<uint8_t>(T, SA, n, (int64_t)mx + 2);
    return sais_run64<uint16_t>(T, SA, n, 257);
}

}  // extern "C"
