// Sequential FM-index walks over the interleaved-Occ BWT layout
// (bwt.h:61-75 semantics): the bwt2sa suffix-array sampling walk
// (bwt_cal_sa, bwt.c:48-70) is a seq_len-step pointer chase — inherently
// serial, so it runs native rather than in Python/JAX.
//
// Layout: words[] = repeating [cnt[4] | 8 bwt words] blocks per 128 bases
// (OCC_INTERVAL 0x80), as produced by bwt_bwtupdate_core (bwtmisc.c:125).
// Exposed via plain C ABI for ctypes.

#include <algorithm>
#include <cstdint>
#include <thread>
#include <vector>

namespace {

// count of base c in one 16-base word, low `n` bases only (n in 1..16)
static inline uint32_t word_cnt(uint32_t w, int c, int n) {
    uint32_t lo = w & 0x55555555u;
    uint32_t hi = (w >> 1) & 0x55555555u;
    uint32_t x0 = (c & 1) ? lo : (lo ^ 0x55555555u);
    uint32_t x1 = (c & 2) ? hi : (hi ^ 0x55555555u);
    uint32_t m = n >= 16 ? 0xFFFFFFFFu : ~((1u << ((16 - n) << 1)) - 1u);
    return (uint32_t)__builtin_popcount(x0 & x1 & m);
}

// bwt_occ (bwt.c:92-115): occurrences of c in BWT[0..k]
static uint32_t occ(const uint32_t* bwt, uint32_t primary,
                    const uint32_t* L2, uint32_t seq_len, uint32_t k,
                    int c) {
    if (k == seq_len) return L2[c + 1] - L2[c];
    if (k == (uint32_t)-1) return 0;
    if (k >= primary) --k;  // the $ row is not stored
    const uint32_t* p = bwt + (k / 128) * 12;
    uint32_t n = p[c];
    p += 4;
    int wi = (int)(k % 128) / 16;
    for (int j = 0; j < wi; ++j) n += word_cnt(p[j], c, 16);
    n += word_cnt(p[wi], c, (int)(k % 16) + 1);
    return n;
}

static inline int B0(const uint32_t* bwt, uint32_t k) {
    uint32_t w = bwt[(k / 128) * 12 + 4 + (k % 128) / 16];
    return (int)((w >> ((~k & 0xFu) << 1)) & 3u);
}

// bwt_invPsi (bwt.h:71-75)
static inline uint32_t inv_psi(const uint32_t* bwt, uint32_t primary,
                               const uint32_t* L2, uint32_t seq_len,
                               uint32_t k) {
    if (k == primary) return 0;
    uint32_t kk = (k < primary) ? k : k - 1;
    int c = B0(bwt, kk);
    return L2[c] + occ(bwt, primary, L2, seq_len, k, c);
}

}  // namespace

extern "C" {

// bwt_cal_sa (bwt.c:48-70).  sa_out has (seq_len + intv) / intv slots;
// sa_out[0] is set to 0xFFFFFFFF like the reference.  Returns 0.
int bwt_cal_sa_u32(const uint32_t* bwt, uint32_t primary,
                   const uint32_t* L2, uint32_t seq_len, int intv,
                   uint32_t* sa_out) {
    uint32_t isa = 0, sa = seq_len;
    for (uint32_t i = 0; i < seq_len; ++i) {
        if (isa % intv == 0) sa_out[isa / intv] = sa;
        --sa;
        isa = inv_psi(bwt, primary, L2, seq_len, isa);
    }
    if (isa % intv == 0) sa_out[isa / intv] = sa;
    sa_out[0] = (uint32_t)-1;
    return 0;
}

// Batched bwt_sa (bwt.c:72-81): for each row k, walk invPsi to a sampled
// row (intv must be a power of two) and add the step count.  Per-row
// walks are <= intv independent random-access steps — embarrassingly
// parallel, and the sampe post spends most of its native time here, so
// big batches fan out over hardware threads.
int bwt_sa_batch_u32(const uint32_t* bwt, uint32_t primary,
                     const uint32_t* L2, uint32_t seq_len,
                     const uint32_t* sa_sample, int intv,
                     const uint32_t* rows, int64_t n, uint32_t* out) {
    uint32_t mask = (uint32_t)(intv - 1);
    auto span = [&](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; ++i) {
            uint32_t k = rows[i];
            uint32_t s = 0;
            while (k & mask) {
                ++s;
                k = inv_psi(bwt, primary, L2, seq_len, k);
            }
            // sa_sample[0] is the 0xFFFFFFFF sentinel; sa + (-1) wraps
            // like the reference's bwtint arithmetic
            out[i] = s + sa_sample[k / intv];
        }
    };
    int nt = (int)std::thread::hardware_concurrency();
    if (nt <= 0) nt = 1;
    if (n < 4096 || nt == 1) {      // spawn cost beats short batches
        span(0, n);
        return 0;
    }
    if (nt > 8) nt = 8;
    std::vector<std::thread> threads;
    int64_t step = (n + nt - 1) / nt;
    for (int t = 1; t < nt; ++t) {
        int64_t lo = t * step;
        if (lo >= n) break;
        threads.emplace_back(span, lo, std::min(n, lo + step));
    }
    span(0, std::min(n, step));
    for (auto& th : threads) th.join();
    return 0;
}

}  // extern "C"
