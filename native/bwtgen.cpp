// Blockwise incremental BWT construction, C++17.
//
// Low-memory large-genome builder: capability parity with the
// reference's bwt_gen path (`bwa index -a bwtsw`, bwt_gen/bwt_gen.c:1247-
// 1556, selected for >50 Mbp at bwtindex.c:107), which builds the human
// BWT in ~2.5 GB where plain SA-IS needs the whole suffix array in RAM.
// The ALGORITHM here is the classic incremental/block BWT extension
// (prepend a text block, rank its suffixes against the current BWT by
// backward stepping, sort them among themselves, one linear merge) —
// re-derived from first principles, not a translation of bwt_gen.c.
//
// Output contract: the BWT string (without the sentinel row), the primary
// row, byte-identical with the SA-IS path (is_bwt semantics: SA_full =
// [n] ++ SA(T), bwt[i] = T[SA_full[i]-1], shorter-suffix-first ties).
//
// State per step (text suffix W = T[m..n) of length L):
//   packed   2-bit BWT string of W (rows minus the $ hole), uint64 words
//   cp       occ checkpoints: 4 x uint32 counts per 128 chars
//   prim     row index of the suffix W itself (the $ hole)
//   cnt[4]   char counts of W
//
// Adding block T[j..m):
//   phase 1  for p = m-1 .. j:  R(p) = 1 + sum_{d<c} cnt[d]
//                                    + occ_rows(c, R(p+1)),  c = T[p]
//            (R(m) = prim).  R(p) = #old rows < new suffix T[p..n).
//   phase 2  sort block positions by R; ties (no old row separates the
//            two suffixes) compare chars then tails, where a tail
//            reaching m compares as the old row `prim`.
//   phase 3  single merge: new suffix i (sorted) lands at row R_i + i;
//            the old $ hole becomes a real char T[m-1]; the new block's
//            first position becomes the new $ hole (the new prim).
//
// Peak memory: 2 x n/4 (double-buffered packed BWT) + n/8 (checkpoints)
// + 20 B x block (R + sort index) + the caller's byte inputs/outputs.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" int sais_u8_big(const uint8_t* T, int64_t* SA, int64_t n);

namespace {

constexpr uint64_t LOW = 0x5555555555555555ull;

// count of char c among the first `len` (1..32) chars of one packed word
static inline uint32_t wcnt(uint64_t w, int c, int len) {
    uint64_t lo = w & LOW;
    uint64_t hi = (w >> 1) & LOW;
    uint64_t x0 = (c & 1) ? lo : (lo ^ LOW);
    uint64_t x1 = (c & 2) ? hi : (hi ^ LOW);
    uint64_t m = len >= 32 ? ~0ull : ((1ull << (2 * len)) - 1ull);
    return (uint32_t)__builtin_popcountll(x0 & x1 & m);
}

struct IncBwt {
    std::vector<uint64_t> packed;   // 2-bit chars, 32 per word, low-first
    std::vector<uint32_t> cp;       // 4 counts per 128-char block
    uint64_t len = 0;               // chars in the string (|W|)
    uint64_t prim = 0;              // row of the $ hole
    uint64_t cnt[4] = {0, 0, 0, 0};

    inline int at(uint64_t i) const {
        return (int)((packed[i >> 5] >> ((i & 31) << 1)) & 3u);
    }

    // occurrences of c among string chars [0, k)
    inline uint64_t occ_str(int c, uint64_t k) const {
        uint64_t blk = k >> 7;
        uint64_t n = cp[blk * 4 + c];
        uint64_t w0 = blk << 2;           // 4 words per 128-char block
        uint64_t rem = k & 127;
        uint64_t wi = rem >> 5;
        for (uint64_t i = 0; i < wi; ++i)
            n += wcnt(packed[w0 + i], c, 32);
        int tail = (int)(rem & 31);
        if (tail) n += wcnt(packed[w0 + wi], c, tail);
        return n;
    }

    // occurrences of c among rows [0, r) (the $ hole holds no char)
    inline uint64_t occ_rows(int c, uint64_t r) const {
        return occ_str(c, r > prim ? r - 1 : r);
    }
};

struct Emitter {
    // streaming writer for the merged packed string + checkpoints
    IncBwt* out;
    uint64_t w = 0, shift = 0, s = 0;
    uint64_t run[4] = {0, 0, 0, 0};

    explicit Emitter(IncBwt* o) : out(o) {}

    inline void ckpt() {
        if ((s & 127) == 0) {
            uint64_t blk = s >> 7;
            for (int d = 0; d < 4; ++d)
                out->cp[blk * 4 + d] = (uint32_t)run[d];
        }
    }

    // append n (1..32) chars packed low-first in `bits`
    inline void put_bits(uint64_t bits, int n) {
        uint64_t msk = n >= 32 ? ~0ull : ((1ull << (2 * n)) - 1ull);
        bits &= msk;
        uint64_t lo = bits & LOW, hi = (bits >> 1) & LOW;
        uint64_t c3 = (uint64_t)__builtin_popcountll(lo & hi);
        uint64_t c1 = (uint64_t)__builtin_popcountll(lo) - c3;
        uint64_t c2 = (uint64_t)__builtin_popcountll(hi) - c3;
        run[0] += (uint64_t)n - c1 - c2 - c3;
        run[1] += c1;
        run[2] += c2;
        run[3] += c3;
        w |= bits << shift;
        uint64_t ns = shift + 2 * (uint64_t)n;
        if (ns >= 64) {
            out->packed[s >> 5] = w;
            w = shift ? (bits >> (64 - shift)) : 0;
        }
        shift = ns & 63;
        s += (uint64_t)n;
    }

    inline void put(int c) {
        ckpt();
        put_bits((uint64_t)c, 1);
    }

    // append cnt chars = src string [s0, s0+cnt): word-level shift-merge
    // (the per-char loop capped the whole build at ~5 Mchar/s)
    void copy(const IncBwt& src, uint64_t s0, uint64_t cnt) {
        while (cnt) {
            ckpt();
            uint64_t k = cnt < 128 - (s & 127) ? cnt : 128 - (s & 127);
            cnt -= k;
            while (k) {
                int t = k < 32 ? (int)k : 32;
                uint64_t bo = s0 << 1;
                uint64_t wi = bo >> 6;
                int off = (int)(bo & 63);
                uint64_t bits = src.packed[wi] >> off;
                if (off) bits |= src.packed[wi + 1] << (64 - off);
                put_bits(bits, t);
                s0 += (uint64_t)t;
                k -= (uint64_t)t;
            }
        }
    }

    void finish() {
        if (shift) out->packed[s >> 5] = w;
        uint64_t blk = (s + 127) >> 7;      // final checkpoint row
        // checkpoints exist for every started block plus the final one
        for (uint64_t b = (s >> 7) + ((s & 127) ? 1 : 0); b <= blk; ++b)
            for (int d = 0; d < 4; ++d)
                out->cp[b * 4 + d] = (uint32_t)run[d];
    }
};

static void size_for(IncBwt& b, uint64_t n_chars) {
    b.packed.assign((n_chars + 31) / 32 + 1, 0);
    b.cp.assign(((n_chars >> 7) + 2) * 4, 0);
}

// bootstrap: direct SA-IS on the tail block T[m..n)
static int bootstrap(const uint8_t* T, uint64_t m, uint64_t n, IncBwt& bw) {
    uint64_t L = n - m;
    std::vector<int64_t> sa(L + 1);
    if (sais_u8_big(T + m, sa.data(), (int64_t)L) != 0) return -1;
    size_for(bw, L);
    Emitter em(&bw);
    bw.len = L;
    // row 0 = empty suffix, char = last char of the block
    em.put(T[n - 1]);
    ++bw.cnt[T[n - 1]];
    for (uint64_t r = 0; r < L; ++r) {
        if (sa[r] == 0) {
            bw.prim = r + 1;            // the $ hole
        } else {
            int c = T[m + sa[r] - 1];
            em.put(c);
            ++bw.cnt[c];
        }
    }
    em.finish();
    return 0;
}

}  // namespace

extern "C" {

// codes: n bytes of 0..3.  bwt_out: n bytes.  primary_out: 1 uint64.
// block: chars per incremental step (0 -> default).  Returns 0 on success.
int bwt_inc_u8(const uint8_t* T, int64_t n_in, int64_t block,
               uint8_t* bwt_out, uint64_t* primary_out) {
    if (n_in <= 0) return -1;
    uint64_t n = (uint64_t)n_in;
    if (block <= 0) block = 64 << 20;
    uint64_t b = (uint64_t)block;

    IncBwt cur;
    uint64_t m = n > b ? n - (((n - 1) % b) + 1) : 0;  // last (partial) block
    if (bootstrap(T, m, n, cur) != 0) return -2;

    std::vector<uint64_t> R;
    std::vector<uint32_t> order;
    IncBwt next;

    while (m > 0) {
        uint64_t j = m >= b ? m - b : 0;
        uint64_t blen = m - j;
        R.assign(blen, 0);

        // phase 1: ranks among old rows, walking the block backward
        uint64_t l2p[5];
        l2p[0] = 1;
        for (int c = 0; c < 4; ++c) l2p[c + 1] = l2p[c] + cur.cnt[c];
        uint64_t prev = cur.prim;
        for (uint64_t p = m; p-- > j;) {
            int c = T[p];
            prev = l2p[c] + cur.occ_rows(c, prev);
            R[p - j] = prev;
        }

        // phase 2: sort the block's suffixes.  R orders new-vs-new except
        // when no old row separates them (rare); the bulk sorts as flat
        // (R, idx) pairs, and only equal-R runs fall to the char/tail
        // comparator (a tail reaching m compares as the old row `prim`).
        const uint64_t prim_old = cur.prim;
        struct RI { uint64_t r; uint32_t i; };
        std::vector<RI> ri(blen);
        for (uint64_t i = 0; i < blen; ++i)
            ri[i] = {R[i], (uint32_t)i};
        std::sort(ri.begin(), ri.end(),
                  [](const RI& a, const RI& b) { return a.r < b.r; });
        auto deep_less = [&](uint32_t a, uint32_t c2) {
            uint64_t p = j + a, q = j + c2;
            for (;;) {
                uint64_t rp = R[p - j], rq = R[q - j];
                if (rp != rq) return rp < rq;
                if (T[p] != T[q]) return T[p] < T[q];
                ++p; ++q;
                if (p == m) return R[q - j] > prim_old;
                if (q == m) return R[p - j] <= prim_old;
            }
        };
        order.resize(blen);
        for (uint64_t i = 0; i < blen;) {
            uint64_t e = i + 1;
            while (e < blen && ri[e].r == ri[i].r) ++e;
            if (e - i > 1)
                std::sort(ri.begin() + i, ri.begin() + e,
                          [&](const RI& a, const RI& b) {
                              return deep_less(a.i, b.i);
                          });
            for (; i < e; ++i) order[i] = ri[i].i;
        }

        // phase 3: merge.  new suffix i (sorted) lands at row R_i + i.
        uint64_t new_len = cur.len + blen;
        size_for(next, new_len);
        next.len = new_len;
        for (int c = 0; c < 4; ++c) next.cnt[c] = cur.cnt[c];
        for (uint64_t p = j; p < m; ++p) ++next.cnt[T[p]];
        Emitter em(&next);
        uint64_t rows = new_len + 1;
        uint64_t io = 0;                   // old rows consumed
        // old rows [io, io+nrows): chars are the old string shifted
        // around the old $ hole, which itself emits T[m-1]
        auto emit_old = [&](uint64_t nrows) {
            uint64_t end = io + nrows;
            if (io < prim_old) {
                uint64_t upto = end < prim_old ? end : prim_old;
                em.copy(cur, io, upto - io);
                io = upto;
            }
            if (io == prim_old && io < end) {
                em.put(T[m - 1]);
                ++io;
            }
            if (io < end) {
                em.copy(cur, io - 1, end - io);
                io = end;
            }
        };
        for (uint64_t ni = 0; ni <= blen; ++ni) {
            uint64_t target = ni < blen ? R[order[ni]] + ni : rows;
            emit_old(target - (io + ni));
            if (ni < blen) {
                uint64_t p = j + order[ni];
                if (p == j) {
                    next.prim = io + ni;    // the new $ hole
                } else {
                    em.put(T[p - 1]);
                }
            }
        }
        em.finish();
        std::swap(cur.packed, next.packed);
        std::swap(cur.cp, next.cp);
        cur.len = next.len;
        cur.prim = next.prim;
        std::memcpy(cur.cnt, next.cnt, sizeof(cur.cnt));
        m = j;
    }

    for (uint64_t i = 0; i < n; ++i) bwt_out[i] = (uint8_t)cur.at(i);
    *primary_out = cur.prim;
    return 0;
}

}  // extern "C"
