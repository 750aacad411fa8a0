// Native BWA-SW per-read driver: the full bsw2_aln1_core orbit
// (bwtsw2_aux.c:252-527) around the existing native DAG x trie core
// (bsw2core.cpp) — bwtl build, SA->coordinate duphit resolution, chain
// filter, left/right extension, query-overlap resolution with the
// drand48 tie-break, and CIGAR generation.  This is a 1:1 port of the
// Python driver in models/bwasw.py (itself the faithful port of the C
// reference); every sort is the exact klib ks_introsort permutation
// (utils/ksort.py) and every float comparison replicates the Python's
// np.float32/double mix, because the byte-identical SAM contract makes
// tie order part of the output.
//
// Threading: the per-read work is split into an rng-free phase A
// (bwtl + core + resolve + chain + extends, parallel over reads), a
// sequential phase B that replays the drand48 stream in read order
// (N-base fill, bsw2_resolve_query_overlaps, the rare
// reverse-index retry), and a parallel phase C (banded-global CIGARs).
// Output is bit-identical to the sequential Python driver; only the
// wall-clock changes.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <cstdio>
#include <cstdlib>
#include <chrono>
#include <thread>
#include <vector>

extern "C" {
int sais_u8(const uint8_t* T, int64_t* SA, int64_t n);
int bsw2_core_u32(const int64_t* t_sa, const int64_t* t_l2,
                  const int32_t* t_cum, int t_primary, int t_n,
                  const uint32_t* g_bwt, uint32_t g_primary,
                  const uint32_t* g_l2, uint32_t g_seq_len,
                  int a, int b, int q, int r, int bw, int z, int thr,
                  int IS, int64_t* hits_out, int64_t* b1_out,
                  int64_t b1_cap, int64_t* b1_n);
int32_t aln_extend_u8(const uint8_t* seq1, int len1, const uint8_t* seq2,
                      int len2, const int32_t* mat, int row, int32_t go,
                      int32_t ge, int band, int32_t G0, int want_path,
                      int32_t* out, uint8_t* path_out, int64_t path_cap,
                      int64_t* path_n);
int32_t aln_global_u8(const uint8_t* seq1, int len1, const uint8_t* seq2,
                      int len2, const int32_t* mat, int row, int32_t go,
                      int32_t ge, int32_t gend, int band,
                      uint8_t* path_out, int64_t path_cap,
                      int64_t* path_n);
}

namespace {

// ---------------------------------------------------------------------
// klib ks_introsort — exact port of utils/ksort.py (itself ksort.h)
// ---------------------------------------------------------------------

template <class T, class LT>
static void ks_insertsort(T* a, int64_t s, int64_t t, LT lt) {
    for (int64_t i = s + 1; i < t; ++i)
        for (int64_t j = i; j > s && lt(a[j], a[j - 1]); --j)
            std::swap(a[j], a[j - 1]);
}

template <class T, class LT>
static void ks_combsort(T* a, int64_t off, int64_t n, LT lt) {
    const double shrink = 1.2473309501039786540366528676643;
    int64_t gap = n;
    for (;;) {
        if (gap > 2) {
            gap = (int64_t)((double)gap / shrink);
            if (gap == 9 || gap == 10) gap = 11;
        }
        bool do_swap = false;
        for (int64_t i = off; i < off + n - gap; ++i) {
            int64_t j = i + gap;
            if (lt(a[j], a[i])) {
                std::swap(a[i], a[j]);
                do_swap = true;
            }
        }
        if (!(do_swap || gap > 2)) break;
    }
    if (gap != 1) ks_insertsort(a, off, off + n, lt);
}

template <class T, class LT>
static void ks_introsort(T* a, int64_t n, LT lt) {
    if (n < 1) return;
    if (n == 2) {
        if (lt(a[1], a[0])) std::swap(a[0], a[1]);
        return;
    }
    int d = 2;
    while ((1LL << d) < n) ++d;
    struct Frame { int64_t s, t; int d; };
    std::vector<Frame> stack;
    int64_t s = 0, t = n - 1;
    d <<= 1;
    for (;;) {
        if (s < t) {
            --d;
            if (d == 0) {
                ks_combsort(a, s, t - s + 1, lt);
                t = s;
                continue;
            }
            int64_t i = s, j = t;
            int64_t k = i + ((j - i) >> 1) + 1;
            if (lt(a[k], a[i])) {
                if (lt(a[k], a[j])) k = j;
            } else {
                k = lt(a[j], a[i]) ? i : j;
            }
            T rp = a[k];
            if (k != t) std::swap(a[k], a[t]);
            for (;;) {
                ++i;
                while (lt(a[i], rp)) ++i;
                --j;
                while (i <= j && lt(rp, a[j])) --j;
                if (j <= i) break;
                std::swap(a[i], a[j]);
            }
            std::swap(a[i], a[t]);
            if (i - s > t - i) {
                if (i - s > 16) stack.push_back({s, i - 1, d});
                s = (t - i > 16) ? i + 1 : t;
            } else {
                if (t - i > 16) stack.push_back({i + 1, t, d});
                t = (i - s > 16) ? i - 1 : s;
            }
        } else {
            if (stack.empty()) {
                ks_insertsort(a, 0, n, lt);
                return;
            }
            Frame f = stack.back();
            stack.pop_back();
            s = f.s;
            t = f.t;
            d = f.d;
        }
    }
}

// ---------------------------------------------------------------------
// POSIX drand48 (utils/rand48.py): 48-bit LCG, exact double quotient
// ---------------------------------------------------------------------

struct Rng {
    uint64_t x;
    double drand() {
        x = (0x5DEECE66DULL * x + 0xBULL) & ((1ULL << 48) - 1);
        return std::ldexp((double)x, -48);
    }
};

// ---------------------------------------------------------------------
// Genome FM-index over the interleaved-Occ layout (bwt.h:61-75)
// ---------------------------------------------------------------------

struct GFm {
    const uint32_t* bwt;
    uint32_t primary;
    const uint32_t* L2;      // [5]
    uint32_t seq_len;
    const uint32_t* sa_arr;  // sampled SA
    int sa_intv;
};

static inline uint32_t g_word_cnt(uint32_t w, int c, int n) {
    uint32_t lo = w & 0x55555555u;
    uint32_t hi = (w >> 1) & 0x55555555u;
    uint32_t x0 = (c & 1) ? lo : (lo ^ 0x55555555u);
    uint32_t x1 = (c & 2) ? hi : (hi ^ 0x55555555u);
    uint32_t m = n >= 16 ? 0xFFFFFFFFu : ~((1u << ((16 - n) << 1)) - 1u);
    return (uint32_t)__builtin_popcount(x0 & x1 & m);
}

static uint32_t g_occ(const GFm& g, uint32_t k, int c) {
    if (k == g.seq_len) return g.L2[c + 1] - g.L2[c];
    if (k == (uint32_t)-1) return 0;
    if (k >= g.primary) --k;
    const uint32_t* p = g.bwt + (k / 128) * 12;
    uint32_t n = p[c];
    p += 4;
    int wi = (int)(k % 128) / 16;
    for (int j = 0; j < wi; ++j) n += g_word_cnt(p[j], c, 16);
    n += g_word_cnt(p[wi], c, (int)(k % 16) + 1);
    return n;
}

static inline int g_B0(const GFm& g, uint32_t k) {
    uint32_t w = g.bwt[(k / 128) * 12 + 4 + (k % 128) / 16];
    return (int)((w >> ((~k & 0xFu) << 1)) & 3u);
}

static inline uint32_t g_inv_psi(const GFm& g, uint32_t k) {
    if (k == g.primary) return 0;
    uint32_t kk = (k < g.primary) ? k : k - 1;
    int c = g_B0(g, kk);
    return g.L2[c] + g_occ(g, k, c);
}

// bwt_sa (bwt.c:72-81) via ScalarFm.sa: (steps + sample) & 0xFFFFFFFF
static int64_t g_sa(const GFm& g, uint32_t k) {
    uint32_t s = 0;
    while (k % (uint32_t)g.sa_intv != 0) {
        ++s;
        k = g_inv_psi(g, k);
    }
    uint32_t kk = k / (uint32_t)g.sa_intv;
    uint32_t base = kk ? g.sa_arr[kk] : 0xFFFFFFFFu;
    return (int64_t)(uint32_t)(s + base);
}

// ---------------------------------------------------------------------
// bwtl (bwt_lite.c:9-54 via models/bwasw.py Bwtl)
// ---------------------------------------------------------------------

struct Bwtl {
    int n;
    int primary;
    std::vector<int64_t> sa;   // [n+1], sa[0] = n
    int64_t L2[5];
    std::vector<int32_t> cum;  // [(n+1)*4] inclusive prefix counts
};

static void build_bwtl(const uint8_t* seq, int n, Bwtl* t) {
    t->n = n;
    t->sa.assign((size_t)n + 1, 0);
    t->sa[0] = n;
    if (n) sais_u8(seq, t->sa.data() + 1, n);
    std::vector<uint8_t> s((size_t)n + 1, 0);
    t->primary = 0;
    for (int i = 0; i <= n; ++i) {
        if (t->sa[i] == 0) t->primary = i;
        else s[i] = seq[t->sa[i] - 1];
    }
    for (int i = t->primary; i < n; ++i) s[i] = s[i + 1];
    t->cum.assign(((size_t)n + 1) * 4, 0);
    int64_t c[4] = {0, 0, 0, 0};
    for (int i = 0; i < n; ++i) {
        const int32_t* prev = t->cum.data() + (size_t)i * 4;
        int32_t* cur = t->cum.data() + ((size_t)i + 1) * 4;
        cur[0] = prev[0];
        cur[1] = prev[1];
        cur[2] = prev[2];
        cur[3] = prev[3];
        cur[s[i]] += 1;
        c[s[i]] += 1;
    }
    t->L2[0] = 0;
    for (int d = 0; d < 4; ++d) t->L2[d + 1] = t->L2[d] + c[d];
}

// ---------------------------------------------------------------------
// hits (bsw2hit_t) and the per-stage ops from models/bwasw.py
// ---------------------------------------------------------------------

struct CHit {
    int64_t k, l, flag, n_seeds, len, G, G2, beg, end;
};

struct HitGDesc {
    bool operator()(const CHit& a, const CHit& b) const { return a.G > b.G; }
};
struct HitEndDesc {
    bool operator()(const CHit& a, const CHit& b) const {
        return a.end > b.end;
    }
};

struct Opt {
    int a, b, q, r, z, is_, t_seeds, hard_clip;
    float mask_level;
    double coef;
    // per-read adjusted
    int t, bw;
};

// bsw2_resolve_duphits (bwtsw2_core.c:261-327 via bwasw.py:317-389)
static void resolve_duphits(const GFm* fm, std::vector<CHit>* bp, int IS) {
    std::vector<CHit>& b = *bp;
    if (b.empty()) return;
    if (fm) {
        std::vector<CHit> out;
        out.reserve(b.size());
        for (const CHit& p : b) {
            if (p.l - p.k + 1 <= (int64_t)IS) {
                for (int64_t k = p.k; k <= p.l; ++k) {
                    CHit h = p;
                    h.k = g_sa(*fm, (uint32_t)k);
                    h.l = 0;
                    out.push_back(h);
                }
            } else if (p.G > 0) {
                CHit h = p;
                h.k = g_sa(*fm, (uint32_t)p.k);
                h.l = 0;
                h.flag |= 1;
                out.push_back(h);
            }
        }
        b.swap(out);
    }
    ks_introsort(b.data(), (int64_t)b.size(), HitGDesc());
    int64_t n = (int64_t)b.size();
    int64_t stop = n;
    for (int64_t i = 1; i < n; ++i) {
        CHit& p = b[i];
        if (p.G == 0) {
            stop = i;
            break;
        }
        for (int64_t j = 0; j < i; ++j) {
            const CHit& q = b[j];
            bool compatible = true;
            if (q.G == 0) continue;
            if (p.l == 0 && q.l == 0) {
                int64_t qol = std::min(p.end, q.end) - std::max(p.beg, q.beg);
                if (qol < 0) qol = 0;
                if ((float)qol / (float)(p.end - p.beg) > (float)0.90 ||
                    (float)qol / (float)(q.end - q.beg) > (float)0.90) {
                    int64_t tol = std::min(p.k + p.len, q.k + q.len)
                        - std::max(p.k, q.k);
                    if ((double)tol / (double)p.len > 0.90 ||
                        (double)tol / (double)q.len > 0.90)
                        compatible = false;
                }
            }
            if (!compatible) {
                p.G = 0;
                break;
            }
        }
    }
    std::vector<CHit> out2;
    out2.reserve((size_t)stop);
    for (int64_t i = 0; i < stop; ++i)
        if (b[i].G != 0) out2.push_back(b[i]);
    b.swap(out2);
}

// bsw2_resolve_query_overlaps (bwtsw2_core.c:329-378 via bwasw.py:392-433)
static void resolve_query_overlaps(std::vector<CHit>* bp, float mask_level,
                                   Rng* rng) {
    std::vector<CHit>& b = *bp;
    if (b.empty()) return;
    ks_introsort(b.data(), (int64_t)b.size(), HitGDesc());
    int64_t G0 = b[0].G;
    int64_t i = 1;
    while (i < (int64_t)b.size() && b[i].G == G0) ++i;
    int64_t j = (int64_t)((double)i * rng->drand());
    if (j) std::swap(b[0], b[j]);
    int64_t n = (int64_t)b.size();
    int64_t stop = n;
    for (i = 1; i < n; ++i) {
        CHit& p = b[i];
        bool all_compat = true;
        if (p.G == 0) {
            stop = i;
            break;
        }
        for (j = 0; j < i; ++j) {
            CHit& q = b[j];
            if (q.G == 0) continue;
            int64_t tol = 0;
            int64_t qol = std::min(p.end, q.end) - std::max(p.beg, q.beg);
            if (qol < 0) qol = 0;
            if (p.l == 0 && q.l == 0) {
                tol = std::min(p.k + p.len, q.k + q.len)
                    - std::max(p.k, q.k);
                if (tol < 0) tol = 0;
            }
            float fol = (float)qol
                / (float)std::min(p.end - p.beg, q.end - q.beg);
            bool compatible = fol < mask_level
                || (tol > 0 && qol < p.end - p.beg && qol < q.end - q.beg);
            if (!compatible) {
                if (q.G2 < p.G) q.G2 = p.G;
                all_compat = false;
            }
        }
        if (!all_compat) p.G = 0;
    }
    std::vector<CHit> out;
    out.reserve((size_t)stop);
    for (i = 0; i < stop; ++i)
        if (b[i].G != 0) out.push_back(b[i]);
    b.swap(out);
}

// ---- chaining filter (bwtsw2_chain.c via bwasw.py:649-737) ----

struct Chain {
    int64_t tbeg, tend, qbeg, qend;
    int flag, idx;
    int64_t chain;
};

struct ChainQbegLt {
    bool operator()(const Chain& a, const Chain& b) const {
        return a.qbeg < b.qbeg;
    }
};

static int64_t chaining(const Opt& o, int64_t shift, std::vector<Chain>* zp,
                        std::vector<Chain>* chain) {
    std::vector<Chain>& z = *zp;
    ks_introsort(z.data(), (int64_t)z.size(), ChainQbegLt());
    int64_t m = 0;
    size_t base = chain->size();
    for (Chain& p : z) {
        int64_t k = m - 1;
        for (; k >= 0; --k) {
            Chain& q = (*chain)[base + k];
            int64_t x = p.qbeg - q.qbeg;
            int64_t y = p.tbeg - q.tbeg;
            if (y > 0 && x - y <= o.bw && y - x <= o.bw) {
                if (p.qend > q.qend) q.qend = p.qend;
                if (p.tend > q.tend) q.tend = p.tend;
                q.chain += 1;
                p.chain = shift + k;
                break;
            }
        }
        if (k < 0) {
            Chain c;
            c.tbeg = p.tbeg;
            c.tend = p.tend;
            c.qbeg = p.qbeg;
            c.qend = p.qend;
            c.flag = p.flag;
            c.chain = 1;
            c.idx = (int)(shift + m);
            p.chain = shift + m;
            chain->push_back(c);
            ++m;
        }
    }
    return m;
}

static void chain_filter(const Opt& o, int64_t length,
                         std::vector<CHit>* b0, std::vector<CHit>* b1) {
    (void)length;
    if (b0->empty() && b1->empty()) return;
    std::vector<CHit>* bs[2] = {b0, b1};
    std::vector<Chain> z[2];
    for (int k = 0; k < 2; ++k) {
        z[k].reserve(bs[k]->size());
        for (size_t i = 0; i < bs[k]->size(); ++i) {
            const CHit& p = (*bs[k])[i];
            Chain q;
            q.flag = k;
            q.idx = (int)i;
            q.tbeg = p.k;
            q.tend = p.k + p.len;
            q.chain = -1;
            q.qbeg = p.beg;
            q.qend = p.end;
            z[k].push_back(q);
        }
    }
    std::vector<Chain> chain;
    int64_t m0 = chaining(o, 0, &z[0], &chain);
    std::vector<Chain> chain1;
    int64_t m1 = chaining(o, m0, &z[1], &chain1);
    for (Chain& p : chain1) {
        int64_t tmp = p.qbeg;
        p.qbeg = length - p.qend;
        p.qend = length - tmp;
    }
    chain.insert(chain.end(), chain1.begin(), chain1.end());
    std::vector<uint8_t> flag((size_t)(m0 + m1), 0);
    ks_introsort(chain.data(), (int64_t)chain.size(), ChainQbegLt());
    for (int64_t k = 1; k < m0 + m1; ++k) {
        const Chain& p = chain[k];
        for (int64_t jj = 0; jj < k; ++jj) {
            const Chain& q = chain[jj];
            if (flag[q.idx]) continue;
            if (q.qend >= p.qend
                && q.chain > p.chain * o.t_seeds * 2) {
                flag[p.idx] = 1;
                break;
            }
        }
    }
    for (int k = 0; k < 2; ++k) {
        for (const Chain& p : z[k])
            if (flag[(size_t)p.chain]) (*bs[k])[p.idx].G = 0;
        std::vector<CHit> keep;
        keep.reserve(bs[k]->size());
        for (const CHit& h : *bs[k])
            if (h.G) keep.push_back(h);
        bs[k]->swap(keep);
    }
}

// ---- extension (bwtsw2_aux.c:80-164 via bwasw.py:760-860) ----

static void build_mat(const Opt& o, int32_t mat[25]) {
    for (int i = 0; i < 25; ++i) mat[i] = -o.b;
    for (int i = 0; i < 4; ++i) mat[i * 5 + i] = o.a;
}

static bool extend_left(const Opt& o, std::vector<CHit>* bp,
                        const uint8_t* query_seq, int64_t lq,
                        const uint8_t* pac, int64_t l_pac, bool is_rev) {
    std::vector<CHit>& b = *bp;
    int32_t mat[25];
    build_mat(o, mat);
    ks_introsort(b.data(), (int64_t)b.size(), HitEndDesc());
    std::vector<uint8_t> rquery((size_t)lq);
    for (int64_t i = 0; i < lq; ++i) rquery[i] = query_seq[lq - 1 - i];
    std::vector<uint8_t> tgt;
    std::vector<uint8_t> dummy_path(4);
    for (size_t i = 0; i < b.size(); ++i) {
        CHit& p = b[i];
        p.n_seeds = 1;
        if (p.l || p.k == 0) continue;
        int64_t score = 0;
        for (size_t j = 0; j < i; ++j) {
            CHit& q = b[j];
            if (q.beg <= p.beg && q.k <= p.k
                && q.k + q.len >= p.k + p.len) {
                if (q.n_seeds < (1 << 14) - 2) q.n_seeds += 1;
                score += 1;
            }
        }
        if (score) continue;
        // _left_target (bwtsw2_aux.c:96-117)
        int64_t lt = ((p.beg + 1) / 2 * o.a + o.r) / o.r + lq;
        if (lt > p.k) lt = p.k;
        int64_t lo = std::max(p.k - 1 - lt, (int64_t)0);
        int64_t ntgt = (p.k - 1) - lo;
        if (ntgt < 0) ntgt = 0;
        tgt.resize((size_t)ntgt);
        for (int64_t m = 0; m < ntgt; ++m) {
            int64_t idx = p.k - 1 - m;
            tgt[(size_t)m] = is_rev ? pac[l_pac - 1 - idx] : pac[idx];
        }
        const uint8_t* qseg = rquery.data() + (lq - p.beg);
        int64_t nq = p.beg;
        int32_t out3[3];
        int64_t pn = 0;
        int rc = aln_extend_u8(tgt.data(), (int)ntgt, qseg, (int)nq, mat,
                               5, o.q, o.r, o.bw, (int32_t)p.G, 0, out3,
                               dummy_path.data(), 4, &pn);
        if (rc != 0) return false;  // overflow guard unmodelled
        if (out3[0] > p.G) {
            p.G = out3[0];
            p.len += out3[1];
            p.beg -= out3[2];
            p.k -= out3[1];
        }
    }
    return true;
}

static bool extend_rght(const Opt& o, std::vector<CHit>* bp,
                        const uint8_t* query_seq, int64_t lq,
                        const uint8_t* pac, int64_t l_pac, bool is_rev) {
    std::vector<CHit>& b = *bp;
    int32_t mat[25];
    build_mat(o, mat);
    std::vector<uint8_t> tgt;
    std::vector<uint8_t> dummy_path(4);
    for (CHit& p : b) {
        if (p.l) continue;
        int64_t lt = ((lq - p.beg + 1) / 2 * o.a + o.r) / o.r + lq;
        int64_t hi = std::min(p.k + lt, l_pac);
        int64_t ntgt = hi - p.k;
        if (ntgt < 0) ntgt = 0;
        tgt.resize((size_t)ntgt);
        for (int64_t m = 0; m < ntgt; ++m) {
            int64_t idx = p.k + m;
            tgt[(size_t)m] = is_rev ? pac[l_pac - 1 - idx] : pac[idx];
        }
        int32_t out3[3];
        int64_t pn = 0;
        int rc = aln_extend_u8(tgt.data(), (int)ntgt,
                               query_seq + p.beg, (int)(lq - p.beg), mat,
                               5, o.q, o.r, o.bw, 1, 0, out3,
                               dummy_path.data(), 4, &pn);
        if (rc != 0) return false;
        if (out3[0] >= p.G) {
            p.G = out3[0];
            p.len = out3[1];
            p.end = out3[2] + p.beg;
        }
    }
    return true;
}

// merge_hits (bwtsw2_aux.c:230-250): fold src into dst
static void merge_hits_into(std::vector<CHit>* dst, std::vector<CHit>* src,
                            int64_t l, bool is_reverse) {
    for (CHit& p : *src) {
        if (is_reverse) {
            int64_t x = p.beg;
            p.beg = l - p.end;
            p.end = l - x;
            p.flag |= 0x10;
        }
        dst->push_back(p);
    }
    src->clear();
}

// flag_fr (bwtsw2_aux.c:279-300)
static void flag_fr(std::vector<CHit>* b0, std::vector<CHit>* b1) {
    for (CHit& p : *b0) p.flag |= 0x10000;
    for (CHit& p : *b1) p.flag |= 0x20000;
    for (CHit& p : *b0)
        for (CHit& q : *b1)
            if (q.beg == p.beg && q.end == p.end && q.k == p.k
                && q.len == p.len && q.G == p.G) {
                q.flag |= 0x30000;
                p.flag |= 0x30000;
                break;
            }
}

// ---------------------------------------------------------------------
// per-read phase A: bsw2_aln1_core up to (not including) the final
// bsw2_resolve_query_overlaps (bwtsw2_aux.c:252-276)
// ---------------------------------------------------------------------

struct Batch {
    GFm fwd, rev;
    const uint8_t* pac;
    int64_t l_pac;
    Opt opt0;  // t/bw hold the GLOBAL defaults here
};

// env-gated phase-A cost split (NABWA_BSW_TIMING)
static std::atomic<long long> g_core_ns{0}, g_ext_ns{0}, g_misc_ns{0};
static inline long long now_ns() {
    return std::chrono::duration_cast<std::chrono::nanoseconds>(
        std::chrono::steady_clock::now().time_since_epoch()).count();
}

static bool aln1_core_pre(const Batch& B, const Opt& o, const GFm& gfm,
                          int64_t l, const uint8_t* seqA,
                          const uint8_t* seqB, bool is_rev,
                          std::vector<CHit>* merged_out) {
    const bool tmg = std::getenv("NABWA_BSW_TIMING") != nullptr;
    long long t0 = tmg ? now_ns() : 0;
    const uint8_t* seqs[2] = {seqA, seqB};
    std::vector<CHit> ball[2], bnar[2];
    for (int k = 0; k < 2; ++k) {
        Bwtl T;
        build_bwtl(seqs[k], (int)l, &T);
        std::vector<int64_t> hits_raw((size_t)(2 * l) * 9, 0);
        int64_t b1cap = 16 * l + 64;
        std::vector<int64_t> b1_raw((size_t)b1cap * 9);
        int64_t b1n = 0;
        int rc = bsw2_core_u32(T.sa.data(), T.L2, T.cum.data(), T.primary,
                               (int)l, gfm.bwt, gfm.primary, gfm.L2,
                               gfm.seq_len, o.a, o.b, o.q, o.r, o.bw,
                               o.z, o.t, o.is_, hits_raw.data(),
                               b1_raw.data(), b1cap, &b1n);
        if (rc != 0) {
            // narrow-hit overflow: retry with the exact size
            b1cap = b1n;
            b1_raw.assign((size_t)b1cap * 9, 0);
            std::fill(hits_raw.begin(), hits_raw.end(), 0);
            rc = bsw2_core_u32(T.sa.data(), T.L2, T.cum.data(), T.primary,
                               (int)l, gfm.bwt, gfm.primary, gfm.L2,
                               gfm.seq_len, o.a, o.b, o.q, o.r, o.bw,
                               o.z, o.t, o.is_, hits_raw.data(),
                               b1_raw.data(), b1cap, &b1n);
            if (rc != 0) return false;
        }
        ball[k].assign((const CHit*)hits_raw.data(),
                       (const CHit*)hits_raw.data() + 2 * l);
        bnar[k].assign((const CHit*)b1_raw.data(),
                       (const CHit*)b1_raw.data() + b1n);
        resolve_duphits(&gfm, &ball[k], o.is_);
        resolve_duphits(&gfm, &bnar[k], o.is_);
    }
    long long t1 = tmg ? now_ns() : 0;
    if (tmg) g_core_ns += t1 - t0;
    chain_filter(o, l, &bnar[0], &bnar[1]);
    std::vector<CHit> out[2];
    for (int k = 0; k < 2; ++k) {
        if (!extend_left(o, &bnar[k], seqs[k], l, B.pac, B.l_pac, is_rev))
            return false;
        merge_hits_into(&ball[k], &bnar[k], l, false);
        resolve_duphits(nullptr, &ball[k], 0);
        if (!extend_rght(o, &ball[k], seqs[k], l, B.pac, B.l_pac, is_rev))
            return false;
        out[k].swap(ball[k]);
    }
    merge_hits_into(&out[0], &out[1], l, true);
    merged_out->swap(out[0]);
    if (tmg) g_ext_ns += now_ns() - t1;
    return true;
}

// gen_cigar (bwtsw2_aux.c:167-216): (op,len) pairs per hit
static bool gen_cigar_read(const Opt& o, int64_t lq, const uint8_t* seq0,
                           const uint8_t* seq1, const uint8_t* pac,
                           const std::vector<CHit>& b,
                           std::vector<std::vector<int32_t>>* cigs) {
    int32_t mat[25];
    build_mat(o, mat);
    cigs->assign(b.size(), {});
    std::vector<uint8_t> path;
    for (size_t i = 0; i < b.size(); ++i) {
        const CHit& p = b[i];
        if (p.l) continue;
        int64_t beg = (p.flag & 0x10) ? lq - p.end : p.beg;
        int64_t end = (p.flag & 0x10) ? lq - p.beg : p.end;
        const uint8_t* query = ((p.flag & 0x10) ? seq1 : seq0) + beg;
        int64_t nq = end - beg;
        const uint8_t* target = pac + p.k;
        int64_t nt = p.len;
        int64_t cap = nt + nq + 2;
        path.resize((size_t)cap);
        int64_t pn = 0;
        aln_global_u8(target, (int)nt, query, (int)nq, mat, 5, o.q, o.r,
                      o.r, o.bw, path.data(), cap, &pn);
        std::vector<int32_t>& cig = (*cigs)[i];
        // path bytes are last-to-first; reference order = reversed
        for (int64_t m = pn - 1; m >= 0; --m) {
            int32_t op = path[(size_t)m];
            if (!cig.empty() && cig[cig.size() - 2] == op)
                cig.back() += 1;
            else {
                cig.push_back(op);
                cig.push_back(1);
            }
        }
        if (beg != 0 || end < lq) {
            if (beg != 0)
                cig.insert(cig.begin(), {4, (int32_t)beg});
            if (end < lq) {
                cig.push_back(4);
                cig.push_back((int32_t)(lq - end));
            }
        }
    }
    return true;
}

struct ReadCtx {
    int64_t l;
    const uint8_t* raw;           // codes with 4/5 = ambiguous
    bool has_amb;
    std::vector<uint8_t> seq, seq1, rseq0, rseq1;
    Opt o;                        // per-read adjusted t/bw
    bool preA_ok;                 // phase A ran (no-amb reads only)
    bool failed;                  // unmodelled overflow -> caller bails
    std::vector<CHit> pre_fwd;
    std::vector<CHit> final_hits;
    std::vector<std::vector<int32_t>> cigs;
};

// per-read opt adjustment + strand sequences (bwtsw2_aux.c:472-485 and
// the 4-array fill in bwasw.py aln_one); amb fill needs the rng and is
// done by the caller for has_amb reads
static void prep_read(const Batch& B, ReadCtx* R) {
    int64_t l = R->l;
    Opt o = B.opt0;
    if ((double)o.t < std::log((double)l) * o.coef)
        o.t = (int)(std::log((double)l) * o.coef + .499);
    int64_t k = (l * o.a - 2 * o.q) / (2 * o.r + o.a);
    int64_t i = (l * o.a - o.a - o.t) / o.r;
    if (k > i) k = i;
    if (k < 1) k = 1;
    o.bw = (int)std::min((int64_t)B.opt0.bw, k);
    R->o = o;
    R->seq.resize((size_t)l);
    R->seq1.resize((size_t)l);
    R->rseq0.resize((size_t)l);
    R->rseq1.resize((size_t)l);
}

static void fill_strands(ReadCtx* R, Rng* rng, int64_t* n_amb_out) {
    int64_t l = R->l;
    int64_t n_amb = 0;
    for (int64_t i = 0; i < l; ++i) {
        int c = R->raw[i];
        if (c >= 4) {
            c = (int)(rng->drand() * 4);
            ++n_amb;
        }
        R->seq[(size_t)i] = (uint8_t)c;
        R->seq1[(size_t)(l - 1 - i)] = (uint8_t)(3 - c);
        R->rseq0[(size_t)(l - 1 - i)] = (uint8_t)c;
        R->rseq1[(size_t)i] = (uint8_t)(3 - c);
    }
    *n_amb_out = n_amb;
}

}  // namespace

extern "C" {

// Full bwasw batch: phase A (parallel, rng-free), phase B (sequential
// drand48 replay), phase C (parallel CIGARs).  Outputs per read:
// hit_cnt[i] hits of 9 int64 fields appended to hits_out; per hit,
// cig_cnt[h] (op,len) int32 pairs appended to cig_out.  Returns total
// hits, or -1 on output overflow / unmodelled overflow guard (caller
// falls back to the Python driver).
int64_t bsw2_aln_batch(
    const uint32_t* fbwt, uint32_t fprimary, const uint32_t* fl2,
    uint32_t fseq_len, const uint32_t* fsa, int32_t fsa_intv,
    const uint32_t* rbwt, uint32_t rprimary, const uint32_t* rl2,
    uint32_t rseq_len, const uint32_t* rsa, int32_t rsa_intv,
    const uint8_t* pac, int64_t l_pac,
    const uint8_t* codes, const int64_t* offs, int64_t n_reads,
    const int32_t* iopt, float mask_level, double coef,
    uint64_t* rng_io, int32_t n_threads,
    int64_t* hit_cnt, int64_t* hits_out, int64_t hits_cap,
    int32_t* cig_out, int64_t cig_cap, int64_t* cig_cnt) {
    Batch B;
    B.fwd = GFm{fbwt, fprimary, fl2, fseq_len, fsa, fsa_intv};
    B.rev = GFm{rbwt, rprimary, rl2, rseq_len, rsa, rsa_intv};
    B.pac = pac;
    B.l_pac = l_pac;
    B.opt0.a = iopt[0];
    B.opt0.b = iopt[1];
    B.opt0.q = iopt[2];
    B.opt0.r = iopt[3];
    B.opt0.t = iopt[4];
    B.opt0.bw = iopt[5];
    B.opt0.z = iopt[6];
    B.opt0.is_ = iopt[7];
    B.opt0.t_seeds = iopt[8];
    B.opt0.hard_clip = iopt[9];
    B.opt0.mask_level = mask_level;
    B.opt0.coef = coef;

    std::vector<ReadCtx> reads((size_t)n_reads);
    for (int64_t i = 0; i < n_reads; ++i) {
        ReadCtx& R = reads[(size_t)i];
        R.l = offs[i + 1] - offs[i];
        R.raw = codes + offs[i];
        R.has_amb = false;
        R.preA_ok = false;
        R.failed = false;
        for (int64_t j = 0; j < R.l; ++j)
            if (R.raw[j] >= 4) R.has_amb = true;
        prep_read(B, &R);
    }

    int nth = n_threads > 0 ? n_threads
        : (int)std::thread::hardware_concurrency();
    if (nth < 1) nth = 1;
    const bool timing = std::getenv("NABWA_BSW_TIMING") != nullptr;
    auto clk = [] { return std::chrono::duration<double>(
        std::chrono::steady_clock::now().time_since_epoch()).count(); };
    double tA0 = timing ? clk() : 0.0;

    // phase A: rng-free forward-index work for amb-free reads
    {
        std::atomic<int64_t> cursor(0);
        auto worker = [&]() {
            Rng dummy{0};
            for (;;) {
                int64_t i = cursor.fetch_add(1);
                if (i >= n_reads) break;
                ReadCtx& R = reads[(size_t)i];
                if (R.has_amb) continue;
                int64_t n_amb = 0;
                fill_strands(&R, &dummy, &n_amb);
                if (R.l - n_amb < R.o.t) continue;  // unmapped, no work
                if (!aln1_core_pre(B, R.o, B.fwd, R.l, R.seq.data(),
                                   R.seq1.data(), false, &R.pre_fwd)) {
                    R.failed = true;
                    continue;
                }
                R.preA_ok = true;
            }
        };
        std::vector<std::thread> ts;
        for (int t = 1; t < nth; ++t) ts.emplace_back(worker);
        worker();
        for (auto& t : ts) t.join();
    }

    double tB0 = timing ? clk() : 0.0;
    // phase B: sequential drand48 replay in read order
    Rng rng{*rng_io};
    for (int64_t i = 0; i < n_reads; ++i) {
        ReadCtx& R = reads[(size_t)i];
        if (R.failed) return -1;
        int64_t n_amb = 0;
        if (R.has_amb) {
            fill_strands(&R, &rng, &n_amb);
        } else {
            // no draws consumed; strands already filled in phase A (or
            // fill now for the unmapped-short case)
            if (!R.preA_ok) {
                Rng dummy{0};
                fill_strands(&R, &dummy, &n_amb);
                n_amb = 0;
            }
        }
        if (R.l - n_amb < R.o.t) continue;  // unmapped
        if (R.has_amb || !R.preA_ok) {
            if (!aln1_core_pre(B, R.o, B.fwd, R.l, R.seq.data(),
                               R.seq1.data(), false, &R.pre_fwd))
                return -1;
        }
        std::vector<CHit> b0;
        b0.swap(R.pre_fwd);
        resolve_query_overlaps(&b0, B.opt0.mask_level, &rng);
        bool need_rev = false;
        for (const CHit& h : b0)
            if (h.n_seeds < B.opt0.t_seeds) need_rev = true;
        if (need_rev) {
            std::vector<CHit> b1;
            if (!aln1_core_pre(B, R.o, B.rev, R.l, R.rseq0.data(),
                               R.rseq1.data(), true, &b1))
                return -1;
            resolve_query_overlaps(&b1, B.opt0.mask_level, &rng);
            for (CHit& p : b1) {
                int64_t x = p.beg;
                p.beg = R.l - p.end;
                p.end = R.l - x;
                if (p.l == 0) p.k = B.l_pac - (p.k + p.len);
            }
            flag_fr(&b0, &b1);
            merge_hits_into(&b0, &b1, R.l, false);
            resolve_duphits(nullptr, &b0, 0);
            resolve_query_overlaps(&b0, B.opt0.mask_level, &rng);
        }
        R.final_hits.swap(b0);
    }
    *rng_io = rng.x;

    double tC0 = timing ? clk() : 0.0;
    // phase C: CIGARs, parallel
    {
        std::atomic<int64_t> cursor(0);
        std::atomic<bool> bad(false);
        auto worker = [&]() {
            for (;;) {
                int64_t i = cursor.fetch_add(1);
                if (i >= n_reads) break;
                ReadCtx& R = reads[(size_t)i];
                if (R.final_hits.empty()) continue;
                if (!gen_cigar_read(R.o, R.l, R.seq.data(), R.seq1.data(),
                                    B.pac, R.final_hits, &R.cigs))
                    bad.store(true);
            }
        };
        std::vector<std::thread> ts;
        for (int t = 1; t < nth; ++t) ts.emplace_back(worker);
        worker();
        for (auto& t : ts) t.join();
        if (bad.load()) return -1;
    }

    if (timing)
        std::fprintf(stderr,
                     "[bsw2.timing] n=%lld A %.3fs B %.3fs C %.3fs "
                     "(core %.3fs ext %.3fs cpu-s)\n",
                     (long long)n_reads, tB0 - tA0, tC0 - tB0,
                     clk() - tC0, g_core_ns.load() / 1e9,
                     g_ext_ns.load() / 1e9);
    // marshal out
    int64_t htot = 0, ctot = 0;
    for (int64_t i = 0; i < n_reads; ++i) {
        ReadCtx& R = reads[(size_t)i];
        hit_cnt[i] = (int64_t)R.final_hits.size();
        for (size_t hh = 0; hh < R.final_hits.size(); ++hh) {
            if (htot >= hits_cap) return -1;
            std::memcpy(hits_out + htot * 9, &R.final_hits[hh],
                        9 * sizeof(int64_t));
            const std::vector<int32_t>& cig = R.cigs[hh];
            int64_t npairs = (int64_t)cig.size() / 2;
            if (ctot + npairs > cig_cap) return -1;
            std::memcpy(cig_out + ctot * 2, cig.data(),
                        cig.size() * sizeof(int32_t));
            cig_cnt[htot] = npairs;
            ++htot;
            ctot += npairs;
        }
    }
    return htot;
}

}  // extern "C"
