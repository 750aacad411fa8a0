// Native (host C++) engine for BWA's bounded-DFS gapped search
// (bwt_match_gap, bwtgap.c:104-266), bit-exact with the Python scalar
// oracle (nabwa_tpu/refmodel/dfs_scalar.py) and the device engines.
//
// Role in the TPU pipeline: the Pallas kernel runs the batch in lockstep,
// so a handful of pathological reads (deep stacks, huge hit lists) would
// stall whole blocks.  Those reads are drained here instead — an
// irregular, pointer-chasing search is exactly what a scalar core does
// best.  Threaded over reads with a work-stealing atomic cursor.
//
// BWT layout: interleaved checkpoints, words[] = repeating
// [cnt[4] | 8 bwt words] per 128 bases (bwt_bwtupdate_core,
// bwtmisc.c:125-152).  All rank math matches bwt.c:83-216.

#ifdef NABWA_TRACE
#include <cstdio>
#endif
#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr uint32_t NEG1 = 0xFFFFFFFFu;
constexpr int STATE_M = 0, STATE_I = 1, STATE_D = 2;
constexpr int MODE_GAPE = 0x01, MODE_LOGGAP = 0x04, MODE_NONSTOP = 0x10;  // bwtaln.h:132-136

struct Fm {
    const uint32_t* bwt;
    uint32_t primary;
    uint32_t L2[5];
    uint32_t seq_len;
};

// count of 2-bit code c among the top `n` bases of one 16-base word
static inline uint32_t word_cnt(uint32_t w, int c, int n) {
    uint32_t lo = w & 0x55555555u;
    uint32_t hi = (w >> 1) & 0x55555555u;
    uint32_t x0 = (c & 1) ? lo : (lo ^ 0x55555555u);
    uint32_t x1 = (c & 2) ? hi : (hi ^ 0x55555555u);
    uint32_t m = n >= 16 ? 0xFFFFFFFFu : ~((1u << ((16 - n) << 1)) - 1u);
    return (uint32_t)__builtin_popcount(x0 & x1 & m);
}

// bit mask of lanes holding code c in a 64-bit word pair (one bit set per
// matching 2-bit base, at the base's low bit position)
static inline uint64_t code_bits64(uint64_t v, int c) {
    uint64_t lo = v & 0x5555555555555555ull;
    uint64_t hi = (v >> 1) & 0x5555555555555555ull;
    return ((c & 1) ? lo : lo ^ 0x5555555555555555ull)
        & ((c & 2) ? hi : hi ^ 0x5555555555555555ull);
}

// count of code c among bases [0, kk] of a block's data words (pairs of
// full words fold into one 64-bit popcount; word_cnt handles the leftover
// and the masked partial word, including c == 0)
static inline uint32_t scan_cnt(const uint32_t* w, int kk, int c) {
    int wi = kk / 16;
    uint32_t n = 0;
    int j = 0;
    for (; j + 2 <= wi; j += 2)
        n += (uint32_t)__builtin_popcountll(
            code_bits64(((uint64_t)w[j] << 32) | w[j + 1], c));
    if (j < wi)
        n += word_cnt(w[j], c, 16);
    return n + word_cnt(w[wi], c, (kk & 15) + 1);
}

// bwt_occ (bwt.c:92-115)
static uint32_t occ1(const Fm& fm, uint32_t k, int c) {
    if (k == fm.seq_len) return fm.L2[c + 1] - fm.L2[c];
    if (k == NEG1) return 0;
    if (k >= fm.primary) --k;
    const uint32_t* p = fm.bwt + (k / 128) * 12;
    return p[c] + scan_cnt(p + 4, (int)(k % 128), c);
}

// all-4-codes counting: tally codes 1..3 with three popcounts (code 0 is
// derived from the base count), fusing word pairs into one 64-bit
// popcount each — ~4x fewer ops than a per-code word_cnt sweep
static inline void word_cnt123(uint32_t v, uint32_t* c1, uint32_t* c2,
                               uint32_t* c3) {
    uint32_t lo = v & 0x55555555u, hi = (v >> 1) & 0x55555555u;
    *c1 += (uint32_t)__builtin_popcount(lo & ~hi);
    *c2 += (uint32_t)__builtin_popcount(hi & ~lo);
    *c3 += (uint32_t)__builtin_popcount(hi & lo);
}

static inline void pair_cnt123(uint64_t v, uint32_t* c1, uint32_t* c2,
                               uint32_t* c3) {
    uint64_t lo = v & 0x5555555555555555ull;
    uint64_t hi = (v >> 1) & 0x5555555555555555ull;
    *c1 += (uint32_t)__builtin_popcountll(lo & ~hi);
    *c2 += (uint32_t)__builtin_popcountll(hi & ~lo);
    *c3 += (uint32_t)__builtin_popcountll(hi & lo);
}

// mask keeping the top ((kk & 15) + 1) bases of a 16-base word (bases are
// MSB-first); masked-off bases become code 0, never counted in c1..c3
static inline uint32_t part_mask(int kk) {
    return ~((1u << ((15 - (kk & 15)) << 1)) - 1u);
}

// bwt_occ4 core (bwt.c:159-176) for k not in {-1, seq_len}
static void occ4_raw(const Fm& fm, uint32_t k, uint32_t cnt[4]) {
    if (k >= fm.primary) --k;
    const uint32_t* p = fm.bwt + (k / 128) * 12;
    const uint32_t* w = p + 4;
    int kk = (int)(k % 128);
    int wi = kk / 16;
    uint32_t c1 = 0, c2 = 0, c3 = 0;
    int j = 0;
    for (; j + 2 <= wi; j += 2)
        pair_cnt123(((uint64_t)w[j] << 32) | w[j + 1], &c1, &c2, &c3);
    uint32_t last = w[wi] & part_mask(kk);
    if (j < wi)
        pair_cnt123(((uint64_t)w[j] << 32) | last, &c1, &c2, &c3);
    else
        word_cnt123(last, &c1, &c2, &c3);
    cnt[0] = p[0] + (uint32_t)(kk + 1) - c1 - c2 - c3;
    cnt[1] = p[1] + c1;
    cnt[2] = p[2] + c2;
    cnt[3] = p[3] + c3;
}

// bwt_2occ4 semantics (scalar model two_occ4): edge cases per operand
static void occ4_edge(const Fm& fm, uint32_t k, uint32_t cnt[4]) {
    if (k == NEG1) { for (int c = 0; c < 4; ++c) cnt[c] = 0; return; }
    if (k == fm.seq_len) {
        for (int c = 0; c < 4; ++c) cnt[c] = fm.L2[c + 1] - fm.L2[c];
        return;
    }
    occ4_raw(fm, k, cnt);
}

// bwt_2occ (bwt.c:118-153) semantics for cal_width: occ of c at k and l
// sharing one checkpoint scan when both land in the same 128-base block
static inline void occ2(const Fm& fm, uint32_t k, uint32_t l, int c,
                        uint32_t* ok, uint32_t* ol) {
    uint32_t _k = (k >= fm.primary) ? k - 1 : k;
    uint32_t _l = (l >= fm.primary) ? l - 1 : l;
    if (_l >> 7 != _k >> 7 || k == NEG1 || l == NEG1
        || k == fm.seq_len || l == fm.seq_len) {
        *ok = occ1(fm, k, c);
        *ol = occ1(fm, l, c);
        return;
    }
    const uint32_t* p = fm.bwt + (_k / 128) * 12;
    const uint32_t* w = p + 4;
    int kk = (int)(_k % 128), ll = (int)(_l % 128);
    int wk = kk / 16, wl = ll / 16;
    uint32_t n = 0;      // count over full words [0, wk)
    int j = 0;
    for (; j + 2 <= wk; j += 2)
        n += (uint32_t)__builtin_popcountll(
            code_bits64(((uint64_t)w[j] << 32) | w[j + 1], c));
    if (j < wk)
        n += word_cnt(w[j], c, 16);
    *ok = p[c] + n + word_cnt(w[wk], c, (kk & 15) + 1);
    for (j = wk; j + 2 <= wl; j += 2)
        n += (uint32_t)__builtin_popcountll(
            code_bits64(((uint64_t)w[j] << 32) | w[j + 1], c));
    if (j < wl)
        n += word_cnt(w[j], c, 16);
    *ol = p[c] + n + word_cnt(w[wl], c, (ll & 15) + 1);
}

// bwt_2occ4 (bwt.c:179-216): occ4 at k and l with one shared scan when
// both fall in the same checkpoint block
static void two_occ4(const Fm& fm, uint32_t k, uint32_t l,
                     uint32_t cnt_k[4], uint32_t cnt_l[4]) {
    uint32_t _k = (k >= fm.primary) ? k - 1 : k;
    uint32_t _l = (l >= fm.primary) ? l - 1 : l;
    if (_l >> 7 != _k >> 7 || k == NEG1 || l == NEG1
        || k == fm.seq_len || l == fm.seq_len) {
        occ4_edge(fm, k, cnt_k);
        occ4_edge(fm, l, cnt_l);
        return;
    }
    const uint32_t* p = fm.bwt + (_k / 128) * 12;
    const uint32_t* w = p + 4;
    int kk = (int)(_k % 128), ll = (int)(_l % 128);
    int wk = kk / 16, wl = ll / 16;
    uint32_t f1 = 0, f2 = 0, f3 = 0;    // shared full-word tallies
    int j = 0;
    for (; j + 2 <= wk; j += 2)
        pair_cnt123(((uint64_t)w[j] << 32) | w[j + 1], &f1, &f2, &f3);
    if (j < wk)
        word_cnt123(w[j], &f1, &f2, &f3);
    uint32_t k1 = f1, k2 = f2, k3 = f3;
    word_cnt123(w[wk] & part_mask(kk), &k1, &k2, &k3);
    cnt_k[0] = p[0] + (uint32_t)(kk + 1) - k1 - k2 - k3;
    cnt_k[1] = p[1] + k1;
    cnt_k[2] = p[2] + k2;
    cnt_k[3] = p[3] + k3;
    for (j = wk; j + 2 <= wl; j += 2)
        pair_cnt123(((uint64_t)w[j] << 32) | w[j + 1], &f1, &f2, &f3);
    if (j < wl)
        word_cnt123(w[j], &f1, &f2, &f3);
    word_cnt123(w[wl] & part_mask(ll), &f1, &f2, &f3);
    cnt_l[0] = p[0] + (uint32_t)(ll + 1) - f1 - f2 - f3;
    cnt_l[1] = p[1] + f1;
    cnt_l[2] = p[2] + f2;
    cnt_l[3] = p[3] + f3;
}

// bwt_match_exact_alt (bwt.c:237-252)
static int match_exact_alt(const Fm& fm, const uint8_t* str, int len,
                           uint32_t& k, uint32_t& l) {
    for (int i = len - 1; i >= 0; --i) {
        int c = str[i];
        if (c > 3) return 0;
        k = fm.L2[c] + occ1(fm, k - 1, c) + 1;
        l = fm.L2[c] + occ1(fm, l, c);
        if (k > l) return 0;
    }
    return (int)(l - k + 1);
}

// bwt_cal_width (bwtaln.c:52-76)
static void cal_width(const Fm& fm, const uint8_t* str, int len,
                      uint32_t* w, int32_t* bid) {
    uint32_t k = 0, l = fm.seq_len;
    int32_t cur = 0;
    for (int i = 0; i < len; ++i) {
        int c = str[i];
        if (c < 4) {
            uint32_t ok, ol;
            occ2(fm, k - 1, l, c, &ok, &ol);
            k = fm.L2[c] + ok + 1;
            l = fm.L2[c] + ol;
        }
        if (k > l || c > 3) { k = 0; l = fm.seq_len; ++cur; }
        w[i] = l - k + 1;
        bid[i] = cur;
    }
    w[len] = 0;
    bid[len] = cur + 1;
}

struct Entry {
    uint32_t k, l;
    int16_t i, last_diff_pos;
    uint8_t a, n_mm, n_gapo, n_gape, state;
};

struct Opts {
    int s_mm, s_gapo, s_gape;
    int max_gape, max_gapo_batch;
    int indel_end_skip, max_del_occ;
    int64_t max_entries;
    int max_top2, max_seed_diff, seed_len, mode;
    int hits_cap;
};

struct Hit { int32_t n_mm, n_gapo, n_gape, a, k, l, score; };

static inline int int_log2(uint32_t v) {
    int c = 0;
    if (v & 0xFFFF0000u) { v >>= 16; c |= 16; }
    if (v & 0xFF00u) { v >>= 8; c |= 8; }
    if (v & 0xF0u) { v >>= 4; c |= 4; }
    if (v & 0xCu) { v >>= 2; c |= 2; }
    if (v & 0x2u) c |= 1;
    return c;
}

// gap_shadow (bwtgap.c:81-91)
static void gap_shadow(uint32_t x, uint32_t max_seq_len, int last_diff_pos,
                       uint32_t* w, int32_t* bid) {
    int j = 0;
    for (int i = 0; i < last_diff_pos; ++i) {
        if (w[i] > x) w[i] -= x;
        else if (w[i] == x) {
            bid[i] = 1;
            ++j;
            w[i] = max_seq_len - (uint32_t)j;
        }
    }
}

struct Stack {
    std::vector<std::vector<Entry>> bins;
    int best;
    int64_t n_entries = 0;
    Stack() : best(0) {}
    explicit Stack(int n_bins) : bins(n_bins), best(n_bins) {}
    void reset(int n_bins) {
        if ((int)bins.size() < n_bins) bins.resize(n_bins);
        for (auto& b : bins) b.clear();
        best = n_bins;
        n_entries = 0;
    }
    void push(const Entry& e, int score) {
        bins[score].push_back(e);
        ++n_entries;
        if (best > score) best = score;
    }
    Entry pop() {
        Entry e = bins[best].back();
        bins[best].pop_back();
        --n_entries;
        if (bins[best].empty() && n_entries) {
            int i = best + 1;
            while (i < (int)bins.size() && bins[i].empty()) ++i;
            best = i;
        } else if (n_entries == 0) {
            best = (int)bins.size();
        }
        return e;
    }
};

// per-thread reusable buffers: the per-read allocations (width arrays +
// ~100 score-bin vectors) cost more than the search itself on short reads
struct Arena {
    std::vector<uint32_t> w0, w1, sw0, sw1;
    std::vector<int32_t> b0, b1, sb0, sb1;
    Stack stack;
};

// bwt_match_gap (bwtgap.c:104-266) for one read.  Returns n_aln
// (-1 = hits_cap exceeded); hw_out gets the stack high-water mark.
static int match_gap(const Fm fms[2], int length, const uint8_t* seq,
                     const uint8_t* rseq, int max_diff, int max_gapo,
                     const Opts& opt, Hit* hits, int32_t* hw_out,
                     Arena& ar) {
    auto score_of = [&](int m, int o, int e) {
        return m * opt.s_mm + o * opt.s_gapo + e * opt.s_gape;
    };
    const bool mode_gape = opt.mode & MODE_GAPE;
    const bool mode_nonstop = opt.mode & MODE_NONSTOP;
    const bool mode_loggap = opt.mode & MODE_LOGGAP;

    int best_score = score_of(max_diff + 1, max_gapo + 1, opt.max_gape + 1);
    int best_diff = max_diff + 1;
    int64_t best_cnt = 0;
    int n_bins = best_score;
    int64_t hw = 0;
    int n_aln = 0;
    *hw_out = 0;

    int n_n = 0;
    for (int i = 0; i < length; ++i) n_n += seq[i] > 3;
    if (n_n > max_diff) return 0;

    // widths on the strand's own search index (models/aln.py: w0 from
    // fwd bwt with seq, w1 from rev bwt with rseq; strand a searches
    // fms[1-a], bwtgap.c:149)
    ar.w0.resize(length + 1); ar.w1.resize(length + 1);
    ar.b0.resize(length + 1); ar.b1.resize(length + 1);
    cal_width(fms[0], seq, length, ar.w0.data(), ar.b0.data());
    cal_width(fms[1], rseq, length, ar.w1.data(), ar.b1.data());
    uint32_t* W[2] = { ar.w0.data(), ar.w1.data() };
    int32_t* BID[2] = { ar.b0.data(), ar.b1.data() };

    const bool has_seed = opt.seed_len < length;
    uint32_t* SW[2] = { nullptr, nullptr };
    int32_t* SBID[2] = { nullptr, nullptr };
    if (has_seed) {
        int sl = opt.seed_len;
        ar.sw0.resize(sl + 1); ar.sw1.resize(sl + 1);
        ar.sb0.resize(sl + 1); ar.sb1.resize(sl + 1);
        cal_width(fms[0], seq + (length - sl), sl, ar.sw0.data(),
                  ar.sb0.data());
        cal_width(fms[1], rseq + (length - sl), sl, ar.sw1.data(),
                  ar.sb1.data());
        SW[0] = ar.sw0.data(); SW[1] = ar.sw1.data();
        SBID[0] = ar.sb0.data(); SBID[1] = ar.sb1.data();
    }

    Stack& stack = ar.stack;
    stack.reset(n_bins + 1);
    stack.push({0, fms[0].seq_len, (int16_t)length, 0, 0, 0, 0, 0,
                STATE_M}, 0);
    stack.push({0, fms[0].seq_len, (int16_t)length, 0, 1, 0, 0, 0,
                STATE_M}, 0);

    auto push = [&](int a, int i, uint32_t k, uint32_t l, int n_mm,
                    int n_gapo, int n_gape, int state, bool is_diff) {
        int sc = score_of(n_mm, n_gapo, n_gape);
        Entry e;
        e.k = k; e.l = l; e.i = (int16_t)i;
        e.last_diff_pos = (int16_t)(is_diff ? i : 0);
        e.a = (uint8_t)a; e.n_mm = (uint8_t)n_mm;
        e.n_gapo = (uint8_t)n_gapo; e.n_gape = (uint8_t)n_gape;
        e.state = (uint8_t)state;
        stack.push(e, sc);
    };

    while (stack.n_entries) {
        if (hw < stack.n_entries) hw = stack.n_entries;
        if (stack.n_entries > opt.max_entries) break;
        Entry e = stack.pop();
        uint32_t k = e.k, l = e.l;
        int a = e.a, i = e.i;
        int e_score = score_of(e.n_mm, e.n_gapo, e.n_gape);
#ifdef NABWA_TRACE
        fprintf(stderr, "POP %lld %d %d %d %u %u %d %d %d %d %d\n",
                (long long)stack.n_entries + 1, e_score, a, i, k, l,
                (int)e.n_mm, (int)e.n_gapo, (int)e.n_gape, (int)e.state,
                (int)e.last_diff_pos);
#endif
        if (!mode_nonstop && e_score > best_score + opt.s_mm) break;

        int m = max_diff - (e.n_mm + e.n_gapo);
        if (mode_gape) m -= e.n_gape;
        if (m < 0) continue;
        const Fm& fm = fms[1 - a];
        const uint8_t* strn = a == 0 ? seq : rseq;
        uint32_t* w = W[a];
        int32_t* bid = BID[a];
        int m_seed = 0;
        if (has_seed) {
            m_seed = opt.max_seed_diff - (e.n_mm + e.n_gapo);
            if (mode_gape) m_seed -= e.n_gape;
        }
        if (i > 0 && m < bid[i - 1]) continue;

        bool hit_found = false;
        if (i == 0) {
            hit_found = true;
        } else if (m == 0 && (e.state == STATE_M || mode_gape
                              || e.n_gape == opt.max_gape)) {
            uint32_t k2 = k, l2 = l;
            if (match_exact_alt(fm, strn, i, k2, l2)) {
                hit_found = true;
                k = k2; l = l2;
            } else {
                continue;
            }
        }

        if (hit_found) {
            int score = score_of(e.n_mm, e.n_gapo, e.n_gape);
            bool do_add = true;
            if (n_aln == 0) {
                best_score = score;
                best_diff = e.n_mm + e.n_gapo + (mode_gape ? e.n_gape : 0);
                if (!mode_nonstop && best_diff + 1 < max_diff)
                    max_diff = best_diff + 1;
            }
            if (score == best_score) best_cnt += (int64_t)(l - k) + 1;
            else if (best_cnt > opt.max_top2) break;
            if (e.n_gapo) {
                for (int h = 0; h < n_aln; ++h)
                    if ((uint32_t)hits[h].k == k && (uint32_t)hits[h].l == l)
                        { do_add = false; break; }
            }
            if (do_add) {
                gap_shadow(l - k + 1, fm.seq_len, e.last_diff_pos, w, bid);
                if (n_aln >= opt.hits_cap) return -1;
                hits[n_aln++] = { e.n_mm, e.n_gapo, e.n_gape, a,
                                  (int32_t)k, (int32_t)l, score };
            }
            continue;
        }

        --i;
        uint32_t cnt_k[4], cnt_l[4];
        two_occ4(fm, k - 1, l, cnt_k, cnt_l);
        uint32_t occw = l - k + 1;

        bool allow_diff = true, allow_M = true;
        if (i > 0) {
            int ii = i - (length - opt.seed_len);
            if (bid[i - 1] > m - 1) allow_diff = false;
            else if (bid[i - 1] == m - 1 && bid[i] == m - 1
                     && w[i - 1] == w[i]) allow_M = false;
            if (has_seed && ii > 0) {
                const uint32_t* sw = SW[a];
                const int32_t* sbid = SBID[a];
                if (sbid[ii - 1] > m_seed - 1) allow_diff = false;
                else if (sbid[ii - 1] == m_seed - 1
                         && sbid[ii] == m_seed - 1
                         && sw[ii - 1] == sw[ii]) allow_M = false;
            }
        }

#ifdef NABWA_TRACE
        {
            int ii = i - (length - opt.seed_len);
            fprintf(stderr, "GATE i=%d ii=%d m=%d m_seed=%d ad=%d am=%d sbid_im1=%d bid_im1=%d\n",
                    i, ii, m, m_seed, (int)allow_diff, (int)allow_M,
                    (has_seed && ii > 0) ? SBID[a][ii - 1] : -99,
                    i > 0 ? bid[i - 1] : -99);
        }
#endif
        int tmp = mode_loggap
            ? int_log2((uint32_t)(e.n_gape + e.n_gapo)) / 2 + 1
            : e.n_gapo + e.n_gape;
        if (allow_diff && i >= opt.indel_end_skip + tmp
            && length - i >= opt.indel_end_skip + tmp) {
            if (e.state == STATE_M) {
                if (e.n_gapo < max_gapo) {
                    push(a, i, k, l, e.n_mm, e.n_gapo + 1, e.n_gape,
                         STATE_I, true);
                    for (int j = 0; j < 4; ++j) {
                        uint32_t dk = fm.L2[j] + cnt_k[j] + 1;
                        uint32_t dl = fm.L2[j] + cnt_l[j];
                        if (dk <= dl)
                            push(a, i + 1, dk, dl, e.n_mm, e.n_gapo + 1,
                                 e.n_gape, STATE_D, true);
                    }
                }
            } else if (e.state == STATE_I) {
                if (e.n_gape < opt.max_gape)
                    push(a, i, k, l, e.n_mm, e.n_gapo, e.n_gape + 1,
                         STATE_I, true);
            } else if (e.state == STATE_D) {
                if (e.n_gape < opt.max_gape
                    && (e.n_gape + e.n_gapo < max_diff
                        || occw < (uint32_t)opt.max_del_occ)) {
                    for (int j = 0; j < 4; ++j) {
                        uint32_t dk = fm.L2[j] + cnt_k[j] + 1;
                        uint32_t dl = fm.L2[j] + cnt_l[j];
                        if (dk <= dl)
                            push(a, i + 1, dk, dl, e.n_mm, e.n_gapo,
                                 e.n_gape + 1, STATE_D, true);
                    }
                }
            }
        }

        if (allow_diff && allow_M) {
            for (int j = 1; j <= 4; ++j) {
                int c = (strn[i] + j) & 3;
                bool is_mm = (j != 4 || strn[i] > 3);
                uint32_t mk = fm.L2[c] + cnt_k[c] + 1;
                uint32_t ml = fm.L2[c] + cnt_l[c];
                if (mk <= ml)
                    push(a, i, mk, ml, e.n_mm + (is_mm ? 1 : 0), e.n_gapo,
                         e.n_gape, STATE_M, is_mm);
            }
        } else if (strn[i] < 4) {
            int c = strn[i] & 3;
            uint32_t mk = fm.L2[c] + cnt_k[c] + 1;
            uint32_t ml = fm.L2[c] + cnt_l[c];
            if (mk <= ml)
                push(a, i, mk, ml, e.n_mm, e.n_gapo, e.n_gape, STATE_M,
                     false);
        }
    }
    *hw_out = (int32_t)(hw > 0x7FFFFFFF ? 0x7FFFFFFF : hw);
    return n_aln;
}

}  // namespace

extern "C" {

// exported single-shot bwt_2occ4 for host FM walks (bsw2_core's trie
// descent does one per node; the Python per-word popcount loop was the
// bwasw profile's top entry)
extern "C" int two_occ4_u32(const uint32_t* bwt_arr, uint32_t primary,
                            const uint32_t* L2, uint32_t seq_len,
                            uint32_t k, uint32_t l, uint32_t* out8) {
    Fm fm;
    fm.bwt = bwt_arr;
    fm.primary = primary;
    for (int c = 0; c < 5; ++c) fm.L2[c] = L2[c];
    fm.seq_len = seq_len;
    two_occ4(fm, k, l, out8, out8 + 4);
    return 0;
}

// Batch DFS over n reads, threaded.  seqs: uint8 [n][2][L] (seq, rseq,
// reversed-read orientation, padding = 4).  Outputs:
//   hits_out   int32 [n][hits_cap][7]  (n_mm,n_gapo,n_gape,a,k,l,score)
//   n_aln_out  int32 [n]  (-1 = hits_cap exceeded -> caller re-runs)
//   hw_out     int32 [n]  stack high-water
int dfs_match_gap_batch(
    const uint32_t* bwt_fwd, uint32_t primary_fwd,
    const uint32_t* bwt_rev, uint32_t primary_rev,
    const uint32_t* L2, uint32_t seq_len,
    const uint8_t* seqs, int L, const int32_t* lengths,
    const int32_t* maxdiff, int n,
    int s_mm, int s_gapo, int s_gape, int max_gape, int max_gapo,
    int indel_end_skip, int max_del_occ, int64_t max_entries,
    int max_top2, int max_seed_diff, int seed_len, int mode,
    int hits_cap, int n_threads,
    int32_t* hits_out, int32_t* n_aln_out, int32_t* hw_out) {
    Fm fms[2];
    fms[0].bwt = bwt_fwd; fms[0].primary = primary_fwd;
    fms[1].bwt = bwt_rev; fms[1].primary = primary_rev;
    for (int f = 0; f < 2; ++f) {
        std::memcpy(fms[f].L2, L2, 5 * sizeof(uint32_t));
        fms[f].seq_len = seq_len;
    }
    Opts opt{ s_mm, s_gapo, s_gape, max_gape, max_gapo, indel_end_skip,
              max_del_occ, max_entries, max_top2, max_seed_diff, seed_len,
              mode, hits_cap };

    if (n_threads <= 0) {
        n_threads = (int)std::thread::hardware_concurrency();
        if (n_threads <= 0) n_threads = 1;
    }
    if (n_threads > n) n_threads = n > 0 ? n : 1;

    std::atomic<int> cursor{0};
    auto work = [&]() {
        Arena ar;
        for (;;) {
            int i = cursor.fetch_add(1);
            if (i >= n) break;
            const uint8_t* seq = seqs + (size_t)i * 2 * L;
            const uint8_t* rseq = seq + L;
            n_aln_out[i] = match_gap(
                fms, lengths[i], seq, rseq, maxdiff[i], max_gapo, opt,
                reinterpret_cast<Hit*>(hits_out
                                       + (size_t)i * hits_cap * 7),
                &hw_out[i], ar);
        }
    };
    std::vector<std::thread> threads;
    for (int t = 1; t < n_threads; ++t) threads.emplace_back(work);
    work();
    for (auto& t : threads) t.join();
    return 0;
}

}  // extern "C"
