"""Scalar model of BWA's bounded-DFS gapped search (bwt_match_gap,
bwtgap.c:104-266) with bit-exact semantics: score-binned priority stack with
LIFO pop within a bin, all pruning rules (width bound, seed bound, top-2
stop, max_entries cap, tandem dedup, gap_shadow, indel-end gating), and the
zero-budget exact-match fast path.

This is the test oracle for the batched device engine and the host fallback
for reads that overflow the device stack.  It is also the documentation of
record for the search semantics — read it next to bwtgap.c.
"""

import numpy as np

from ..constants import (STATE_M, STATE_I, STATE_D, BWA_MODE_GAPE,
                         BWA_MODE_LOGGAP, BWA_MODE_NONSTOP)

_NEG1 = 0xFFFFFFFF


def aln_score(m, o, e, opt):
    return m * opt.s_mm + o * opt.s_gapo + e * opt.s_gape


def _int_log2(v):
    c = 0
    if v & 0xFFFF0000:
        v >>= 16
        c |= 16
    if v & 0xFF00:
        v >>= 8
        c |= 8
    if v & 0xF0:
        v >>= 4
        c |= 4
    if v & 0xC:
        v >>= 2
        c |= 2
    if v & 0x2:
        c |= 1
    return c


class GapStack:
    """Score-binned LIFO stacks (gap_stack_t, bwtgap.c:13-79)."""

    def __init__(self, n_bins):
        self.bins = [[] for _ in range(n_bins)]
        self.n_bins = n_bins
        self.best = n_bins
        self.n_entries = 0

    def push(self, entry, score):
        self.bins[score].append(entry)
        self.n_entries += 1
        if self.best > score:
            self.best = score

    def pop(self):
        e = self.bins[self.best].pop()
        self.n_entries -= 1
        if not self.bins[self.best] and self.n_entries:
            i = self.best + 1
            while i < self.n_bins and not self.bins[i]:
                i += 1
            self.best = i
        elif self.n_entries == 0:
            self.best = self.n_bins
        return e


class Entry:
    """gap_entry_t (bwtgap.h:7-12)."""

    __slots__ = ("score", "a", "i", "k", "l", "n_mm", "n_gapo", "n_gape",
                 "state", "last_diff_pos")

    def __init__(self, score, a, i, k, l, n_mm, n_gapo, n_gape, state,
                 last_diff_pos):
        self.score = score
        self.a = a
        self.i = i
        self.k = k
        self.l = l
        self.n_mm = n_mm
        self.n_gapo = n_gapo
        self.n_gape = n_gape
        self.state = state
        self.last_diff_pos = last_diff_pos


def gap_shadow(x, max_seq_len, last_diff_pos, w, bid):
    """bwtgap.c:81-91: shrink widths below the recorded hit count."""
    j = 0
    for i in range(last_diff_pos):
        if w[i] > x:
            w[i] -= x
        elif w[i] == x:
            bid[i] = 1
            j += 1
            w[i] = (max_seq_len - j) & _NEG1


def match_gap(fms, length, seqs, widths, seed_widths, opt, max_diff,
              max_gapo):
    """Run the DFS for one read.

    fms: (fm_fwd, fm_rev) ScalarFm pair ([0]=.bwt, [1]=.rbwt as loaded at
      bwtaln.c:189-193); strand a searches fms[1-a] (bwtgap.c:149).
    seqs: (seq, rseq) int arrays (reversed read / reversed complement).
    widths: ((w0,bid0),(w1,bid1)) mutable np arrays of len length+1.
    seed_widths: same for the seed suffix or None.
    max_diff/max_gapo: the per-read/batch local values (bwtaln.c:104-105,125).
    Returns (alns, max_entries_highwater); alns = list of dicts.
    """
    seqs = ([int(x) for x in seqs[0]], [int(x) for x in seqs[1]])
    best_score = aln_score(max_diff + 1, max_gapo + 1, opt.max_gape + 1, opt)
    best_diff = max_diff + 1
    best_cnt = 0
    n_bins = aln_score(max_diff + 1, max_gapo + 1, opt.max_gape + 1, opt)
    max_entries_hw = 0
    alns = []

    # too many Ns (bwtgap.c:118-123)
    if sum(1 for c in seqs[0][:length] if c > 3) > max_diff:
        return alns, 0

    stack = GapStack(n_bins + 1)
    seq_len = fms[0].seq_len
    stack.push(Entry(0, 0, length, 0, seq_len, 0, 0, 0, STATE_M, 0), 0)
    stack.push(Entry(0, 1, length, 0, seq_len, 0, 0, 0, STATE_M, 0), 0)

    mode_gape = bool(opt.mode & BWA_MODE_GAPE)
    mode_nonstop = bool(opt.mode & BWA_MODE_NONSTOP)
    mode_loggap = bool(opt.mode & BWA_MODE_LOGGAP)

    while stack.n_entries:
        if max_entries_hw < stack.n_entries:
            max_entries_hw = stack.n_entries
        if stack.n_entries > opt.max_entries:
            break
        e = stack.pop()
        k, l = e.k, e.l
        a, i = e.a, e.i
        if not mode_nonstop and e.score > best_score + opt.s_mm:
            break

        m = max_diff - (e.n_mm + e.n_gapo)
        if mode_gape:
            m -= e.n_gape
        if m < 0:
            continue
        fm = fms[1 - a]
        strn = seqs[a]
        w, bid = widths[a]
        if seed_widths is not None:
            sw, sbid = seed_widths[a]
            m_seed = opt.max_seed_diff - (e.n_mm + e.n_gapo)
            if mode_gape:
                m_seed -= e.n_gape
        if i > 0 and m < bid[i - 1]:
            continue

        # hit check (bwtgap.c:158-164)
        hit_found = False
        if i == 0:
            hit_found = True
        elif m == 0 and (e.state == STATE_M or mode_gape
                         or e.n_gape == opt.max_gape):
            nmatch, k2, l2 = fm.match_exact_alt(strn[:i], k, l)
            if nmatch:
                hit_found = True
                k, l = k2, l2
            else:
                continue  # no hit, skip

        if hit_found:
            score = aln_score(e.n_mm, e.n_gapo, e.n_gape, opt)
            do_add = True
            if not alns:
                best_score = score
                best_diff = e.n_mm + e.n_gapo + (e.n_gape if mode_gape else 0)
                if not mode_nonstop:
                    max_diff = min(best_diff + 1, max_diff)
            if score == best_score:
                best_cnt += l - k + 1
            elif best_cnt > opt.max_top2:
                break
            if e.n_gapo:  # tandem-repeat dedup (bwtgap.c:179-183)
                if any(h[4] == k and h[5] == l for h in alns):
                    do_add = False
            if do_add:
                gap_shadow(l - k + 1, fm.seq_len, e.last_diff_pos, w, bid)
                # aln tuple layout: io.sai A_* order
                alns.append((e.n_mm, e.n_gapo, e.n_gape, a, k, l, score))
            continue

        i -= 1
        cnt_k, cnt_l = fm.two_occ4((k - 1) & _NEG1, l)
        occ = l - k + 1

        allow_diff = allow_M = True
        if i > 0:
            ii = i - (length - opt.seed_len)
            if bid[i - 1] > m - 1:
                allow_diff = False
            elif (bid[i - 1] == m - 1 and bid[i] == m - 1
                  and w[i - 1] == w[i]):
                allow_M = False
            if seed_widths is not None and ii > 0:
                if sbid[ii - 1] > m_seed - 1:
                    allow_diff = False
                elif (sbid[ii - 1] == m_seed - 1 and sbid[ii] == m_seed - 1
                      and sw[ii - 1] == sw[ii]):
                    allow_M = False

        # indels (bwtgap.c:217-244)
        tmp = (_int_log2(e.n_gape + e.n_gapo) // 2 + 1 if mode_loggap
               else e.n_gapo + e.n_gape)
        if (allow_diff and i >= opt.indel_end_skip + tmp
                and length - i >= opt.indel_end_skip + tmp):
            if e.state == STATE_M:
                if e.n_gapo < max_gapo:
                    # insertion
                    _push(stack, opt, a, i, k, l, e.n_mm, e.n_gapo + 1,
                          e.n_gape, STATE_I, True)
                    # deletion over 4 bases
                    for j in range(4):
                        dk = fm.L2[j] + int(cnt_k[j]) + 1
                        dl = fm.L2[j] + int(cnt_l[j])
                        if dk <= dl:
                            _push(stack, opt, a, i + 1, dk, dl, e.n_mm,
                                  e.n_gapo + 1, e.n_gape, STATE_D, True)
            elif e.state == STATE_I:
                if e.n_gape < opt.max_gape:
                    _push(stack, opt, a, i, k, l, e.n_mm, e.n_gapo,
                          e.n_gape + 1, STATE_I, True)
            elif e.state == STATE_D:
                if e.n_gape < opt.max_gape:
                    if (e.n_gape + e.n_gapo < max_diff
                            or occ < opt.max_del_occ):
                        for j in range(4):
                            dk = fm.L2[j] + int(cnt_k[j]) + 1
                            dl = fm.L2[j] + int(cnt_l[j])
                            if dk <= dl:
                                _push(stack, opt, a, i + 1, dk, dl, e.n_mm,
                                      e.n_gapo, e.n_gape + 1, STATE_D, True)

        # mismatches / matches (bwtgap.c:246-259)
        if allow_diff and allow_M:
            for j in range(1, 5):
                c = (strn[i] + j) & 3
                is_mm = (j != 4 or strn[i] > 3)
                mk = fm.L2[c] + int(cnt_k[c]) + 1
                ml = fm.L2[c] + int(cnt_l[c])
                if mk <= ml:
                    _push(stack, opt, a, i, mk, ml, e.n_mm + is_mm,
                          e.n_gapo, e.n_gape, STATE_M, is_mm)
        elif strn[i] < 4:
            c = strn[i] & 3
            mk = fm.L2[c] + int(cnt_k[c]) + 1
            ml = fm.L2[c] + int(cnt_l[c])
            if mk <= ml:
                _push(stack, opt, a, i, mk, ml, e.n_mm, e.n_gapo, e.n_gape,
                      STATE_M, False)

    return alns, max_entries_hw


def _push(stack, opt, a, i, k, l, n_mm, n_gapo, n_gape, state, is_diff):
    score = aln_score(n_mm, n_gapo, n_gape, opt)
    stack.push(Entry(score, a, i, k, l, n_mm, n_gapo, n_gape, state,
                     i if is_diff else 0), score)
