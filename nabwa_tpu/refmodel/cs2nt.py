"""Color-space → nucleotide decoding (cs2nt.c) for SOLiD reads.

After a color read is aligned against the color-space index, the decoded
nucleotide sequence is recovered by a tiny 4-state DP over the aligned
columns (cs2nt_DP, cs2nt.c:36-78): state = nucleotide at position k,
penalty COLOR_MM(19)-or-quality per color mismatch and NUCL_MM(25) per
reference mismatch, so two consistent color changes are preferred over
one nt change unless the color quality is high.  New base qualities come
from the two flanking color matches (cs2nt_nt_qual, cs2nt.c:80-110).

cs2nt_core mirrors bwa_cs2nt_core (cs2nt.c:113-191) on SeqState/Read,
minding this package's orientation conventions: Read.seq holds the
reversed search-form codes (C's pre-refine p->seq), Read.rseq the
forward-oriented reverse complement, Read.qual the original-orientation
ASCII qualities.
"""

import numpy as np

from ..constants import BWA_TYPE_NO_MATCH
from .stdaln_scalar import FROM_M, FROM_I, FROM_S

COLOR_MM = 19
NUCL_MM = 25

# nst_ntnt2cs_table (cs2nt.c:27)
NTNT2CS = np.array([4, 0, 0, 1, 0, 2, 3, 4, 0, 3, 2, 4, 1, 4, 4, 4],
                   dtype=np.int64)


def cs2nt_dp(nt_ref, cs_read):
    """cs2nt_DP (cs2nt.c:36-78).  nt_ref: int[size+1] codes 0..4;
    cs_read: int[size] packed color<<6|qual (qual 63 = N).  Returns
    nt_read int[size+1]."""
    size = len(cs_read)
    h = np.zeros(8, dtype=np.int64)
    bt = np.zeros((size + 1, 4), dtype=np.int8)
    if nt_ref[0] >= 4:
        h[:4] = 0
    else:
        h[:4] = NUCL_MM
        h[nt_ref[0]] = 0
    curr, last = 1, 0
    for k in range(1, size + 1):
        q = int(cs_read[k - 1]) & 0x3F
        col = int(cs_read[k - 1]) >> 6
        pen_c = COLOR_MM if q < COLOR_MM else q
        refk = int(nt_ref[k])
        for x in range(4):
            mn, ymin = 0x7FFFFFFF, 0
            for y in range(4):
                s = int(h[(last << 2) | y])
                if q != 63 and col != NTNT2CS[(1 << x) | (1 << y)]:
                    s += pen_c
                if refk < 4 and refk != x:
                    s += NUCL_MM
                if s < mn:
                    mn, ymin = s, y
            h[(curr << 2) | x] = mn
            bt[k, x] = ymin
        last, curr = curr, 1 - curr
    nt = np.zeros(size + 1, dtype=np.uint8)
    hmin, xmin = 0x7FFFFFFF, 0
    for x in range(4):
        if h[(last << 2) | x] < hmin:
            hmin, xmin = int(h[(last << 2) | x]), x
    nt[size] = xmin
    for k in range(size - 1, -1, -1):
        nt[k] = bt[k + 1, nt[k + 1]]
    return nt


def cs2nt_nt_qual(nt_read, cs_read):
    """cs2nt_nt_qual (cs2nt.c:80-110).  Returns packed base<<6|qual array
    of length size-1 (positions 1..size-1 of nt_read)."""
    size = len(cs_read)
    t = np.zeros(size, dtype=np.int64)
    c1 = int(nt_read[0])
    for k in range(1, size + 1):
        c2 = int(nt_read[k])
        t[k - 1] = 4 if (c1 >= 4 or c2 >= 4) \
            else int(NTNT2CS[(1 << c1) | (1 << c2)])
        c1 = c2
    out = np.zeros(size + 1, dtype=np.int64)
    for k in range(1, size):
        qk = int(cs_read[k]) & 0x3F
        qk1 = int(cs_read[k - 1]) & 0x3F
        if t[k - 1] == cs_read[k - 1] >> 6 and t[k] == cs_read[k] >> 6:
            q = qk1 + qk + 10
        elif t[k - 1] == cs_read[k - 1] >> 6:
            q = qk1 - qk
        elif t[k] == cs_read[k] >> 6:
            q = qk - qk1
        else:
            q = 0
        q = max(0, min(60, q))
        out[k] = (int(nt_read[k]) << 6) | q
        if qk1 == 63 or qk == 63:
            out[k] = 0
    return out[1:size]


def cs2nt_core(s, l_pac, ntpac):
    """bwa_cs2nt_core (cs2nt.c:113-191) on a SeqState.  ntpac: unpacked
    nucleotide pac codes.  Rewrites the read's seq/rseq/qual in place
    with the decoded nucleotides and shortens len by one."""
    if s.type == BWA_TYPE_NO_MATCH:
        return
    r = s.read
    # the strand-of-reference-forward color read (C's post-refine seq)
    seq = r.rseq if s.strand else r.seq[::-1]
    qual = r.qual
    L = s.len

    def csbase(i):
        q = int(qual[L - 1 - i if s.strand else i]) - 33
        if q > 60:
            q = 60
        if seq[i] > 3:
            q = 63
        return (int(seq[i]) << 6) | q

    nt_ref = [4 if s.pos == 0 else int(ntpac[s.pos - 1])]
    cs_read = []
    if not s.cigar:
        for i in range(L):
            cs_read.append(csbase(i))
            nt_ref.append(int(ntpac[s.pos + i])
                          if s.pos + i < l_pac else 4)
    else:
        x, y = s.pos, 0
        for op, ln in s.cigar:
            if op == FROM_M:
                for _ in range(ln):
                    cs_read.append(csbase(y))
                    nt_ref.append(int(ntpac[x]) if x < l_pac else 4)
                    x += 1
                    y += 1
            elif op == FROM_I:
                for _ in range(ln):
                    cs_read.append(csbase(y))
                    nt_ref.append(4)
                    y += 1
            elif op == FROM_S:
                y += ln
            else:
                x += ln
    nt_ref = np.asarray(nt_ref, dtype=np.int64)
    cs_read = np.asarray(cs_read, dtype=np.int64)
    size = len(cs_read)

    nt_read = cs2nt_dp(nt_ref, cs_read)
    packed = cs2nt_nt_qual(nt_read, cs_read)

    n = size - 1
    dec = np.empty(n, dtype=np.uint8)      # decoded, ref-forward
    dq = np.empty(n, dtype=np.uint8)       # new quals, ref-forward ascii
    for i in range(n):
        if (packed[i] & 0x3F) == 63:
            dq[i] = 33
            dec[i] = 4
        else:
            dq[i] = (packed[i] & 0x3F) + 33
            dec[i] = packed[i] >> 6
    comp = np.where(dec < 4, 3 - dec, dec).astype(np.uint8)
    if s.strand:
        # rseq := decoded; seq := reversed(revcomp(decoded)) = comp(dec)
        r.rseq = dec
        r.seq = comp
        r.qual = dq[::-1].copy()
    else:
        r.seq = dec[::-1].copy()
        r.rseq = comp[::-1].copy()
        r.qual = dq
    r.full_len = n
    # the print path reads full_codes (original orientation, C prints
    # p->seq over full_len) — now the decoded nucleotides
    r.full_codes = r.seq[::-1].copy()
    s.len = n
