"""Scalar model of aln_extend_core (stdaln.c:862-1007): seed-anchored
one-sided extension with adaptive band narrowing to positive cells, then
bandwidth-doubling global DP for the path.  Oracle/host path for the bwasw
extension steps (bsw2_extend_left/rght)."""

import numpy as np

from .stdaln_scalar import aln_global_core, AlnParam

LOCAL_OVERFLOW_THRESHOLD = 32000


def aln_extend_core(seq1, seq2, ap, G0, want_path=True):
    """Returns (score, end_i, end_j, path).  path is the last-to-first
    global path of the [1..end_i]x[1..end_j] prefix when want_path (C with
    path non-null and path_len non-null); with want_path=False only
    (end_i, end_j) are meaningful (C path_len==0 branch)."""
    len1, len2 = len(seq1), len(seq2)
    if len1 == 0 or len2 == 0:
        return -1, 0, 0, None
    q = ap.gap_open
    r = ap.gap_ext
    qr = q + r
    mat = ap.matrix
    s1 = np.concatenate(([0], np.asarray(seq1, dtype=np.int64)))
    s2 = np.concatenate(([0], np.asarray(seq2, dtype=np.int64)))
    prof = mat[:, s1]  # [5, len1+1]

    eh_h = [0] * (len1 + 2)
    eh_e = [0] * (len1 + 2)
    start, end = 1, 2
    end_i = end_j = 0
    score = 0
    # the C rebases at 32000 (stdaln.c:916-930); not modelled — guard
    assert G0 + len2 * int(mat.max()) < LOCAL_OVERFLOW_THRESHOLD, \
        "extension overflow rebase not modelled (read too long/high-scoring)"
    eh_h[1] = G0

    j = 1
    while j <= len2:
        h1 = 0
        f = 0
        sa_row = prof[s2[j]]
        _start = max(j - ap.band_width, 1)
        if _start > start:
            start = _start
        _end = min(j + ap.band_width, len1 + 1)
        if _end < end:
            end = _end
        if start == end:
            break
        ns = ne = 0
        i = start
        while i < end:
            h = eh_h[i]
            e = eh_e[i]
            eh_h[i] = h1
            if h:
                h += int(sa_row[i])
            h = max(h, e, f)
            h1 = h
            if h > 0:
                if ns == 0:
                    ns = i
                ne = i
                if score < h:
                    score = h
                    end_i, end_j = i, j
            h -= qr
            if h < 0:
                h = 0
            e -= r
            if e < h:
                e = h
            f -= r
            if f < h:
                f = h
            eh_e[i] = e
            i += 1
        eh_h[end] = h1
        eh_e[end] = 0
        if ne <= 0:
            break
        start = ns
        end = ne + 3
        j += 1

    score -= 1  # of_base - 1 with no overflow (stdaln.c:972)
    if score <= 0:
        return score, end_i, end_j, None
    if not want_path:
        return score, end_i, end_j, None

    jmax = max(end_i - 1, end_j - 1) + 1
    i_band = ap.band_width
    path = None
    while True:
        ap_real = AlnParam(ap.gap_open, ap.gap_ext, -1, ap.matrix, ap.row,
                           i_band)
        score_g, path = aln_global_core(np.asarray(seq1)[:end_i],
                                        np.asarray(seq2)[:end_j], ap_real)
        if score == score_g:
            break
        if i_band > jmax:
            break
        i_band <<= 1
    score = score_g
    return score, end_i, end_j, path
