"""Suffix array / BWT construction (host, offline).

Output parity with the reference's is_bwt (is.c:187-218) + bwt_bwtupdate_core
(bwtmisc.c:125-152) + bwt_cal_sa (bwt.c:48-70): the BWT string, the
checkpoint-interleaved .bwt layout, and the sampled SA are bit-identical.
The construction algorithm itself is ours (prefix-doubling on NumPy; the
reference uses SA-IS / BWT-SW incremental) — only the outputs must match.
"""

import numpy as np

from ..constants import OCC_INTERVAL, SA_INTERVAL


def suffix_array(codes):
    """Suffix array of codes (values 0..3).

    Uses the native C++ SA-IS (native/sais.cpp, O(n)) when available, else
    NumPy prefix doubling (O(n log^2 n)).  Suffix comparison semantics:
    plain lexicographic with the shorter suffix smaller on prefix ties —
    identical to SA-IS over T without a sentinel (is.c:187-196 prepends the
    virtual sentinel as SA[0]=n separately).
    """
    from .native import suffix_array_native

    sa = suffix_array_native(codes)
    if sa is not None:
        return sa
    s = np.asarray(codes, dtype=np.int64)
    n = len(s)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    if n == 1:
        return np.zeros(1, dtype=np.int64)
    rank = s.copy()
    idx = np.arange(n, dtype=np.int64)
    k = 1
    while True:
        # secondary key: rank of suffix i+k, or -1 past the end
        key2 = np.full(n, -1, dtype=np.int64)
        key2[: n - k] = rank[k:]
        order = np.lexsort((key2, rank))
        r1 = rank[order]
        r2 = key2[order]
        changed = np.empty(n, dtype=np.int64)
        changed[0] = 0
        changed[1:] = (r1[1:] != r1[:-1]) | (r2[1:] != r2[:-1])
        new_rank_sorted = np.cumsum(changed)
        if new_rank_sorted[-1] == n - 1:
            return order
        rank = np.empty(n, dtype=np.int64)
        rank[order] = new_rank_sorted
        k <<= 1


def bwt_from_codes(codes):
    """Return (bwt_string_without_$, primary, L2) — is_bwt semantics.

    SA_full = [n] ++ SA(T); bwt row i is T[SA_full[i]-1]; the row whose
    suffix starts at 0 (the '$' row) is `primary` and is removed from the
    string (is.c:204-218).
    """
    codes = np.asarray(codes, dtype=np.uint8)
    n = len(codes)
    sa = suffix_array(codes)
    primary = int(np.flatnonzero(sa == 0)[0]) + 1  # +1: sentinel row is SA_full[0]
    sa_full = np.concatenate(([n], sa))
    rows = np.delete(sa_full, primary)  # drop the '$' row
    bwt = codes[rows - 1]
    counts = np.bincount(codes, minlength=4)[:4]
    l2 = np.zeros(5, dtype=np.uint32)
    l2[1:] = np.cumsum(counts)
    return bwt.astype(np.uint8), primary, l2, sa_full


def bwt_and_sample_from_codes(codes, sa_intv=SA_INTERVAL):
    """Gbp-scale bwt_from_codes + cal_sa_sample: derives the BWT string
    and the sampled SA directly from the raw suffix array in chunks —
    no sa_full concatenation, no deleted-row copy (each of those is an
    extra 8 B/char at build scale)."""
    codes = np.asarray(codes, dtype=np.uint8)
    n = len(codes)
    if n == 0:
        raise ValueError("empty sequence")
    sa = suffix_array(codes)
    # row of the suffix starting at 0 (+1 for the sentinel row SA_full[0])
    primary = int(np.argmin(sa)) + 1
    bwt = np.empty(n, dtype=np.uint8)
    bwt[0] = codes[n - 1]      # sentinel row: char before suffix n
    CH = 1 << 26
    # sa_full = [n] ++ sa with the '$' row at `primary` dropped: rows
    # [1, primary) map to sa[0:primary-1], rows [primary, n) to sa[primary:]
    for lo in range(0, primary - 1, CH):
        hi = min(primary - 1, lo + CH)
        bwt[1 + lo:1 + hi] = codes[sa[lo:hi] - 1]
    for lo in range(primary, n, CH):
        hi = min(n, lo + CH)
        bwt[lo:hi] = codes[sa[lo:hi] - 1]
    counts = np.zeros(4, dtype=np.int64)
    for lo in range(0, n, CH):
        counts += np.bincount(codes[lo:lo + CH], minlength=4)[:4]
    l2 = np.zeros(5, dtype=np.uint32)
    l2[1:] = np.cumsum(counts)
    # sampled SA: sa_full[j*intv] = sa[j*intv - 1] for j >= 1 (bwt.c:48-70)
    n_sa = (n + sa_intv) // sa_intv
    samp = np.empty(n_sa, dtype=np.uint32)
    if n_sa > 1:
        idx = np.arange(1, n_sa, dtype=np.int64) * sa_intv - 1
        samp[1:] = sa[idx].astype(np.uint32)
    samp[0] = np.uint32(0xFFFFFFFF)
    return bwt, primary, l2, samp


def pack_bwt_words(bwt):
    """Pack BWT base codes into uint32 words, 16 bases per word, base i at
    bits (15 - i%16)*2 (bwtmisc.c:97-98).  Chunked: the unpacked uint32
    staging would otherwise cost ~8 B/char transiently at build scale."""
    bwt = np.asarray(bwt)
    n = len(bwt)
    n_words = (n + 15) >> 4
    out = np.empty(n_words, dtype=np.uint32)
    shifts = np.arange(15, -1, -1, dtype=np.uint32) * 2
    CH = 1 << 22    # words per chunk
    for w0 in range(0, n_words, CH):
        w1 = min(n_words, w0 + CH)
        seg = bwt[w0 * 16:w1 * 16]
        if len(seg) < (w1 - w0) * 16:
            seg = np.concatenate(
                [seg, np.zeros((w1 - w0) * 16 - len(seg), dtype=bwt.dtype)])
        q = seg.astype(np.uint32).reshape(-1, 16)
        out[w0:w1] = (q << shifts[None, :]).sum(axis=1, dtype=np.uint32)
    return out


def unpack_bwt_words(words, seq_len):
    """Inverse of pack_bwt_words: uint32 words → base-code array."""
    w = np.asarray(words, dtype=np.uint32)
    shifts = np.arange(15, -1, -1, dtype=np.uint32) * 2
    codes = ((w[:, None] >> shifts[None, :]) & 3).reshape(-1)
    return codes[:seq_len].astype(np.uint8)


def cal_sa_from_bwt(bwt_interleaved, primary, l2, seq_len,
                    intv=SA_INTERVAL):
    """bwt_cal_sa (bwt.c:48-70) on an interleaved-Occ BWT: the sampled SA
    via the seq_len-step invPsi walk from the last row.  Native C++ walk
    when available; NumPy permutation walk otherwise.  Returns the sampled
    array with the leading -1 sentinel (sa[0], bwt.c:68)."""
    from .native import cal_sa_native

    out = cal_sa_native(bwt_interleaved, primary, l2, seq_len, intv)
    if out is None:
        from ..refmodel.fm_scalar import ScalarFm

        fm = ScalarFm(bwt_interleaved, primary, l2, seq_len)
        perm = fm.full_inv_psi()
        n_sa = (seq_len + intv) // intv
        out = np.zeros(n_sa, dtype=np.uint32)
        isa, sa_val = 0, seq_len
        for _ in range(seq_len):
            if isa % intv == 0:
                out[isa // intv] = sa_val
            sa_val -= 1
            isa = int(perm[isa])
        if isa % intv == 0:
            out[isa // intv] = sa_val
    out = np.asarray(out, dtype=np.uint32)
    out[0] = np.uint32(0xFFFFFFFF)
    return out


def interleave_occ(bwt_words, bwt, seq_len):
    """bwt_bwtupdate_core equivalent (bwtmisc.c:125-152).

    Produces the interleaved layout: per 128-base block, 4 uint32 cumulative
    counts (occ *before* the block) then 8 uint32 BWT words; a trailing
    4-word checkpoint carries the final counts.
    """
    bwt = np.asarray(bwt, dtype=np.uint8)
    bwt_words = np.asarray(bwt_words, dtype=np.uint32)
    n_occ = (seq_len + OCC_INTERVAL - 1) // OCC_INTERVAL + 1
    plain_words = (seq_len + 15) >> 4
    out_size = plain_words + n_occ * 4
    out = np.zeros(out_size, dtype=np.uint32)

    # cumulative counts of each base before each 128-bp block (chunked:
    # the old one-hot staging cost 16 B/char)
    n_blocks = n_occ - 1  # full/partial data blocks
    per = np.zeros((n_blocks, 4), dtype=np.uint32)
    BC = 1 << 20    # blocks per chunk
    for b0 in range(0, n_blocks, BC):
        b1 = min(n_blocks, b0 + BC)
        seg = bwt[b0 * OCC_INTERVAL:b1 * OCC_INTERVAL]
        want = (b1 - b0) * OCC_INTERVAL
        if len(seg) < want:
            seg = np.concatenate(
                [seg, np.full(want - len(seg), 255, dtype=np.uint8)])
        seg2 = seg.reshape(b1 - b0, OCC_INTERVAL)
        for c in range(4):
            per[b0:b1, c] = (seg2 == c).sum(axis=1, dtype=np.uint32)
    cum = np.zeros((n_blocks + 1, 4), dtype=np.uint32)
    np.cumsum(per, axis=0, out=cum[1:])
    del per

    # layout: [cnt4 | 8 words] per full block, partial tail words, final
    # checkpoint — written as array views, no per-block Python loop
    n_full = plain_words >> 3
    main = out[:n_full * 12].reshape(n_full, 12) if n_full else \
        out[:0].reshape(0, 12)
    main[:, :4] = cum[:n_full]
    main[:, 4:] = bwt_words[:n_full * 8].reshape(-1, 8)
    k = n_full * 12
    r_words = plain_words - n_full * 8
    if r_words:
        out[k:k + 4] = cum[n_full]
        out[k + 4:k + 4 + r_words] = bwt_words[n_full * 8:]
        k += 4 + r_words
    out[k:k + 4] = cum[n_blocks]
    k += 4
    assert k == out_size, "inconsistent bwt_size"
    return out


def cal_sa_sample(sa_full, seq_len, intv=SA_INTERVAL):
    """bwt_cal_sa equivalent (bwt.c:48-70).

    The reference walks invPsi from the last row, assigning descending SA
    values; that walk visits row k exactly when SA_full[k] is the current
    value, so the sampled array is simply SA_full at rows divisible by the
    interval.  Row 0 is then stomped with -1 (bwt.c:69).
    """
    n_sa = (seq_len + intv) // intv
    sa_arr = np.asarray(sa_full[::intv][:n_sa], dtype=np.uint32).copy()
    sa_arr[0] = np.uint32(0xFFFFFFFF)
    return sa_arr
