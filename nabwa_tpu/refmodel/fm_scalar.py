"""Scalar NumPy model of the FM-index primitives with the reference's exact
semantics (bwt.c:72-252).  This is the unit-test oracle for the device
kernels and the host fallback for pathological reads; it is written for
clarity, not speed.
"""

import numpy as np

from ..constants import OCC_INTERVAL

_NEG1 = 0xFFFFFFFF  # (bwtint_t)(-1)


def _popcount64(x):
    return bin(x & 0xFFFFFFFFFFFFFFFF).count("1")


def _occ_aux64(y, c):
    """__occ_aux (bwt.c:83-90): count occurrences of 2-bit code c among the
    32 codes in a 64-bit word (high-to-low)."""
    y &= 0xFFFFFFFFFFFFFFFF
    ny = (~y) & 0xFFFFFFFFFFFFFFFF
    m = ((y if (c & 2) else ny) >> 1) & (y if (c & 1) else ny) \
        & 0x5555555555555555
    return _popcount64(m)


class ScalarFm:
    """One FM-index direction (forward or reverse BWT)."""

    def __init__(self, bwt_interleaved, primary, l2, seq_len, sa=None,
                 sa_intv=32):
        self.bwt = np.asarray(bwt_interleaved, dtype=np.uint32)
        self.primary = int(primary)
        self.L2 = [int(x) for x in l2]
        self.seq_len = int(seq_len)
        self.sa_arr = None if sa is None else np.asarray(sa, dtype=np.uint32)
        self.sa_intv = sa_intv

    # --- layout accessors (bwt.h:61-68) ---
    def _intv_base(self, k):
        return (k // OCC_INTERVAL) * 12

    def B0(self, k):
        """Base at position k of the $-removed BWT string."""
        w = int(self.bwt[(k // OCC_INTERVAL) * 12 + 4 + (k % OCC_INTERVAL) // 16])
        return (w >> ((~k & 0xF) << 1)) & 3

    # --- occ (bwt.c:92-115) ---
    def occ(self, k, c):
        k = int(k) & _NEG1
        c = int(c)
        if k == self.seq_len:
            return self.L2[c + 1] - self.L2[c]
        if k == _NEG1:
            return 0
        if k >= self.primary:
            k -= 1
        p = self._intv_base(k)
        n = int(self.bwt[p + c])
        p += 4
        j = (k >> 5) << 5
        l = (k // OCC_INTERVAL) * OCC_INTERVAL
        while l < j:
            w = (int(self.bwt[p]) << 32) | int(self.bwt[p + 1])
            n += _occ_aux64(w, c)
            l += 32
            p += 2
        w = (int(self.bwt[p]) << 32) | int(self.bwt[p + 1])
        w &= ~((1 << ((~k & 31) << 1)) - 1) & 0xFFFFFFFFFFFFFFFF
        n += _occ_aux64(w, c)
        if c == 0:
            n -= (~k) & 31  # masked bits count as base 0
        return n

    def occ4(self, k):
        """bwt_occ4 (bwt.c:159-176): counts of all four bases in [0, k]."""
        k &= _NEG1
        if k == _NEG1:
            return np.zeros(4, dtype=np.int64)
        if k == self.seq_len:
            return np.array([self.L2[c + 1] - self.L2[c] for c in range(4)],
                            dtype=np.int64)
        # Note: the C bwt_occ4 has no k==seq_len guard; callers only reach
        # it via bwt_2occ4 with l<=seq_len and k-1, so k==seq_len arises for
        # l. C handles it implicitly: k=seq_len-1 after the primary
        # adjustment... replicate C exactly instead:
        return self._occ4_raw(k)

    def _occ4_raw(self, k):
        if k >= self.primary:
            k -= 1
        p = self._intv_base(k)
        cnt = self.bwt[p : p + 4].astype(np.int64).copy()
        p += 4
        j = (k >> 4) << 4
        l = (k // OCC_INTERVAL) * OCC_INTERVAL
        x = np.zeros(4, dtype=np.int64)
        while l < j:
            x += self._aux4(int(self.bwt[p]))
            l += 16
            p += 1
        w = int(self.bwt[p]) & (~((1 << ((~k & 15) << 1)) - 1) & 0xFFFFFFFF)
        x += self._aux4(w)
        x[0] -= (~k) & 15
        return cnt + x

    @staticmethod
    def _aux4(word):
        """Count each 2-bit code among the 16 codes of a uint32 word."""
        out = np.zeros(4, dtype=np.int64)
        for i in range(16):
            out[(word >> (i * 2)) & 3] += 1
        return out

    def two_occ4(self, k, l):
        """bwt_2occ4 semantics (bwt.c:179-216) — scalar version just calls
        occ4 twice; the C fast path is an optimization, not a semantic."""
        k &= _NEG1
        l &= _NEG1
        if l == self.seq_len:
            cntl = np.array([self.L2[c + 1] - self.L2[c] for c in range(4)],
                            dtype=np.int64)
        elif l == _NEG1:
            cntl = np.zeros(4, dtype=np.int64)
        else:
            cntl = self._occ4_raw(l)
        if k == self.seq_len:
            cntk = np.array([self.L2[c + 1] - self.L2[c] for c in range(4)],
                            dtype=np.int64)
        elif k == _NEG1:
            cntk = np.zeros(4, dtype=np.int64)
        else:
            cntk = self._occ4_raw(k)
        return cntk, cntl

    def two_occ(self, k, l, c):
        return self.occ(k, c), self.occ(l, c)

    # --- invPsi (bwt.h:71-75) ---
    def inv_psi(self, k):
        if k == self.primary:
            return 0
        if k < self.primary:
            c = self.B0(k)
            return self.L2[c] + self.occ(k, c)
        c = self.B0(k - 1)
        return self.L2[c] + self.occ(k, c)

    def full_inv_psi(self):
        """invPsi for every row 0..seq_len, vectorized (index-build helper)."""
        n = self.seq_len
        bwt_str = self.bwt_string()
        # occ(k, B0(k')) where k' = k adjusted for primary... Build via ranks:
        # row k (k != primary) corresponds to bwt position kk = k - (k > primary)
        rows = np.arange(n + 1, dtype=np.int64)
        kk = rows - (rows > self.primary)
        kk[self.primary] = 0  # dummy, overwritten below
        c = bwt_str[np.minimum(kk, n - 1)].astype(np.int64)
        # exclusive rank of each bwt position among equal chars; invPsi(k) =
        # L2[c] + occ_inclusive = L2[c] + ex_rank(kk) + 1 (bwt.h:71-75)
        ex_rank = np.zeros(n, dtype=np.int64)
        for b in range(4):
            m = bwt_str == b
            ex_rank[m] = np.arange(m.sum())
        out = np.asarray([self.L2[b] for b in range(4)])[c] + ex_rank[kk] + 1
        out[self.primary] = 0
        return out

    def bwt_string(self):
        """Unpack the $-removed BWT string (length seq_len)."""
        n_blocks = (self.seq_len + OCC_INTERVAL - 1) // OCC_INTERVAL
        words = []
        for b in range(n_blocks):
            words.append(self.bwt[b * 12 + 4 : b * 12 + 12])
        words = np.concatenate(words)
        out = np.empty(len(words) * 16, dtype=np.uint8)
        for i in range(16):
            out[i::16] = (words >> ((15 - i) * 2)) & 3
        return out[: self.seq_len]

    # --- sa lookup (bwt.c:72-81) ---
    def sa(self, k):
        s = 0
        while k % self.sa_intv != 0:
            s += 1
            k = self.inv_psi(k)
        kk = k // self.sa_intv
        base = int(self.sa_arr[kk]) if kk else _NEG1
        return (s + base) & _NEG1

    # --- exact match (bwt.c:218-252) ---
    def match_exact(self, query):
        k, l = 0, self.seq_len
        for c in reversed([int(x) for x in query]):
            if c > 3:
                return 0, 0, 0
            ok = self.occ((k - 1) & _NEG1, c)
            ol = self.occ(l, c)
            k = self.L2[c] + ok + 1
            l = self.L2[c] + ol
            if k > l:
                return 0, 0, 0
        return l - k + 1, k, l

    def match_exact_alt(self, query, k, l):
        """bwt_match_exact_alt: continue narrowing from (k, l)."""
        for c in reversed([int(x) for x in query]):
            if c > 3:
                return 0, k, l
            ok = self.occ((k - 1) & _NEG1, c)
            ol = self.occ(l, c)
            k = self.L2[c] + ok + 1
            l = self.L2[c] + ol
            if k > l:
                return 0, k, l
        return l - k + 1, k, l
