"""Batched FM-index rank (Occ) lookups on device.

TPU-first re-design of the reference's occ primitives (bwt.c:83-216): one
query gathers a single 12-word (48 B) interleaved block — 4 checkpoint
counters + 8 BWT words covering 128 bases (layout bwt.h:61-68) — then counts
base occurrences in all words at once with bit tricks + population count on
the VPU, using a per-word validity mask instead of the reference's scalar
word loop and its `- (~k&15)` base-0 correction.

Semantics match bwt_occ / bwt_occ4 exactly, including the `$`-row adjustment
(k >= primary → k-1, bwt.c:99,167) and the k == (bwtint_t)(-1) → 0 edge
(bwt.c:98,163).  All position arithmetic is uint32 so the C's unsigned
wraparound (k-1 at k=0 → 0xFFFFFFFF) carries over unchanged.
"""

import jax
import jax.numpy as jnp

U32 = jnp.uint32
_M55 = jnp.uint32(0x55555555)
_FULL = jnp.uint32(0xFFFFFFFF)


def gather_blocks(bwt, kk, word_offset=None):
    """Gather the 12-word interleaved block for each (adjusted) position.

    bwt: uint32 [n_words]; kk: uint32 [...]; word_offset: optional int32
    [...] bank offset for concatenated fwd|rev indexes.  Returns uint32
    [..., 12].
    """
    base = ((kk >> 7) * U32(12)).astype(jnp.int32)
    if word_offset is not None:
        base = base + word_offset
    idx = base[..., None] + jnp.arange(12, dtype=jnp.int32)
    return bwt[idx]


def occ4(bwt, primary, seq_len, k, word_offset=None):
    """Counts of each base in BWT[0..k] for a batch of rows.

    k: uint32 [...]; primary may be a scalar or per-lane vector; returns
    uint32 [..., 4].  Mirrors bwt_occ4 (bwt.c:159-176) with the -1 edge from
    bwt_2occ4's delegation.
    """
    k = k.astype(U32)
    is_neg1 = k == _FULL
    kk = jnp.where(k >= primary, k - U32(1), k)
    kk = jnp.where(is_neg1, U32(0), kk)

    blk = gather_blocks(bwt, kk, word_offset)
    cnt = blk[..., :4]
    words = blk[..., 4:]

    word_off = ((kk >> 4) & U32(7)).astype(U32)
    within = kk & U32(15)
    # validity mask: word j fully valid when j < word_off, partially when
    # j == word_off (positions <= within; base p sits at bits (15-p)*2+1..)
    shift = ((U32(15) - within) * U32(2)).astype(U32)
    partial = (~((U32(1) << shift) - U32(1))).astype(U32)
    j = jnp.arange(8, dtype=U32)
    wo = word_off[..., None]
    vmask = jnp.where(j < wo, _FULL, jnp.where(j == wo, partial[..., None],
                                               U32(0)))
    valid_even = vmask & _M55

    lo = words & _M55
    hi = (words >> U32(1)) & _M55
    nlo = (~words) & _M55
    nhi = ((~words) >> U32(1)) & _M55

    def cnt_of(bits):
        return jax.lax.population_count(bits & valid_even).sum(
            axis=-1, dtype=U32)

    c0 = cnt_of(nlo & nhi)
    c1 = cnt_of(lo & nhi)
    c2 = cnt_of(nlo & hi)
    c3 = cnt_of(lo & hi)
    add = jnp.stack([c0, c1, c2, c3], axis=-1)
    out = cnt + add
    return jnp.where(is_neg1[..., None], U32(0), out)


def occ(bwt, l2, primary, seq_len, k, c, word_offset=None):
    """Single-base occ (bwt_occ, bwt.c:92-115).  c: int32 [...] in 0..3."""
    counts = occ4(bwt, primary, seq_len, k, word_offset)
    return jnp.take_along_axis(counts, c[..., None].astype(jnp.int32),
                               axis=-1)[..., 0]


def two_occ4(bwt, primary, seq_len, k, l):
    """bwt_2occ4 semantics (bwt.c:179-216): occ4 at k and l (k<=l).  The C
    shares the checkpoint block when possible — an optimization only; the
    batched gather makes both lookups one memory op each."""
    return occ4(bwt, primary, seq_len, k), occ4(bwt, primary, seq_len, l)


def step_interval(l2, ok, ol, c):
    """(k', l') = L2[c] + occ(k-1) + 1, L2[c] + occ(l) — the backward-search
    interval update common to every engine (bwt.c:227-228)."""
    l2c = l2[c] if l2.ndim == 1 else jnp.take_along_axis(l2, c, axis=-1)
    return l2c + ok + U32(1), l2c + ol


def match_exact(bwt, l2, primary, seq_len, queries, lengths):
    """Batched bwt_match_exact (bwt.c:218-235).

    queries: int32 [B, L] base codes (>3 = N), processed right-to-left;
    lengths: int32 [B].  Returns (n_occ uint32, k uint32, l uint32); n_occ=0
    means no match.  Fixed L-iteration masked scan.
    """
    B, L = queries.shape
    k0 = jnp.zeros(B, dtype=U32)
    l0 = jnp.full(B, seq_len, dtype=U32)
    ok_mask = jnp.ones(B, dtype=bool)

    def body(carry, i):
        k, l, ok_m = carry
        pos = lengths - 1 - i          # right-to-left
        active = (pos >= 0) & ok_m
        c = queries[jnp.arange(B), jnp.maximum(pos, 0)]
        is_n = c > 3
        cc = jnp.minimum(c, 3)
        occ_k = occ(bwt, l2, primary, seq_len, k - U32(1), cc)
        occ_l = occ(bwt, l2, primary, seq_len, l, cc)
        nk = l2[cc] + occ_k + U32(1)
        nl = l2[cc] + occ_l
        fail = is_n | (nk > nl)
        nk = jnp.where(active & ~fail, nk, k)
        nl = jnp.where(active & ~fail, nl, l)
        ok_m = ok_m & ~(active & fail)
        return (nk, nl, ok_m), None

    (k, l, ok_m), _ = jax.lax.scan(body, (k0, l0, ok_mask),
                                   jnp.arange(L, dtype=jnp.int32))
    n = jnp.where(ok_m, l - k + U32(1), U32(0))
    return n, k, l


def cal_width(bwt, l2, primary, seq_len, queries, lengths):
    """Batched bwt_cal_width (bwtaln.c:52-76): D(i) lower-bound intervals.

    queries processed left-to-right on the *opposite-strand* BWT.  Returns
    (width uint32 [B, L+1], bid int32 [B, L+1]); entries beyond each read's
    length hold the terminal sentinel (w=0, bid=final+1) at position len.
    """
    B, L = queries.shape
    k0 = jnp.zeros(B, dtype=U32)
    l0 = jnp.full(B, seq_len, dtype=U32)
    bid0 = jnp.zeros(B, dtype=jnp.int32)

    def body(carry, i):
        k, l, bid = carry
        c = queries[:, i]
        active = i < lengths
        is_n = c > 3
        cc = jnp.minimum(c, 3)
        occ_k = occ(bwt, l2, primary, seq_len, k - U32(1), cc)
        occ_l = occ(bwt, l2, primary, seq_len, l, cc)
        nk = jnp.where(is_n, k, l2[cc] + occ_k + U32(1))
        nl = jnp.where(is_n, l, l2[cc] + occ_l)
        restart = (nk > nl) | is_n
        nk = jnp.where(restart, U32(0), nk)
        nl = jnp.where(restart, seq_len, nl)
        nbid = bid + restart.astype(jnp.int32)
        nk = jnp.where(active, nk, k)
        nl = jnp.where(active, nl, l)
        nbid = jnp.where(active, nbid, bid)
        w_i = nl - nk + U32(1)
        return (nk, nl, nbid), (w_i, nbid)

    (_, _, bid_fin), (w_t, bid_t) = jax.lax.scan(
        body, (k0, l0, bid0), jnp.arange(L, dtype=jnp.int32))
    width = jnp.zeros((B, L + 1), dtype=U32)
    bid = jnp.zeros((B, L + 1), dtype=jnp.int32)
    width = width.at[:, :L].set(w_t.T)
    bid = bid.at[:, :L].set(bid_t.T)
    # terminal sentinel at position len: w=0, bid=final_bid+1 (bwtaln.c:73-74)
    width = width.at[jnp.arange(B), lengths].set(U32(0))
    bid = bid.at[jnp.arange(B), lengths].set(bid_fin + 1)
    return width, bid
