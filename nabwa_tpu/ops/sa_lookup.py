"""Batched suffix-array lookup: SA row → text position.

bwt_sa (bwt.c:72-81) is a variable-length invPsi pointer-chase until a
sampled row; batched here as a lockstep while-loop with a per-lane done
mask (expected ~sa_intv/2 steps, terminates at a sampled row or row 0).
"""

import jax
import jax.numpy as jnp

from .occ import occ, U32, _FULL


def b0_string(bwt, pos):
    """Base at string position pos of the $-removed BWT (bwt_B0, bwt.h:66)."""
    word_idx = ((pos >> 7) * U32(12) + U32(4) + ((pos >> 4) & U32(7))
                ).astype(jnp.int32)
    w = bwt[word_idx]
    return ((w >> (((~pos) & U32(15)) << U32(1))) & U32(3)).astype(jnp.int32)


def inv_psi(bwt, l2, primary, seq_len, k):
    """Batched invPsi (bwt.h:71-75)."""
    is_primary = k == primary
    strpos = jnp.where(k > primary, k - U32(1), k)
    strpos = jnp.where(is_primary, U32(0), strpos)  # safe index
    c = b0_string(bwt, strpos)
    o = occ(bwt, l2, primary, seq_len, k, c)
    out = l2[c] + o
    return jnp.where(is_primary, U32(0), out)


def sa_lookup(bwt, l2, primary, seq_len, sa_arr, sa_intv, k):
    """Batched bwt_sa (bwt.c:72-81).  k: uint32 [...] rows; returns uint32
    text positions (callers treat result relative to the BWT's own
    orientation, bwase.c:139-154)."""
    intv = U32(sa_intv) if not hasattr(sa_intv, "dtype") else sa_intv

    def cond(state):
        k, s = state
        return jnp.any(k % intv != 0)

    def body(state):
        k, s = state
        live = k % intv != 0
        nk = inv_psi(bwt, l2, primary, seq_len, k)
        k = jnp.where(live, nk, k)
        s = jnp.where(live, s + U32(1), s)
        return k, s

    k = k.astype(U32)
    s0 = jnp.zeros_like(k)
    k, s = jax.lax.while_loop(cond, body, (k, s0))
    kk = (k // intv).astype(jnp.int32)
    base = jnp.where(kk == 0, _FULL, sa_arr[kk])
    return s + base  # uint32 wraparound matches `sa + (-1)` (bwt.c:80)
