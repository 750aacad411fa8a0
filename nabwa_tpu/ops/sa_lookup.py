"""Batched suffix-array lookup: SA row → text position.

bwt_sa (bwt.c:72-81) is a variable-length invPsi pointer-chase until a
sampled row; batched here as a lockstep while-loop with a per-lane done
mask (expected ~sa_intv/2 steps, terminates at a sampled row or row 0).
int32 bit-pattern arithmetic throughout (see ops.u32).
"""

import jax
import jax.numpy as jnp

from .u32 import I32, NEG1, ugt, uge, ushr
from .occ import occ


def b0_string(bwt, pos):
    """Base at string position pos of the $-removed BWT (bwt_B0, bwt.h:66)."""
    word_idx = ushr(pos, 7) * I32(12) + I32(4) + (ushr(pos, 4) & I32(7))
    w = bwt[word_idx]
    return ushr(w, ((~pos) & I32(15)) << 1) & I32(3)


def inv_psi(bwt, l2, primary, seq_len, k):
    """Batched invPsi (bwt.h:71-75)."""
    is_primary = k == primary
    strpos = jnp.where(ugt(k, primary), k - I32(1), k)
    strpos = jnp.where(is_primary, I32(0), strpos)  # safe index
    c = b0_string(bwt, strpos)
    o = occ(bwt, l2, primary, seq_len, k, c)
    out = l2[c] + o
    return jnp.where(is_primary, I32(0), out)


def _sa_lookup_impl(bwt, l2, primary, seq_len, sa_arr, sa_intv, k):
    intv = int(sa_intv)
    assert intv & (intv - 1) == 0, "sa_intv must be a power of two on device"
    mask = I32(intv - 1)
    shift = intv.bit_length() - 1

    def cond(state):
        k, s = state
        return jnp.any((k & mask) != 0)

    def body(state):
        k, s = state
        live = (k & mask) != 0
        nk = inv_psi(bwt, l2, primary, seq_len, k)
        k = jnp.where(live, nk, k)
        s = jnp.where(live, s + I32(1), s)
        return k, s

    k = k.astype(I32)
    s0 = jnp.zeros_like(k)
    k, s = jax.lax.while_loop(cond, body, (k, s0))
    kk = ushr(k, shift)
    base = jnp.where(kk == 0, NEG1, sa_arr[kk])
    return s + base  # int32 wraparound matches `sa + (-1)` (bwt.c:80)


_sa_lookup_jit = jax.jit(_sa_lookup_impl, static_argnums=(5,))


def sa_lookup(bwt, l2, primary, seq_len, sa_arr, sa_intv, k):
    """Batched bwt_sa (bwt.c:72-81).  k: int32 [n] rows (uint32 bits);
    returns int32 text positions (uint32 bit patterns).

    Jitted with the batch padded up to a power-of-two bucket: callers pass
    data-dependent interval widths, and an unjitted while_loop would
    re-lower on every call (minutes per unique shape).  Padding lanes use
    row 0, which is already at a sampled row (zero extra iterations)."""
    k = jnp.asarray(k)
    if k.ndim != 1:
        return _sa_lookup_jit(bwt, l2, primary, seq_len, sa_arr,
                              int(sa_intv), k)
    n = int(k.shape[0])
    if n == 0:
        return jnp.zeros(0, dtype=I32)
    m = max(64, 1 << max(n - 1, 1).bit_length())
    if m != n:
        k = jnp.concatenate([k, jnp.zeros(m - n, dtype=k.dtype)])
    out = _sa_lookup_jit(bwt, l2, primary, seq_len, sa_arr, int(sa_intv), k)
    return out[:n] if m != n else out
