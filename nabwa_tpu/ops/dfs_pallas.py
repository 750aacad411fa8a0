"""Pallas TPU kernel for the bounded-DFS gapped search (bwt_match_gap,
bwtgap.c:104-266) — the single-kernel rewrite of ops.dfs.dfs_match_gap.

Why a kernel: the jnp while-loop pays an HBM round trip per fused op on
the [B,S] stack arrays every iteration (~0.86 ms/iter measured round 1).
Here the WHOLE search runs inside one pallas_call per block of BB reads:
the slot-pool stack lives in VMEM scratch, the interleaved-Occ BWT is
VMEM-resident, and each iteration's two occ4 block fetches are dynamic
sublane row loads driven by the scalar core (~25 ns each on this
backend).  Measured design points from scripts/probe_*: elementwise
chains fuse into registers; cumsum / take_along_axis / pltpu.roll are
avoided (unsupported or ~5 us/call) in favour of static-shift prefix
adds and masked-sum one-hot extractions.

Layout:
- reads = sublanes (BB per grid step), stack slots = lanes (S per read);
- BWT table [n_rows, 128]: both strands, 8 interleaved blocks per row,
  each block padded 12->16 words: [cnt[4] | 8 bwt words | pad 4]
  (bwt.h:61-68 layout, same byte content per block);
- stack entry = 4 arrays: key (score<<16 | 0xFFFF-seq), packed meta
  (i|a|ldp|state|nmm|go|ge), k, l;
- per-read registers are [BB, 1] while_loop carries (vreg-resident; a
  VMEM register tile cost strided loads + masked writebacks per
  iteration);
- width/bid planes ship packed (w<<8 | bid) per strand, padded to 128.

Applicability gates (fall back to ops.dfs for anything outside):
genome small enough for VMEM (~<=10 Mbp total banks), read length <= 127,
max_diff <= 15, max_gapo/max_gape <= 15.  All position arithmetic is
plain int32 (positions < 2^23), so no uint32 bit-pattern tricks needed
except the k == -1 sentinel, handled explicitly.

Semantics are bit-identical to ops.dfs (same pop order, pruning, hit
set); tests drive both against the scalar oracle and each other.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import (STATE_M, STATE_I, STATE_D, BWA_MODE_GAPE,
                         BWA_MODE_LOGGAP, BWA_MODE_NONSTOP)
from .u32 import ult, ule, ugt, uge, ushr

I32 = jnp.int32
LANES = 128
FREE = 0x7FFFFFFF
# DMA-semaphore increment per [1,128] i32 row copy: the engine signals
# 32-byte granules (512 B -> 16; verified by scripts/probe_sem.py on the
# v5e backend).  Only the bulk-drain fetch mode (fetch2 >= 2) relies on
# it; the sequential-wait modes stay available via NABWA_PALLAS_FETCH2.
SEM_UNIT = 16

# meta packing: i(0-6) a(7) ldp(8-14) state(15-16) nmm(17-21) go(22-25)
# ge(26-29)
M_I, M_A, M_LDP, M_STATE, M_NMM, M_GO, M_GE = 0, 7, 8, 15, 17, 22, 26


def build_table(bwt_cat_host, rev_word_offset):
    """Host: flat interleaved int32 words (fwd then rev, 12-word blocks)
    -> [n_rows, 128] block16 table + (fwd_row0, rev_row0, rev_sub0).

    Each bank starts at its own row boundary."""
    w = np.asarray(bwt_cat_host, dtype=np.int32)

    def to_blocks(wb):
        # each 128-bp block = [cnt4 | <=8 bwt words]; the bank ends with a
        # partial data block plus a trailing checkpoint (interleave_occ) —
        # pad to a 12-word multiple; padding lanes are masked by position.
        pad = (-len(wb)) % 12
        if pad:
            wb = np.concatenate([wb, np.zeros(pad, np.int32)])
        return wb.reshape(-1, 12)

    fwd = to_blocks(w[:rev_word_offset])
    rev = to_blocks(w[rev_word_offset:])

    def bank(blocks):
        nb = blocks.shape[0]
        nrow = -(-nb // 8)
        out = np.zeros((nrow, 128), dtype=np.int32)
        b16 = np.zeros((nrow * 8, 16), dtype=np.int32)
        b16[:nb, :12] = blocks
        out[:] = b16.reshape(nrow, 128)
        return out

    tf = bank(fwd)
    tr = bank(rev)
    return np.concatenate([tf, tr], axis=0), tf.shape[0]


def _pf(x, lanes=LANES):
    """Pad the last axis to `lanes`."""
    pad = lanes - x.shape[-1]
    if pad <= 0:
        return x[..., :lanes]
    cfg = [(0, 0)] * (x.ndim - 1) + [(0, pad)]
    return jnp.pad(x, cfg)


def _lane_iota(shape, axis=1):
    return jax.lax.broadcasted_iota(I32, shape, axis)


def _extract(row, pos, width=LANES):
    """row[b, pos[b]] (0 when pos out of range): masked sum, no gather.
    row: [BB, 128]; pos: [BB, 1] -> [BB, 1]."""
    m = _lane_iota(row.shape) == pos
    return jnp.where(m, row, 0).sum(axis=1, keepdims=True)


def _prefix_incl(x, width):
    """Inclusive prefix sum along lanes via static-shift adds."""
    sh = 1
    while sh < width:
        shifted = jnp.concatenate(
            [jnp.zeros(x.shape[:-1] + (sh,), x.dtype), x[..., :-sh]],
            axis=-1)
        x = x + shifted
        sh *= 2
    return x


def _sum8_lanes(x):
    """y[i] = sum over lanes i..i+7 of x (shift-left adds)."""
    for sh in (1, 2, 4):
        shifted = jnp.concatenate(
            [x[..., sh:], jnp.zeros(x.shape[:-1] + (sh,), x.dtype)],
            axis=-1)
        x = x + shifted
    return x


def _sel4(v0, v1, v2, v3, c):
    out = jnp.where(c == 1, v1, v0)
    out = jnp.where(c == 2, v2, out)
    return jnp.where(c == 3, v3, out)


def _int_log2(v):
    """int_log2 (bwtgap.c:93-102) for small non-negative int32 cols."""
    bits = jnp.zeros_like(v)
    for b in range(1, 16):
        bits = bits + (v >= (1 << b)).astype(I32)
    return bits


def build_table_i8(table):
    """int32 [n_rows, 128] block16 table → int8 [n_rows, 512] in byte-
    plane layout (cols 0-127 = byte0 of each word, 128-255 = byte1, …)
    for the MXU one-hot gather."""
    t = np.asarray(table, dtype=np.int64) & 0xFFFFFFFF
    planes = [((t >> (8 * b)) & 0xFF).astype(np.uint8).view(np.int8)
              for b in range(4)]
    return np.concatenate(planes, axis=1)


def make_kernel(*, BB, S, H, L, s_mm, s_gapo, s_gape, max_gape, max_gapo,
                indel_end_skip, max_del_occ, max_entries, max_top2,
                max_seed_diff, seed_len, mode, max_iters, mxu=False,
                hbm=False, refill=False, fetch2=False, B_total=0,
                unroll=16, lobotomy=()):
    # lobotomy: diagnostic-only static cuts for per-iteration cost
    # attribution ("nodone" forces exactly max_iters iterations; "fetch"/
    # "push"/"shadow"/"pend" skip those blocks).  Results are WRONG with
    # any cut active; never set outside probe scripts.
    gape_mode = bool(mode & BWA_MODE_GAPE)
    nonstop = bool(mode & BWA_MODE_NONSTOP)
    loggap = bool(mode & BWA_MODE_LOGGAP)
    BIG = 0x7FFFFFF
    assert not refill or hbm, "refill tier requires the HBM table"
    # refill outputs move by per-lane DMA, and Mosaic requires DMA slices
    # lane-aligned to 128 — pad the hit/summ widths (driver slices back)
    HW = -(-H // 128) * 128 if refill else H
    SW = 128 if refill else 8

    def aln_score(m, o, e):
        return m * s_mm + o * s_gapo + e * s_gape

    def kernel(*refs):
        if refill:
            # persistent-occupancy variant: per-read inputs stay in HBM;
            # a finished lane DMAs its outputs out and the cursor's next
            # read in, so the block never stalls on one slow read (the
            # reference's per-record work distribution keeps every core
            # busy the same way, bam2bam.c:1387-1442)
            (params_ref, seqf_h, seqr_h, pwwf_h, pwwr_h, pwbf_h, pwbr_h,
             swwf_h, swwr_h, swbf_h, swbr_h, meta_h, table_ref,
             hmeta_o, hk_o, hl_o, hscore_o, summ_o,
             s_key, s_meta, s_k, s_l, stage, rowidx,
             pw0w, pw0b, pw1w, pw1b,
             seqf_s, seqr_s, swwf_s, swwr_s, swbf_s, swbr_s, meta_s,
             hms, hks, hls, hss, summ_s, lanestat, fillflag, idx_smem,
             cur_read, dma_sem, sem_in, sem_out) = refs
            sww_f_ref, sww_r_ref = swwf_s, swwr_s
            swb_f_ref, swb_r_ref = swbf_s, swbr_s
            hmeta_ref, hk_ref, hl_ref, hscore_ref = hms, hks, hls, hss
        else:
            (params_ref, seqf_ref, seqr_ref, pww_f_ref, pww_r_ref,
             pwb_f_ref, pwb_r_ref, sww_f_ref, sww_r_ref,
             swb_f_ref, swb_r_ref, md_ref, len_ref, hseed_ref,
             table_ref,
             hmeta_ref, hk_ref, hl_ref, hscore_ref, summ_ref,
             s_key, s_meta, s_k, s_l, stage, rowidx,
             pw0w, pw0b, pw1w, pw1b, *rest) = refs
            idx_smem = rest[0] if len(rest) > 1 else None
            dma_sem = rest[-1] if rest else None
        l2_0 = params_ref[0, 0]
        l2_1 = params_ref[0, 1]
        l2_2 = params_ref[0, 2]
        l2_3 = params_ref[0, 3]
        primary_f = params_ref[0, 5]
        primary_r = params_ref[0, 6]
        seq_len = params_ref[0, 7]
        rev_row0 = params_ref[0, 8]

        lane_s = _lane_iota((BB, S))
        lane_p = _lane_iota((BB, LANES))
        # all-true [BB,1] column via a compare (Mosaic rejects bool
        # constant vectors: i8->i1 trunc unsupported)
        true_col = _lane_iota((BB, 1)) == 0
        zcol = jnp.zeros((BB, 1), I32)

        if not refill:
            lengths = len_ref[:, :1]
            max_diff0 = md_ref[:, :1]
            has_seed = hseed_ref[:, :1] != 0
            seq_f = seqf_ref[:, :]
            seq_r = seqr_ref[:, :]

            # mutable width planes (gap_shadow writes them); w and bid
            # ride in SEPARATE planes — the old (w<<8|bid) packing
            # silently dropped w's high bits for genomes >= 2^24 bp,
            # corrupting gap_shadow and the allow_m equality checks at
            # chromosome scale
            pw0w[:] = pww_f_ref[:, :]
            pw0b[:] = pwb_f_ref[:, :]
            pw1w[:] = pww_r_ref[:, :]
            pw1b[:] = pwb_r_ref[:, :]

        # ---- init ----
        s_key[:] = jnp.full((BB, S), FREE, I32)
        s_meta[:] = jnp.zeros((BB, S), I32)
        s_k[:] = jnp.zeros((BB, S), I32)
        s_l[:] = jnp.zeros((BB, S), I32)
        hmeta_ref[:] = jnp.zeros((BB, HW), I32)
        hk_ref[:] = jnp.zeros((BB, HW), I32)
        hl_ref[:] = jnp.zeros((BB, HW), I32)
        hscore_ref[:] = jnp.zeros((BB, HW), I32)

        if refill:
            # every lane starts done with no read assigned; the first
            # sweep fills the block from the cursor.  cur_read is SMEM
            # scratch (uninitialized): set every slot to -1 before the
            # first sweep can read it
            def _init_cr(i, x):
                cur_read[i] = -1
                return x
            jax.lax.fori_loop(0, BB, _init_cr, 0, unroll=BB)
            ocol = jnp.broadcast_to(jnp.ones((1, 1), I32), (BB, 1))
            c0 = dict(
                nent=zcol, seqctr=zcol, best_score=zcol, best_diff=zcol,
                best_cnt=zcol, maxdiff=zcol, naln=zcol, done=ocol,
                ovf=zcol, hw=zcol, pend=zcol, pend_i=zcol, pend_k=zcol,
                pend_l=zcol, pend_cnt=zcol, pend_a=zcol, pend_ldp=zcol,
                fin=zcol, pend_iters=zcol, itst=zcol)
            c_keys = sorted(c0)
            def lane_inputs():
                return (meta_s[:, 1:2], meta_s[:, 0:1],
                        meta_s[:, 2:3] != 0, seqf_s[:, :], seqr_s[:, :])
        else:
            n_count = ((seq_f > 3) & (lane_p < lengths)).astype(I32) \
                .sum(axis=1, keepdims=True)
            done0 = (n_count > max_diff0) | (lengths <= 0)
            seedable = ~done0

            # per-read register file: [BB,1] while_loop carries (a VMEM
            # scratch register tile cost ~30 strided loads + an 18-way
            # masked writeback per iteration; carries live in vregs)
            c0 = dict(
                nent=jnp.where(seedable, 2, 0).astype(I32),
                seqctr=jnp.where(seedable, 2, 0).astype(I32),
                best_score=jnp.broadcast_to(
                    aln_score(max_diff0 + 1, max_gapo + 1, max_gape + 1),
                    (BB, 1)).astype(I32),
                best_diff=(max_diff0 + 1).astype(I32),
                best_cnt=zcol, maxdiff=max_diff0.astype(I32),
                naln=zcol, done=done0.astype(I32), ovf=zcol, hw=zcol,
                pend=zcol, pend_i=zcol, pend_k=zcol, pend_l=zcol,
                pend_cnt=zcol, pend_a=zcol, pend_ldp=zcol, fin=zcol,
                pend_iters=zcol)
            if "skel2" in lobotomy:        # carry-count floor measurement
                c0 = dict(done=c0["done"], fin=zcol, nent=c0["nent"])
            c_keys = sorted(c0)

            # seed pushes: slots 0 (a=0) and 1 (a=1), score 0; the a=1
            # key 0xFFFE is smaller so it pops first like the C
            # (bwtgap.c:127-128)
            seedk = jnp.where(
                lane_s == 0, jnp.where(seedable, 0xFFFF, FREE),
                jnp.where(lane_s == 1, jnp.where(seedable, 0xFFFE, FREE),
                          FREE))
            s_key[:] = seedk
            m0 = lengths            # i=len, a=0, ldp=0, state M, cnt 0
            m1 = lengths | (1 << M_A)
            s_meta[:] = jnp.where(
                lane_s == 0, jnp.where(seedable, m0, 0),
                jnp.where(lane_s == 1, jnp.where(seedable, m1, 0), 0))
            s_l[:] = jnp.where((lane_s < 2) & seedable, seq_len, 0)

        def occ_prep(k, primary):
            """Adjusted position + block geometry cols for one occ4.

            Positions are uint32 bit patterns on int32 lanes (ops.u32):
            unsigned compare vs primary and logical shifts keep the tier
            correct past 2^31 bp (the reference's bwtint_t uint32 range,
            bwt.h:41; cap 4 Gbp at bwtindex.c:103-105)."""
            is_neg1 = k == -1
            kk = jnp.where(uge(k, primary), k - 1, k)
            kk = jnp.where(is_neg1, 0, kk)
            blk = ushr(kk, 7)
            sub = blk & 7
            return (blk >> 3, sub, ushr(kk, 4) & 7, kk & 15,
                    is_neg1.astype(I32))

        def body(carry):
            it, live = carry[0], carry[1]
            cr = dict(zip(c_keys, carry[2:]))

            def getreg(name):
                return cr[name]

            if refill:
                # per-lane inputs live in VMEM scratch and change at
                # refill sweeps — re-read each iteration (cheap VMEM
                # loads; the closure reads of the block-input variant
                # would alias stale rows)
                lengths_b, _md0_b, has_seed_b, seq_f_b, seq_r_b = \
                    lane_inputs()
            else:
                lengths_b, has_seed_b = lengths, has_seed
                seq_f_b, seq_r_b = seq_f, seq_r

            if "skel" in lobotomy:     # loop-machinery floor measurement
                it = it + 1
                done = (getreg("done") != 0) | (it >= max_iters)
                cr["done"] = done.astype(I32)
                cr["fin"] = cr["fin"] + cr["nent"]
                live = (done == 0).astype(I32).sum()
                return (it, live) + tuple(cr[k] for k in c_keys)

            active = getreg("done") == 0
            in_pend = (getreg("pend") != 0) & active
            do_stack = active & ~in_pend

            # ---- stack checks (bwtgap.c:139-141) ----
            n_ent = getreg("nent")
            hw = jnp.where(do_stack, jnp.maximum(getreg("hw"), n_ent),
                           getreg("hw"))
            empty = n_ent == 0
            over_cap = n_ent > max_entries
            done = (getreg("done") != 0) | (do_stack & (empty | over_cap))
            do_pop = do_stack & ~empty & ~over_cap

            # ---- pop: min key; min score then max seq (bwtgap.c:66-79) --
            if "popmin" in lobotomy:   # cut min reduce + stack write
                key = None
                min_key = n_ent * 7
                pop_m = None
            else:
                key = s_key[:]
                min_key = key.min(axis=1, keepdims=True)
                pop_m = key == min_key
            e_score = jax.lax.shift_right_logical(min_key, 16)

            if "popmin" not in lobotomy:
                # single load of each stack array: the pop extraction and
                # the push select-chain share it, and the array is stored
                # back ONCE at the end of the iteration (separate masked
                # RMW statements each cost a full [BB,S] load+store)
                meta_v = s_meta[:]
                k_v = s_k[:]
                l_v = s_l[:]
                e_meta = jnp.where(pop_m, meta_v, 0).sum(axis=1,
                                                         keepdims=True)
                e_k = jnp.where(pop_m, k_v, 0).sum(axis=1, keepdims=True)
                e_l = jnp.where(pop_m, l_v, 0).sum(axis=1, keepdims=True)
                key_v = jnp.where(pop_m & do_pop, FREE, key)
            n_ent = n_ent - do_pop.astype(I32)
            if "pop" in lobotomy or "popmin" in lobotomy:
                e_meta = n_ent + it    # cut the min/extract pipeline
                e_k = n_ent + 1
                e_l = n_ent + 3
                e_score = n_ent & 7

            e_i = e_meta & 0x7F
            e_a = (e_meta >> M_A) & 1
            e_ldp = (e_meta >> M_LDP) & 0x7F
            e_state = (e_meta >> M_STATE) & 3
            e_nmm = (e_meta >> M_NMM) & 0x1F
            e_go = (e_meta >> M_GO) & 0xF
            e_ge = (e_meta >> M_GE) & 0xF

            a0 = e_a == 0

            # ---- best-score stop (bwtgap.c:144) ----
            if not nonstop:
                brk = do_pop & (e_score > getreg("best_score") + s_mm)
                done = done | brk
                do_pop = do_pop & ~brk

            # ---- budget (bwtgap.c:146-148) ----
            m = getreg("maxdiff") - (e_nmm + e_go)
            if gape_mode:
                m = m - e_ge
            proc = do_pop & (m >= 0)

            if not gape_mode:
                exact_ok = (e_state == STATE_M) | (e_ge == max_gape)
            else:
                exact_ok = true_col

            # pre-extract fetch gate: lanes that certainly don't consume
            # this iteration's occ skip both DMAs — done/empty lanes,
            # budget-dead pops, direct hits (e_i == 0), and lanes ENTERING
            # the pend path (their first exact step is next iteration).
            # The width-lower-bound check can still kill a fetching lane
            # later (extract-dependent, so not known at issue time); its
            # fetch is wasted but harmless.
            fetch_need = in_pend | (proc & (e_i > 0)
                                    & ~((m == 0) & exact_ok))

            # ---- shared occ lookups (the bwt_2occ4 analog): a lane is
            # either pending or popping, never both ----
            occ_a = jnp.where(in_pend, getreg("pend_a"), e_a)
            occ_k_in = jnp.where(in_pend, getreg("pend_k"), e_k) - 1
            occ_l_in = jnp.where(in_pend, getreg("pend_l"), e_l)
            oa0 = occ_a == 0
            # a=0 -> reverse bank, a=1 -> forward (bwtgap.c:149)
            prim = jnp.where(oa0, primary_r, primary_f)
            row0 = jnp.where(oa0, rev_row0, 0)
            krow, ksub, kwoff, kwin, kneg = occ_prep(occ_k_in, prim)
            lrow, lsub, lwoff, lwin, lneg = occ_prep(occ_l_in, prim)
            # clamp: lanes with an empty stack pop garbage (pop_m matches
            # every FREE slot, e_k = sum of stale values) — the load must
            # stay in bounds even though its result is masked out
            n_rows = table_ref.shape[0]
            rk_col = jnp.clip(krow + row0, 0, n_rows - 1)
            rl_col = jnp.clip(lrow + row0, 0, n_rows - 1)
            if mxu:
                # MXU gather: one-hot [2BB, n_rows] int8 times the byte-
                # plane table [n_rows, 512] — the whole batch's 2occ4
                # block fetch as ONE int8 matmul, no scalar-core loop.
                idx2 = jnp.concatenate([rk_col, rl_col], axis=0)  # [2BB,1]
                riota = jax.lax.broadcasted_iota(I32, (2 * BB, n_rows), 1)
                onehot = (riota == idx2).astype(jnp.int8)
                planes = jax.lax.dot_general(
                    onehot, table_ref[:, :],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=I32)      # [2BB, 512]
                rows = ((planes[:, 0:128] & 0xFF)
                        | ((planes[:, 128:256] & 0xFF) << 8)
                        | ((planes[:, 256:384] & 0xFF) << 16)
                        | (planes[:, 384:512] << 24))
                same_row = None
            else:
                # bwt_2occ4's shared-checkpoint shortcut (bwt.c:118-153):
                # k-1 and l usually land in the same block row once the
                # interval narrows — skip the second copy.  Lanes outside
                # fetch_need skip both (their stage rows stay stale and
                # every downstream use is masked).
                same_row = rl_col == rk_col
                if "fetch" not in lobotomy:
                    if fetch2 >= 1:
                        # unconditional-fetch variant: every lane always
                        # copies both (clamped) rows — no per-lane guard
                        # branches, a statically-known descriptor count,
                        # and a fixed-length drain.  Dead/pend lanes copy
                        # garbage rows whose uses are masked downstream;
                        # the extra HBM traffic (~64 KB/iter at BB=128)
                        # is far below the descriptor-issue cost it
                        # replaces (fetch bucket = 62% of kernel time,
                        # probe_lobotomy r5).
                        rowidx[:, 0:1] = rk_col
                        rowidx[:, 1:2] = rl_col
                    else:
                        rowidx[:, 0:1] = jnp.where(fetch_need, rk_col, -1)
                        rowidx[:, 1:2] = jnp.where(fetch_need & ~same_row,
                                                   rl_col, -1)
            if hbm:
                # HBM-resident table: the two per-lane 512 B block rows
                # arrive by async DMA instead of VMEM row copies — this
                # removes the VMEM genome-size gate entirely (the
                # reference streams the same 48 B blocks from DRAM per
                # DFS step, bwt_2occ4 bwt.c:179-216).  All copies are
                # issued back-to-back right after the pop; every occ-
                # independent gate (plane extracts, seq lookup, free-slot
                # prefix) then runs in the DMA shadow before the drain.
                if fetch2 >= 1:
                    if fetch2 >= 3 and BB == LANES:
                        # stage the row indices to SMEM: transpose the
                        # [BB,1] index columns onto lanes (one XLU
                        # sublane<->lane transpose each), DMA the aligned
                        # [2,128] tile to SMEM, and the issue loop does
                        # 2*BB fast SMEM scalar reads instead of 2*BB
                        # slow VMEM scalar reads
                        rowidx[0:1, :] = jnp.transpose(rk_col)
                        rowidx[1:2, :] = jnp.transpose(rl_col)
                        idx_cp = pltpu.make_async_copy(
                            rowidx.at[pl.ds(0, 2), :], idx_smem, dma_sem)
                        idx_cp.start()
                        idx_cp.wait()

                        def issue3(i, cur):
                            pltpu.make_async_copy(
                                table_ref.at[pl.ds(idx_smem[0, i], 1), :],
                                stage.at[pl.ds(i, 1), :], dma_sem).start()
                            pltpu.make_async_copy(
                                table_ref.at[pl.ds(idx_smem[1, i], 1), :],
                                stage.at[pl.ds(i + BB, 1), :],
                                dma_sem).start()
                            return cur
                        issue2 = issue3
                    else:
                        def issue2(i, cur):
                            pltpu.make_async_copy(
                                table_ref.at[pl.ds(rowidx[i, 0], 1), :],
                                stage.at[pl.ds(i, 1), :], dma_sem).start()
                            pltpu.make_async_copy(
                                table_ref.at[pl.ds(rowidx[i, 1], 1), :],
                                stage.at[pl.ds(i + BB, 1), :],
                                dma_sem).start()
                            return cur
                    n_dma = jnp.int32(2 * BB)
                    if "fetch" not in lobotomy:
                        jax.lax.fori_loop(0, BB, issue2, jnp.int32(0),
                                          unroll=BB)
                else:
                    def issue(i, cur):
                        rk = rowidx[i, 0]

                        @pl.when(rk >= 0)
                        def _():
                            pltpu.make_async_copy(
                                table_ref.at[pl.ds(rk, 1), :],
                                stage.at[pl.ds(i, 1), :], dma_sem).start()
                        rl = rowidx[i, 1]

                        @pl.when(rl >= 0)
                        def _():
                            pltpu.make_async_copy(
                                table_ref.at[pl.ds(rl, 1), :],
                                stage.at[pl.ds(i + BB, 1), :],
                                dma_sem).start()
                        return (cur + (rk >= 0).astype(jnp.int32)
                                + (rl >= 0).astype(jnp.int32))
                    n_dma = jnp.int32(0)
                    if "fetch" not in lobotomy:
                        n_dma = jax.lax.fori_loop(0, BB, issue,
                                                  jnp.int32(0), unroll=BB)
            elif not mxu:
                # VMEM-resident table: synchronous scalar-driven row
                # copies (no DMA latency to hide, but dead lanes still
                # skip theirs)
                def load(i, _):
                    rk = rowidx[i, 0]

                    @pl.when(rk >= 0)
                    def _():
                        stage[pl.ds(i, 1), :] = table_ref[pl.ds(rk, 1), :]
                    rl = rowidx[i, 1]

                    @pl.when(rl >= 0)
                    def _():
                        stage[pl.ds(i + BB, 1), :] = \
                            table_ref[pl.ds(rl, 1), :]
                    return 0
                # full unroll: the copies are cheap, the per-iteration
                # scalar loop control is not
                if "fetch" not in lobotomy:
                    jax.lax.fori_loop(0, BB, load, 0, unroll=BB)

            # ================= DMA-shadow window =================
            # Everything here is occ-independent vector work that runs
            # while the HBM fetches are in flight.

            # one load per mutable plane per iteration; gap_shadow updates
            # the register copies and they store back once
            p0w, p0b = pw0w[:], pw0b[:]
            p1w, p1b = pw1w[:], pw1b[:]
            bid_plane = jnp.where(a0, p0b, p1b)

            # ---- width lower bound (bwtgap.c:156) ----
            if "extracts" in lobotomy:   # cut every plane _extract
                bid_im1 = m & 1
            else:
                bid_im1 = _extract(bid_plane, e_i - 1)
            proc = proc & ~((e_i > 0) & (m < bid_im1))

            # ---- hit / exact-path / expand split (bwtgap.c:158-164) ----
            direct_hit = proc & (e_i == 0)
            need_exact = proc & ~direct_hit & (m == 0) & exact_ok
            expand = proc & ~direct_hit & ~need_exact

            pend_i = jnp.where(need_exact, e_i, getreg("pend_i"))
            pend_k = jnp.where(need_exact, e_k, getreg("pend_k"))
            pend_l = jnp.where(need_exact, e_l, getreg("pend_l"))
            pend_a = jnp.where(need_exact, e_a, getreg("pend_a"))
            pend_ldp = jnp.where(need_exact, e_ldp, getreg("pend_ldp"))
            pend_cnt = jnp.where(need_exact, e_meta, getreg("pend_cnt"))
            pend = in_pend | need_exact

            # ---- expansion gates, hoisted pre-occ (bwtgap.c:201-218).
            # Pre-shadow plane reads are exact here: a lane never hits and
            # expands in the same iteration (i==0 → hit, pend lanes never
            # expand), and gap_shadow only writes the hitting lane's own
            # plane row, so an expanding lane's row is untouched.
            i2 = e_i - 1
            occ_width = e_l - e_k + 1
            if "extracts" in lobotomy:
                allow_diff = true_col
                allow_m = true_col
            else:
                w_plane = jnp.where(a0, p0w, p1w)
                b_plane = jnp.where(a0, p0b, p1b)
                bid_i2m1 = _extract(b_plane, i2 - 1)
                bid_i2 = _extract(b_plane, i2)
                w_i2m1 = _extract(w_plane, i2 - 1)
                w_i2 = _extract(w_plane, i2)
                i2_pos = i2 > 0
                allow_diff = ~i2_pos | ~(bid_i2m1 > m - 1)
                allow_m = ~i2_pos | ~((bid_i2m1 == m - 1)
                                      & (bid_i2 == m - 1)
                                      & (w_i2m1 == w_i2))
                # seed bounds (bwtgap.c:210-214)
                hseed = has_seed_b
                ii = jnp.where(hseed, i2 - (lengths_b - seed_len), -1)
                spw = jnp.where(a0, sww_f_ref[:, :], sww_r_ref[:, :])
                spb = jnp.where(a0, swb_f_ref[:, :], swb_r_ref[:, :])
                sbid_iim1 = _extract(spb, ii - 1)
                sbid_ii = _extract(spb, ii)
                sw_iim1 = _extract(spw, ii - 1)
                sw_ii = _extract(spw, ii)
                m_seed = max_seed_diff - (e_nmm + e_go) \
                    - (e_ge if gape_mode else 0)
                seed_gate = (i2 > 0) & (ii > 0)
                allow_diff = allow_diff & ~(seed_gate
                                            & (sbid_iim1 > m_seed - 1))
                allow_m = allow_m & ~(seed_gate
                                      & (sbid_iim1 == m_seed - 1)
                                      & (sbid_ii == m_seed - 1)
                                      & (sw_iim1 == sw_ii))

            # indel gating (bwtgap.c:217-218)
            vsum = e_go + e_ge
            if loggap:
                tmp = _int_log2(vsum) // 2 + 1
            else:
                tmp = vsum
            ind_ok = (allow_diff & (i2 >= indel_end_skip + tmp)
                      & (lengths_b - i2 >= indel_end_skip + tmp))

            is_m = e_state == STATE_M
            is_i = e_state == STATE_I
            is_d = e_state == STATE_D
            can_open = is_m & (e_go < max_gapo)
            can_ext_i = is_i & (e_ge < max_gape)
            # maxdiff: an expanding lane never hit this iteration, so its
            # register value equals the post-hit local the original code
            # read here
            can_ext_d = (is_d & (e_ge < max_gape)
                         & ((e_go + e_ge < getreg("maxdiff"))
                            | ult(occ_width, max_del_occ)))

            # ---- shared seq lookup (pend uses pend_i-1, expansion uses
            # i2 = e_i-1; disjoint lanes) ----
            p_a0 = getreg("pend_a") == 0
            # select with i1 *operands* is unsupported (Mosaic i8<->i1
            # trunc hole) — select in i32, then compare
            use_f = jnp.where(in_pend, p_a0.astype(I32),
                              a0.astype(I32)) != 0
            seq_sel = jnp.where(use_f, seq_f_b, seq_r_b)
            look_pos = jnp.where(in_pend, getreg("pend_i") - 1, e_i - 1)
            base_c = _extract(seq_sel, look_pos)
            sc = base_c          # seq at i2 for expansion
            pc = base_c
            cc = jnp.minimum(pc, 3)
            l2c = _sel4(l2_0, l2_1, l2_2, l2_3, cc)

            # free-slot rank for the push (needs only the post-pop keys)
            if "push" not in lobotomy and "popmin" not in lobotomy:
                freem = key_v == FREE
                frank = _prefix_incl(freem.astype(I32), S)

            # hit meta selects that don't need the stepped pend_k/pend_l
            h_meta = jnp.where(direct_hit, e_meta, pend_cnt)
            h_nmm = (h_meta >> M_NMM) & 0x1F
            h_go = (h_meta >> M_GO) & 0xF
            h_ge = (h_meta >> M_GE) & 0xF
            h_a = jnp.where(direct_hit, e_a, getreg("pend_a"))
            h_ldp = jnp.where(direct_hit, e_ldp, pend_ldp)
            h_score = aln_score(h_nmm, h_go, h_ge)
            # ================ end DMA-shadow window ================

            if hbm:
                # drain.  Mode 2+: ONE bulk semaphore_wait for the whole
                # sweep — each [1,128] i32 copy increments the DMA
                # semaphore by its 32-byte-granule count (512 B -> 16,
                # measured on this backend by scripts/probe_sem.py), so
                # waiting n_dma*16 replaces n_dma sequential waits.
                # Mode 1: fixed-descriptor unrolled waits.  Mode 0
                # (legacy): n_dma dynamic waits.
                def drain1(i, _):
                    pltpu.make_async_copy(
                        table_ref.at[pl.ds(0, 1), :],
                        stage.at[pl.ds(0, 1), :], dma_sem).wait()
                    return 0
                if "fetch" not in lobotomy:
                    if fetch2 >= 2:
                        # jax refuses semaphore_wait on DMA semaphores,
                        # but a wait's decrement comes from its
                        # DESCRIPTOR size — one [2BB,128] slab descriptor
                        # drains the whole sweep's 2*BB row copies in a
                        # single wait
                        pltpu.make_async_copy(
                            table_ref.at[pl.ds(0, 2 * BB), :],
                            stage.at[pl.ds(0, 2 * BB), :],
                            dma_sem).wait()
                    elif fetch2 == 1:
                        # static count: the loop bound is known at trace
                        # time, so the drain unrolls with no scalar
                        # bookkeeping
                        jax.lax.fori_loop(0, 2 * BB, drain1, 0,
                                          unroll=2 * BB)
                    else:
                        jax.lax.fori_loop(0, n_dma, drain1, 0)

            if not mxu:
                # same-row lanes read the k bank for l too (their slot in
                # the second bank is stale)
                same_b = jnp.broadcast_to(same_row.astype(I32),
                                          (BB, LANES)) != 0
                stage_l = jnp.where(same_b, stage[0:BB, :], stage[BB:, :])
            sub2 = jnp.concatenate([ksub, lsub], axis=0)      # [2BB,1]
            woff2 = jnp.concatenate([kwoff, lwoff], axis=0)
            win2 = jnp.concatenate([kwin, lwin], axis=0)
            neg2 = jnp.concatenate([kneg, lneg], axis=0)
            lane2 = _lane_iota((2 * BB, LANES))
            if not mxu:
                rows = jnp.concatenate([stage[0:BB, :], stage_l], axis=0)
            rel = lane2 - sub2 * 16
            j = rel - 4
            partial = (-1) << ((15 - win2) * 2)
            vm = jnp.where((j >= 0) & (j < woff2), -1,
                           jnp.where(j == woff2, partial, 0))
            lo = rows & vm & 0x55555555
            hi = jax.lax.shift_right_logical(rows, 1) & vm & 0x55555555
            pc_lo = jax.lax.population_count(lo)
            pc_hi = jax.lax.population_count(hi)
            pc_lh = jax.lax.population_count(lo & hi)
            packed = pc_lo | (pc_hi << 8) | (pc_lh << 16)
            psum = _sum8_lanes(jnp.where((j >= 0) & (j < 8), packed, 0))
            # select this block's checkpoint words + count sum (8-way
            # static-slice select by sub)
            ck = rows[:, 0:4]
            cs = psum[:, 4:5]
            for sblk in range(1, 8):
                is_s = sub2 == sblk
                ck = jnp.where(is_s, rows[:, 16 * sblk:16 * sblk + 4], ck)
                cs = jnp.where(is_s, psum[:, 16 * sblk + 4:16 * sblk + 5],
                               cs)
            f_lo = cs & 0xFF
            f_hi = (cs >> 8) & 0xFF
            f_lh = (cs >> 16) & 0xFF
            c3 = f_lh
            c1 = f_lo - f_lh
            c2 = f_hi - f_lh
            n_valid = woff2 * 16 + win2 + 1
            c0 = n_valid - c1 - c2 - c3
            cnt0 = jnp.where(neg2 != 0, 0, ck[:, 0:1] + c0)
            cnt1 = jnp.where(neg2 != 0, 0, ck[:, 1:2] + c1)
            cnt2 = jnp.where(neg2 != 0, 0, ck[:, 2:3] + c2)
            cnt3 = jnp.where(neg2 != 0, 0, ck[:, 3:4] + c3)
            if "occ" in lobotomy:     # cut the popcount/extract pipeline
                dummy = jnp.concatenate([occ_k_in, occ_l_in], axis=0) & 0xFF
                cnt0, cnt1, cnt2, cnt3 = dummy, dummy + 1, dummy + 2, \
                    dummy + 3
            cnt_k = (cnt0[:BB], cnt1[:BB], cnt2[:BB], cnt3[:BB])
            cnt_l = (cnt0[BB:], cnt1[BB:], cnt2[BB:], cnt3[BB:])

            # ---- pending exact-match step (bwt_match_exact_alt);
            # base_c/cc/l2c were computed in the DMA shadow ----
            okk = _sel4(*cnt_k, cc)
            oll = _sel4(*cnt_l, cc)
            nk = l2c + okk + 1
            nl = l2c + oll
            pfail = in_pend & ((pc > 3) | ugt(nk, nl))
            pstep = in_pend & ~pfail
            pend_k = jnp.where(pstep, nk, pend_k)
            pend_l = jnp.where(pstep, nl, pend_l)
            pend_i = jnp.where(pstep, pend_i - 1, pend_i)
            pend_hit = pstep & (pend_i == 0)
            pend = pend & ~(pend_hit | pfail)
            if "pend" in lobotomy:     # cut the pend/seq-select pipeline
                pend_hit = in_pend & (e_k > e_l)
                pend = in_pend & ~pend_hit
                pend_k = getreg("pend_k") + 1
                pend_l = getreg("pend_l") + 2
                pend_i = getreg("pend_i") - 1

            # ---- hit processing (bwtgap.c:166-199); the h_* meta selects
            # live in the DMA shadow, only h_k/h_l need the stepped pend --
            hit_now = direct_hit | pend_hit
            if "hit" in lobotomy:      # cut hit/best/shadow arithmetic
                hit_now = hit_now & ~true_col
            h_k = jnp.where(direct_hit, e_k, pend_k)
            h_l = jnp.where(direct_hit, e_l, pend_l)

            n_aln = getreg("naln")
            first_hit = hit_now & (n_aln == 0)
            new_best_diff = h_nmm + h_go + (h_ge if gape_mode else 0)
            best_score = jnp.where(first_hit, h_score,
                                   getreg("best_score"))
            best_diff = jnp.where(first_hit, new_best_diff,
                                  getreg("best_diff"))
            max_diff = getreg("maxdiff")
            if not nonstop:
                max_diff = jnp.where(
                    first_hit, jnp.minimum(new_best_diff + 1, max_diff),
                    max_diff)
            eq_best = h_score == best_score
            width_cnt = h_l - h_k + 1
            brk2 = hit_now & ~eq_best & (getreg("best_cnt") > max_top2)
            best_cnt = getreg("best_cnt") + jnp.where(
                hit_now & eq_best, width_cnt, 0)
            done = done | brk2
            add_lane = hit_now & ~brk2
            # tandem-repeat dedup (bwtgap.c:179-183)
            lane_h = _lane_iota((BB, HW))
            in_hits = ((hk_ref[:] == h_k) & (hl_ref[:] == h_l)
                       & (lane_h < n_aln)).astype(I32) \
                .sum(axis=1, keepdims=True) > 0
            do_add = add_lane & ~((h_go > 0) & in_hits)

            # gap_shadow (bwtgap.c:81-91) on the h_a-strand planes
            ha0 = h_a == 0
            wa = jnp.where(ha0, p0w, p1w)
            bida = jnp.where(ha0, p0b, p1b)
            x = h_l - h_k + 1
            # i1 [BB,1] & [BB,128] broadcast-AND is unsupported by this
            # Mosaic version (i8<->i1 trunc); broadcast via i32 multiply
            shadow_mask = (do_add.astype(I32)
                           * (lane_p < h_ldp).astype(I32)) != 0
            eqm = shadow_mask & (wa == x)
            gtm = shadow_mask & ugt(wa, x)
            jc = _prefix_incl(eqm.astype(I32), LANES)
            wa_new = jnp.where(gtm, wa - x,
                               jnp.where(eqm, seq_len - jc, wa))
            bida_new = jnp.where(eqm, 1, bida)
            # [BB,1] i1 select-preds on ref stores hit the same Mosaic
            # i8<->i1 trunc hole; broadcast the pred in i32 first
            wr0 = jnp.broadcast_to((do_add & ha0).astype(I32),
                                   (BB, LANES)) != 0
            wr1 = jnp.broadcast_to((do_add & ~ha0).astype(I32),
                                   (BB, LANES)) != 0
            if "shadow" not in lobotomy:
                p0w = jnp.where(wr0, wa_new, p0w)
                p0b = jnp.where(wr0, bida_new, p0b)
                p1w = jnp.where(wr1, wa_new, p1w)
                p1b = jnp.where(wr1, bida_new, p1b)
                pw0w[:] = p0w
                pw0b[:] = p0b
                pw1w[:] = p1w
                pw1b[:] = p1b

            # append hit via one-hot write at n_aln
            hof = do_add & (n_aln >= H)
            overflow = (getreg("ovf") != 0) | hof
            write_hit = do_add & ~hof
            hmask = write_hit & (lane_h == n_aln)
            hcnt_c = (h_nmm | (h_go << 8) | (h_ge << 16))
            meta_out = hcnt_c | (h_a << 24)
            if "shadow" not in lobotomy:
                hmeta_ref[:] = jnp.where(hmask, meta_out, hmeta_ref[:])
                hk_ref[:] = jnp.where(hmask, h_k, hk_ref[:])
                hl_ref[:] = jnp.where(hmask, h_l, hl_ref[:])
                hscore_ref[:] = jnp.where(hmask, h_score, hscore_ref[:])
            n_aln = n_aln + write_hit.astype(I32)

            # ---- expansion (bwtgap.c:201-259): every gate (allow_diff,
            # allow_m, ind_ok, can_*) was computed in the DMA shadow from
            # the pre-shadow planes, which is exact for expanding lanes
            # (see the shadow-window comment) ----
            cand = []
            # slot 0: insertion open (M) or extension (I)
            cand.append(dict(
                valid=expand & ind_ok & (can_open | can_ext_i),
                i=i2, k=e_k, l=e_l, nmm=e_nmm,
                go=e_go + is_m.astype(I32), ge=e_ge + is_i.astype(I32),
                state=STATE_I, diff=true_col))
            # slots 1-4: deletion for bases 0..3
            dcnt_k = cnt_k
            dcnt_l = cnt_l
            l2s = (l2_0, l2_1, l2_2, l2_3)
            for c in range(4):
                dk = l2s[c] + dcnt_k[c] + 1
                dl = l2s[c] + dcnt_l[c]
                cand.append(dict(
                    valid=expand & ind_ok & (can_open | can_ext_d)
                    & ule(dk, dl),
                    i=i2 + 1, k=dk, l=dl, nmm=e_nmm,
                    go=e_go + is_m.astype(I32),
                    ge=e_ge + is_d.astype(I32),
                    state=STATE_D, diff=true_col))
            # slots 5-8: mismatch/match c=(sc+j)&3 for j=1..4
            mm_all = allow_diff & allow_m
            exact_only = ~mm_all & (sc < 4)
            for jj in range(1, 5):
                c = (sc + jj) & 3
                is_mm = ((sc > 3) | true_col) if jj != 4 else (sc > 3)
                l2c_j = _sel4(l2_0, l2_1, l2_2, l2_3, c)
                mk = l2c_j + _sel4(*cnt_k, c) + 1
                ml = l2c_j + _sel4(*cnt_l, c)
                cand.append(dict(
                    valid=expand & ule(mk, ml)
                    & (mm_all | (exact_only & (jj == 4))),
                    i=i2, k=mk, l=ml, nmm=e_nmm + is_mm.astype(I32),
                    go=e_go, ge=e_ge, state=STATE_M, diff=is_mm))
            if "cand" in lobotomy:      # cut all candidate arithmetic
                cand = [dict(valid=expand & ((e_k & 3) > 0), i=i2, k=e_k,
                             l=e_l, nmm=e_nmm, go=e_go, ge=e_ge,
                             state=STATE_M, diff=true_col)]

            # push-time pruning (provably inert, see ops/dfs.py)
            seq_ctr = getreg("seqctr")
            bscore_lim = best_score + s_mm
            for cd in cand:
                cdiffsum = cd["nmm"] + cd["go"] \
                    + (cd["ge"] if gape_mode else 0)
                keep = cdiffsum <= max_diff
                csc = aln_score(cd["nmm"], cd["go"], cd["ge"])
                if not nonstop:
                    keep = keep & (csc <= bscore_lim)
                cd["valid"] = cd["valid"] & keep
                cd["score"] = csc

            # prefix over the 9 static slots
            pref = jnp.zeros((BB, 1), I32)
            for cd in cand:
                cd["pref"] = pref
                pref = pref + cd["valid"].astype(I32)
            n_push = pref

            free_n = S - n_ent
            sovf = expand & ((n_push > free_n)
                             | (seq_ctr + n_push > 0xFFFF))
            overflow = overflow | sovf
            done = done | sovf

            if "push" not in lobotomy and "popmin" not in lobotomy:
                # freem/frank were computed in the DMA shadow
                for cd in cand:
                    v = cd["valid"] & ~sovf
                    meta_c = (cd["i"] | (e_a << M_A)
                              | (jnp.where(cd["diff"], cd["i"], 0)
                                 << M_LDP)
                              | (cd["state"] << M_STATE)
                              | (cd["nmm"] << M_NMM) | (cd["go"] << M_GO)
                              | (cd["ge"] << M_GE))
                    ckey = (cd["score"] << 16) | (0xFFFF - seq_ctr
                                                  - cd["pref"])
                    mask = v & freem & (frank == cd["pref"] + 1)
                    key_v = jnp.where(mask, ckey, key_v)
                    meta_v = jnp.where(mask, meta_c, meta_v)
                    k_v = jnp.where(mask, cd["k"], k_v)
                    l_v = jnp.where(mask, cd["l"], l_v)
            if "popmin" not in lobotomy:
                s_key[:] = key_v
                s_meta[:] = meta_v
                s_k[:] = k_v
                s_l[:] = l_v
            n_pushed = jnp.where(sovf, 0, n_push)
            n_ent = n_ent + n_pushed
            seq_ctr = seq_ctr + n_pushed

            it = it + 1
            if "nodone" in lobotomy:    # fixed-iteration timing run
                done = done & ~true_col
            if refill:
                lane_it = it - getreg("itst")
                fin = jnp.where(active & done, lane_it, getreg("fin"))
                cap_hit = lane_it >= max_iters
            else:
                fin = jnp.where(active & done, it, getreg("fin"))
                cap_hit = it >= max_iters
            overflow = overflow | (active & ~done & cap_hit)
            done = done | (active & cap_hit)

            # ---- next-iteration register file ----
            nxt = dict(
                nent=n_ent, best_score=best_score, best_diff=best_diff,
                best_cnt=best_cnt, maxdiff=max_diff, naln=n_aln,
                done=done.astype(I32), ovf=overflow.astype(I32), hw=hw,
                pend=pend.astype(I32), pend_i=pend_i, pend_k=pend_k,
                pend_l=pend_l, pend_cnt=pend_cnt, pend_a=pend_a,
                pend_ldp=pend_ldp, fin=fin, seqctr=seq_ctr,
                pend_iters=getreg("pend_iters") + in_pend.astype(I32))
            if refill:
                nxt["itst"] = getreg("itst")
                # liveness is owned by the sweep (live = unflushed reads);
                # the per-iteration cross-sublane reduce is skipped
                return (it, live) + tuple(nxt[k] for k in c_keys)
            live = (done == 0).astype(I32).sum()
            return (it, live) + tuple(nxt[k] for k in c_keys)

        def cond(carry):
            return carry[1] > 0

        # liveness is only CHECKED every UNROLL iterations: the cond's
        # vector->scalar->branch round trip stalls the vector pipeline,
        # and iterating a fully-done block is a no-op (done lanes mutate
        # nothing), so up to UNROLL-1 wasted tail iterations are cheaper
        # than a sync per iteration (measured on v5e)
        # U=16 measured 2.3 us/iter cheaper than U=8 on v5e (the sync is
        # ~35 us); the extra <=15 no-op tail iterations are ~3% of a
        # typical 440-iteration block
        import os as _os
        UNROLL = int(_os.environ.get("NABWA_DFS_UNROLL", str(unroll)))

        if refill:
            lane8 = _lane_iota((BB, SW))

            def sweep(it, cursor, cr):
                """Flush finished lanes' outputs to HBM, pull the next
                reads from the cursor, re-seed the refilled lanes.
                Runs every UNROLL iterations; returns the new register
                file + (n_flushed, new_cursor)."""
                # vector -> scalar handoff: done flags + the summ rows
                lanestat[:, 0:1] = cr["done"]
                if fetch2 >= 3 and BB == LANES:
                    # SMEM-stage the done flags (same trick as the occ
                    # fetch): the lane loop then reads fast SMEM scalars
                    # instead of BB slow VMEM scalars per sweep
                    lanestat[0:1, :] = jnp.transpose(cr["done"])
                    st_cp = pltpu.make_async_copy(
                        lanestat.at[pl.ds(0, 2), :], idx_smem, dma_sem)
                    st_cp.start()
                    st_cp.wait()
                fillflag[:] = jnp.zeros((BB, LANES), I32)
                summ = jnp.zeros((BB, SW), I32)
                summ = jnp.where(lane8 == 0, cr["naln"], summ)
                summ = jnp.where(lane8 == 1, cr["hw"], summ)
                summ = jnp.where(lane8 == 2, cr["ovf"], summ)
                summ = jnp.where(lane8 == 3, cr["fin"], summ)
                summ = jnp.where(lane8 == 4, it, summ)
                summ = jnp.where(lane8 == 5, cr["pend_iters"], summ)
                summ_s[:] = summ

                one_row = jnp.ones((1, LANES), I32)

                def lane(i, c):
                    nf, ni, cur = c
                    st = idx_smem[0, i] if fetch2 >= 3 and BB == LANES \
                        else lanestat[i, 0]
                    rd = cur_read[i]
                    do_flush = (st != 0) & (rd >= 0)

                    @pl.when(do_flush)
                    def _():
                        for src, dst in ((hms, hmeta_o), (hks, hk_o),
                                         (hls, hl_o), (hss, hscore_o)):
                            pltpu.make_async_copy(
                                src.at[pl.ds(i, 1), :],
                                dst.at[pl.ds(rd, 1), :], sem_out).start()
                        pltpu.make_async_copy(
                            summ_s.at[pl.ds(i, 1), :],
                            summ_o.at[pl.ds(rd, 1), :], sem_out).start()
                    do_fill = (st != 0) & (cur < B_total)

                    @pl.when(do_fill)
                    def _():
                        for src, dst in ((seqf_h, seqf_s), (seqr_h, seqr_s),
                                         (pwwf_h, pw0w), (pwwr_h, pw1w),
                                         (pwbf_h, pw0b), (pwbr_h, pw1b),
                                         (swwf_h, swwf_s),
                                         (swwr_h, swwr_s),
                                         (swbf_h, swbf_s),
                                         (swbr_h, swbr_s),
                                         (meta_h, meta_s)):
                            pltpu.make_async_copy(
                                src.at[pl.ds(cur, 1), :],
                                dst.at[pl.ds(i, 1), :], sem_in).start()
                        cur_read[i] = cur
                        fillflag[pl.ds(i, 1), :] = one_row

                    @pl.when((st != 0) & (cur >= B_total) & (rd >= 0))
                    def _():
                        cur_read[i] = -1
                    return (nf + do_flush.astype(I32),
                            ni + do_fill.astype(I32),
                            cur + do_fill.astype(I32))

                nf, ni, cursor2 = jax.lax.fori_loop(
                    0, BB, lane, (jnp.int32(0), jnp.int32(0), cursor),
                    unroll=BB)

                # drain: fixed-shape waits, one per issued copy (shared-
                # semaphore byte accounting, same trick as the fetch
                # drain below)
                def dr_in(_, x):
                    pltpu.make_async_copy(
                        seqf_h.at[pl.ds(0, 1), :],
                        seqf_s.at[pl.ds(0, 1), :], sem_in).wait()
                    return x
                jax.lax.fori_loop(0, 11 * ni, dr_in, 0)

                def dr_oh(_, x):
                    pltpu.make_async_copy(
                        hms.at[pl.ds(0, 1), :],
                        hmeta_o.at[pl.ds(0, 1), :], sem_out).wait()
                    return x
                jax.lax.fori_loop(0, 4 * nf, dr_oh, 0)

                def dr_os(_, x):
                    pltpu.make_async_copy(
                        summ_s.at[pl.ds(0, 1), :],
                        summ_o.at[pl.ds(0, 1), :], sem_out).wait()
                    return x
                jax.lax.fori_loop(0, nf, dr_os, 0)

                # vector re-init of the refilled lanes
                fillc = fillflag[:, 0:1] != 0
                fill_b = jnp.broadcast_to(fillc.astype(I32),
                                          (BB, S)) != 0
                fill_h = jnp.broadcast_to(fillc.astype(I32),
                                          (BB, HW)) != 0
                len_col = meta_s[:, 1:2]
                md_col = meta_s[:, 0:1]
                seq_f2 = seqf_s[:, :]
                n_count = ((seq_f2 > 3) & (lane_p < len_col)) \
                    .astype(I32).sum(axis=1, keepdims=True)
                done0 = (n_count > md_col) | (len_col <= 0)
                seedable = fillc & ~done0
                seedk = jnp.where(
                    lane_s == 0, jnp.where(seedable, 0xFFFF, FREE),
                    jnp.where(lane_s == 1,
                              jnp.where(seedable, 0xFFFE, FREE), FREE))
                s_key[:] = jnp.where(fill_b, seedk, s_key[:])
                m0 = len_col
                m1 = len_col | (1 << M_A)
                seedm = jnp.where(
                    lane_s == 0, jnp.where(seedable, m0, 0),
                    jnp.where(lane_s == 1, jnp.where(seedable, m1, 0), 0))
                s_meta[:] = jnp.where(fill_b, seedm, s_meta[:])
                s_k[:] = jnp.where(fill_b, 0, s_k[:])
                s_l[:] = jnp.where(
                    fill_b, jnp.where((lane_s < 2) & seedable, seq_len, 0),
                    s_l[:])
                hms[:] = jnp.where(fill_h, 0, hms[:])
                hks[:] = jnp.where(fill_h, 0, hks[:])
                hls[:] = jnp.where(fill_h, 0, hls[:])
                hss[:] = jnp.where(fill_h, 0, hss[:])

                two = jnp.where(seedable, 2, 0).astype(I32)
                nxt = dict(
                    nent=jnp.where(fillc, two, cr["nent"]),
                    seqctr=jnp.where(fillc, two, cr["seqctr"]),
                    best_score=jnp.where(
                        fillc, aln_score(md_col + 1, max_gapo + 1,
                                         max_gape + 1),
                        cr["best_score"]),
                    best_diff=jnp.where(fillc, md_col + 1,
                                        cr["best_diff"]),
                    best_cnt=jnp.where(fillc, 0, cr["best_cnt"]),
                    maxdiff=jnp.where(fillc, md_col, cr["maxdiff"]),
                    naln=jnp.where(fillc, 0, cr["naln"]),
                    done=jnp.where(fillc, done0.astype(I32), cr["done"]),
                    ovf=jnp.where(fillc, 0, cr["ovf"]),
                    hw=jnp.where(fillc, 0, cr["hw"]),
                    pend=jnp.where(fillc, 0, cr["pend"]),
                    pend_i=jnp.where(fillc, 0, cr["pend_i"]),
                    pend_k=jnp.where(fillc, 0, cr["pend_k"]),
                    pend_l=jnp.where(fillc, 0, cr["pend_l"]),
                    pend_cnt=jnp.where(fillc, 0, cr["pend_cnt"]),
                    pend_a=jnp.where(fillc, 0, cr["pend_a"]),
                    pend_ldp=jnp.where(fillc, 0, cr["pend_ldp"]),
                    fin=jnp.where(fillc, 0, cr["fin"]),
                    pend_iters=jnp.where(fillc, 0, cr["pend_iters"]),
                    itst=jnp.where(fillc, it, cr["itst"]))
                return nxt, nf, cursor2

            def body_u(carry):
                it, flushed, cursor = carry[0], carry[2], carry[3]
                cr = dict(zip(c_keys, carry[4:]))
                cr2, nf, cursor2 = sweep(it, cursor, cr)
                flushed2 = flushed + nf
                live2 = jnp.int32(B_total) - flushed2
                inner0 = (it, live2) + tuple(cr2[k] for k in c_keys)
                inner = jax.lax.cond(
                    live2 > 0,
                    lambda c: jax.lax.fori_loop(
                        0, UNROLL, lambda _, cc: body(cc), c),
                    lambda c: c, inner0)
                return (inner[0], inner[1], flushed2,
                        cursor2) + tuple(inner[2:])

            final = jax.lax.while_loop(
                cond, body_u,
                (jnp.int32(0), jnp.int32(B_total), jnp.int32(0),
                 jnp.int32(0)) + tuple(c0[k] for k in c_keys))
            return

        def body_u(carry):
            return jax.lax.fori_loop(0, UNROLL, lambda _, c: body(c),
                                     carry)

        it0 = jnp.int32(0)
        live0 = (done0 == 0).astype(I32).sum()
        final = jax.lax.while_loop(
            cond, body_u, (it0, live0) + tuple(c0[k] for k in c_keys))
        iters = final[0]
        fr = dict(zip(c_keys, final[2:]))
        for k in ("naln", "hw", "ovf", "fin", "pend_iters"):
            fr.setdefault(k, final[2])     # skel2 floor runs only

        # fix fin semantics: lanes done at init have fin 0; lanes done at
        # iteration t have fin=t (set in-loop)
        summ = jnp.zeros((BB, 8), I32)
        lane8 = _lane_iota((BB, 8))
        summ = jnp.where(lane8 == 0, fr["naln"], summ)
        summ = jnp.where(lane8 == 1, fr["hw"], summ)
        summ = jnp.where(lane8 == 2, fr["ovf"], summ)
        summ = jnp.where(lane8 == 3, fr["fin"], summ)
        summ = jnp.where(lane8 == 4, iters, summ)
        summ = jnp.where(lane8 == 5, fr["pend_iters"], summ)
        summ_ref[:] = summ

    return kernel


_STATICS = ("s_mm", "s_gapo", "s_gape", "max_gape", "max_gapo",
            "indel_end_skip", "max_del_occ", "max_entries", "max_top2",
            "max_seed_diff", "seed_len", "mode", "stack_cap", "hits_cap",
            "max_iters", "BB", "interpret", "mxu", "hbm", "refill",
            "fetch2", "unroll", "lobotomy")


@functools.partial(jax.jit, static_argnames=_STATICS)
def dfs_pallas_call(table, params, seqs, lengths, pw_w, pw_b, sw_w, sw_b,
                    has_seed, max_diff, *, s_mm, s_gapo, s_gape, max_gape,
                    max_gapo, indel_end_skip, max_del_occ, max_entries,
                    max_top2, max_seed_diff, seed_len, mode,
                    stack_cap=256, hits_cap=32, max_iters=200000,
                    BB=256, interpret=False, mxu=False, hbm=False,
                    refill=False, fetch2=False, unroll=16, lobotomy=()):
    """Run the pallas DFS.  Inputs:

    table: int32 [n_rows, 128] block16 table (build_table);
    params: int32 [1, 16]: l2[0..4], pad, primary_f, primary_r, seq_len,
        rev_row0 at the indices the kernel reads;
    seqs: int32 [B, 2, L<=128] (seq/rseq);
    pw_w/pw_b, sw_w/sw_b: int32 [B, 2, 128] width / bid main and seed
        planes (separate planes: widths need full 32 bits at genome
        scale);
    lengths, has_seed, max_diff: int32 [B].

    Returns packed [B, 4H+5] matching ops.dfs.dfs_match_gap."""
    B = seqs.shape[0]
    S = stack_cap
    H = hits_cap
    assert B % BB == 0, (B, BB)
    L = seqs.shape[2]

    assert not (mxu and hbm)
    if interpret and fetch2 >= 2:
        # the interpreter's semaphore model doesn't reproduce the
        # hardware's 32-byte-granule increments the bulk drain relies on
        fetch2 = 1
    kernel = make_kernel(
        BB=BB, S=S, H=H, L=L, s_mm=s_mm, s_gapo=s_gapo, s_gape=s_gape,
        max_gape=max_gape, max_gapo=max_gapo,
        indel_end_skip=indel_end_skip, max_del_occ=max_del_occ,
        max_entries=max_entries, max_top2=max_top2,
        max_seed_diff=max_seed_diff, seed_len=seed_len, mode=mode,
        max_iters=max_iters, mxu=mxu, hbm=hbm, refill=refill,
        fetch2=fetch2, B_total=B, unroll=unroll, lobotomy=lobotomy)

    if refill:
        # persistent-occupancy call: one grid step owns the whole batch;
        # per-read inputs/outputs stay in HBM and move by per-lane DMA at
        # the refill sweeps
        lane_meta = (
            jnp.zeros((B, LANES), I32)
            .at[:, 0].set(max_diff.reshape(B))
            .at[:, 1].set(lengths.reshape(B))
            .at[:, 2].set(has_seed.reshape(B).astype(I32)))
        any_spec = pl.BlockSpec(memory_space=pl.ANY)
        # widths padded to the 128-lane DMA tiling; sliced back below
        HW = -(-H // 128) * 128
        outs = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]  # params
            + [any_spec] * 12,            # 10 planes + meta + table
            out_specs=[any_spec] * 5,
            out_shape=[
                jax.ShapeDtypeStruct((B, HW), I32),
                jax.ShapeDtypeStruct((B, HW), I32),
                jax.ShapeDtypeStruct((B, HW), I32),
                jax.ShapeDtypeStruct((B, HW), I32),
                jax.ShapeDtypeStruct((B, 128), I32),
            ],
            scratch_shapes=[
                pltpu.VMEM((BB, S), I32),       # s_key
                pltpu.VMEM((BB, S), I32),       # s_meta
                pltpu.VMEM((BB, S), I32),       # s_k
                pltpu.VMEM((BB, S), I32),       # s_l
                pltpu.VMEM((2 * BB, 128), I32),  # stage
                pltpu.VMEM((BB, 128), I32),     # rowidx
                pltpu.VMEM((BB, 128), I32),     # pw0w (mutable planes)
                pltpu.VMEM((BB, 128), I32),     # pw0b
                pltpu.VMEM((BB, 128), I32),     # pw1w
                pltpu.VMEM((BB, 128), I32),     # pw1b
                pltpu.VMEM((BB, 128), I32),     # seqf_s
                pltpu.VMEM((BB, 128), I32),     # seqr_s
                pltpu.VMEM((BB, 128), I32),     # swwf_s
                pltpu.VMEM((BB, 128), I32),     # swwr_s
                pltpu.VMEM((BB, 128), I32),     # swbf_s
                pltpu.VMEM((BB, 128), I32),     # swbr_s
                pltpu.VMEM((BB, 128), I32),     # meta_s
                pltpu.VMEM((BB, HW), I32),      # hms
                pltpu.VMEM((BB, HW), I32),      # hks
                pltpu.VMEM((BB, HW), I32),      # hls
                pltpu.VMEM((BB, HW), I32),      # hss
                pltpu.VMEM((BB, 128), I32),     # summ_s
                pltpu.VMEM((BB, 128), I32),     # lanestat
                pltpu.VMEM((BB, 128), I32),     # fillflag
                pltpu.SMEM((2, LANES), I32),    # idx_smem (fetch mode 3)
                pltpu.SMEM((BB,), I32),         # cur_read
                pltpu.SemaphoreType.DMA(()),    # dma_sem (fetch)
                pltpu.SemaphoreType.DMA(()),    # sem_in
                pltpu.SemaphoreType.DMA(()),    # sem_out
            ],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(params,
          seqs[:, 0, :], seqs[:, 1, :],
          pw_w[:, 0, :], pw_w[:, 1, :],
          pw_b[:, 0, :], pw_b[:, 1, :],
          sw_w[:, 0, :], sw_w[:, 1, :],
          sw_b[:, 0, :], sw_b[:, 1, :],
          lane_meta, table)
        hmeta, hk, hl, hscore, summ = outs
        return jnp.concatenate([
            hmeta[:, :H], hk[:, :H], hl[:, :H], hscore[:, :H],
            summ[:, 0:1], summ[:, 1:2], summ[:, 2:3], summ[:, 3:4],
            summ[:, 4:5], summ[:, 5:6],
        ], axis=1)

    grid = (B // BB,)

    def bmap(i):
        return (i, 0)

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 16), lambda i: (0, 0)),           # params
            pl.BlockSpec((BB, 128), bmap),                     # seq fwd
            pl.BlockSpec((BB, 128), bmap),                     # seq rev
            pl.BlockSpec((BB, 128), bmap),                     # pw_w fwd
            pl.BlockSpec((BB, 128), bmap),                     # pw_w rev
            pl.BlockSpec((BB, 128), bmap),                     # pw_b fwd
            pl.BlockSpec((BB, 128), bmap),                     # pw_b rev
            pl.BlockSpec((BB, 128), bmap),                     # sw_w fwd
            pl.BlockSpec((BB, 128), bmap),                     # sw_w rev
            pl.BlockSpec((BB, 128), bmap),                     # sw_b fwd
            pl.BlockSpec((BB, 128), bmap),                     # sw_b rev
            pl.BlockSpec((BB, 1), bmap),                       # max_diff
            pl.BlockSpec((BB, 1), bmap),                       # lengths
            pl.BlockSpec((BB, 1), bmap),                       # has_seed
            # hbm: the table stays off-chip; block rows arrive by DMA
            pl.BlockSpec(memory_space=pl.ANY if hbm
                         else pltpu.VMEM),                     # table
        ],
        out_specs=[
            pl.BlockSpec((BB, H), bmap),
            pl.BlockSpec((BB, H), bmap),
            pl.BlockSpec((BB, H), bmap),
            pl.BlockSpec((BB, H), bmap),
            pl.BlockSpec((BB, 8), bmap),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H), I32),
            jax.ShapeDtypeStruct((B, H), I32),
            jax.ShapeDtypeStruct((B, H), I32),
            jax.ShapeDtypeStruct((B, H), I32),
            jax.ShapeDtypeStruct((B, 8), I32),
        ],
        scratch_shapes=[
            pltpu.VMEM((BB, S), I32),       # s_key
            pltpu.VMEM((BB, S), I32),       # s_meta
            pltpu.VMEM((BB, S), I32),       # s_k
            pltpu.VMEM((BB, S), I32),       # s_l
            # stage/rowidx are only used by the scalar-fetch path
            pltpu.VMEM((2 * BB if not mxu else 1, 128), I32),   # stage
            pltpu.VMEM((BB if not mxu else 1, 128), I32),       # rowidx
            pltpu.VMEM((BB, 128), I32),     # pw0w (mutable planes)
            pltpu.VMEM((BB, 128), I32),     # pw0b
            pltpu.VMEM((BB, 128), I32),     # pw1w
            pltpu.VMEM((BB, 128), I32),     # pw1b
        ] + ([pltpu.SMEM((2, LANES), I32),  # idx_smem (fetch mode 3)
              pltpu.SemaphoreType.DMA(())] if hbm else []),
        interpret=interpret,
    )(params,
      seqs[:, 0, :], seqs[:, 1, :],
      pw_w[:, 0, :], pw_w[:, 1, :],
      pw_b[:, 0, :], pw_b[:, 1, :],
      sw_w[:, 0, :], sw_w[:, 1, :],
      sw_b[:, 0, :], sw_b[:, 1, :],
      max_diff[:, None], lengths[:, None],
      has_seed[:, None].astype(I32), table)

    hmeta, hk, hl, hscore, summ = outs
    packed = jnp.concatenate([
        hmeta, hk, hl, hscore,
        summ[:, 0:1], summ[:, 1:2], summ[:, 2:3], summ[:, 3:4],
        summ[:, 4:5], summ[:, 5:6],
    ], axis=1)
    return packed


@functools.partial(jax.jit, static_argnames=_STATICS + ("rev_word_offset",))
def aln_device_step_pallas(table, params, bwt_fwd, bwt_rev, rev_word_offset,
                           primary_fwd, primary_rev, l2, seq_len, seqs,
                           lengths, seed_seqs, seed_lengths, has_seed,
                           max_diff, **statics):
    """cal_width (jnp scans) + plane packing + the pallas DFS, fused in
    one jit (the pallas counterpart of ops.dfs.aln_device_step)."""
    from .occ import cal_width

    w0, b0 = cal_width(bwt_fwd, l2, primary_fwd, seq_len,
                       seqs[:, 0, :], lengths)
    w1, b1 = cal_width(bwt_rev, l2, primary_rev, seq_len,
                       seqs[:, 1, :], lengths)
    sw0, sb0 = cal_width(bwt_fwd, l2, primary_fwd, seq_len,
                         seed_seqs[:, 0, :], seed_lengths)
    sw1, sb1 = cal_width(bwt_rev, l2, primary_rev, seq_len,
                         seed_seqs[:, 1, :], seed_lengths)

    pw_w = jnp.stack([_pf(w0.astype(I32)), _pf(w1.astype(I32))], axis=1)
    pw_b = jnp.stack([_pf(b0.astype(I32)), _pf(b1.astype(I32))], axis=1)
    sw_w = jnp.stack([_pf(sw0.astype(I32)), _pf(sw1.astype(I32))], axis=1)
    sw_b = jnp.stack([_pf(sb0.astype(I32)), _pf(sb1.astype(I32))], axis=1)
    seqs_p = _pf(seqs.astype(I32))
    return dfs_pallas_call(table, params, seqs_p, lengths.astype(I32),
                           pw_w, pw_b, sw_w, sw_b, has_seed,
                           max_diff.astype(I32), **statics)


def build_params(l2, primary_fwd, primary_rev, seq_len, rev_row0):
    p = np.zeros((1, 16), dtype=np.int32)
    p[0, 0:5] = np.asarray(l2[:5], dtype=np.int64).astype(np.int32)
    p[0, 5] = np.int64(primary_fwd)
    p[0, 6] = np.int64(primary_rev)
    p[0, 7] = np.int64(seq_len)
    p[0, 8] = rev_row0
    return p
