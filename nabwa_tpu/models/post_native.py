"""Columnar samse post-processing driven by the native batch kernels
(native/post.cpp): hit selection with the exact shared drand48 stream,
batched SA→coordinate walks, vectorized mapQ, native MD/NM and SAM
emission.  Byte-identical with models.samse.samse — the per-read object
pipeline remains as the fallback/oracle (and the color-space path).

The reference runs this per-record chain in C at ~128k reads/s on one
core (bwa_sai2sam_se_core, bwase.c:654-721); per-read Python capped ours
at ~11k.  All per-read work here is three native calls plus O(gapped)
Python for the rare refinement/trim fix-ups.
"""

import numpy as np

from ..constants import BWA_TYPE_NO_MATCH, BWA_AVG_ERR
from ..index import native as native_mod
from ..io import fastq as fq
from ..refmodel.aln_scalar import cal_maxdiff
from . import samse as se

NF = 17
(F_TYPE, F_STRAND, F_POS, F_MAPQ, F_SEQ_Q, F_C1, F_C2, F_NMM, F_NGO,
 F_NGE, F_NM, F_LEN, F_FULL_LEN, F_CLIP_LEN, F_XFLAG, F_SA,
 F_SCORE) = range(NF)

_NEG1 = 0xFFFFFFFF


def _bns_emit_arrays(bns):
    """Cached flat bns arrays for the native emitter."""
    arr = getattr(bns, "_np_emit", None)
    if arr is None:
        ann_off, amb_off, _ = se._bns_arrays(bns)
        ann_len = np.array([a.length for a in bns.anns], dtype=np.int64)
        names = [a.name.encode() for a in bns.anns]
        ann_names = b"".join(names)
        ann_name_off = np.zeros(len(names) + 1, dtype=np.int64)
        np.cumsum([len(x) for x in names], out=ann_name_off[1:])
        amb_len = np.array([h.length for h in bns.ambs], dtype=np.int32)
        amb_chr = np.frombuffer(
            b"".join(h.amb.encode() for h in bns.ambs), dtype=np.uint8) \
            if bns.ambs else np.zeros(0, dtype=np.uint8)
        arr = (np.ascontiguousarray(ann_off), ann_len,
               np.frombuffer(ann_names, dtype=np.uint8)
               if ann_names else np.zeros(0, dtype=np.uint8),
               ann_name_off, np.ascontiguousarray(amb_off), amb_len,
               amb_chr)
        try:
            bns._np_emit = arr
        except AttributeError:
            pass
    return arr


def _post_threads():
    """Thread fan-out for the emit/MD native kernels (0 = hardware
    concurrency; the C++ side self-caps on small batches so scheduler
    threads calling in parallel don't oversubscribe)."""
    import os as _os
    v = _os.environ.get("NABWA_POST_THREADS")
    return int(v) if v else 0


def _flat(chunks):
    """list of bytes/arrays -> (flat uint8 array, int64 offsets)."""
    off = np.zeros(len(chunks) + 1, dtype=np.int64)
    np.cumsum([len(c) for c in chunks], out=off[1:])
    total = int(off[-1])
    if not total:
        return np.zeros(0, dtype=np.uint8), off
    # bytes-only lists concatenate at C speed; one slow-path copy loop
    # otherwise (mixed arrays) — the per-chunk Python loop was ~20% of
    # sampe emit time at 100k pairs
    if isinstance(chunks[0], (bytes, bytearray)):
        try:
            flat = np.frombuffer(b"".join(chunks), dtype=np.uint8)
            assert len(flat) == total
            return flat, off
        except TypeError:
            pass
    elif isinstance(chunks[0], np.ndarray):
        try:
            flat = np.concatenate(chunks).astype(np.uint8, copy=False)
            assert len(flat) == total
            return np.ascontiguousarray(flat), off
        except (TypeError, ValueError):
            pass
    flat = np.empty(total, dtype=np.uint8)
    pos = 0
    for c in chunks:
        n = len(c)
        if n:
            flat[pos:pos + n] = np.frombuffer(c, dtype=np.uint8) \
                if isinstance(c, (bytes, bytearray)) else c
            pos += n
    return flat, off


def _interleave_flats(f0, o0, f1, o1):
    """Two (flat, off) columns -> one with rows alternating 0,1,0,1...
    (the sampe emit order) via the threaded native ragged gather."""
    n = len(o0) - 1
    lens = np.empty(2 * n, dtype=np.int64)
    lens[0::2] = o0[1:] - o0[:-1]
    lens[1::2] = o1[1:] - o1[:-1]
    off = np.zeros(2 * n + 1, dtype=np.int64)
    np.cumsum(lens, out=off[1:])
    total = int(off[-1])
    if not total:
        return np.zeros(0, dtype=np.uint8), off
    comb = np.concatenate([np.asarray(f0, dtype=np.uint8),
                           np.asarray(f1, dtype=np.uint8)])
    base = np.empty(2 * n, dtype=np.int64)
    base[0::2] = o0[:-1]
    base[1::2] = len(f0) + o1[:-1]
    out = np.empty(total, dtype=np.uint8)
    native_mod._load().gather_rows_u8(
        comb, base, lens, np.zeros(2 * n, dtype=np.uint8), 2 * n,
        out, off, 0)
    return out, off


def _pack_recs(per_read_alns):
    """per-read aln tuple lists -> (flat u32 record words, i32 counts)."""
    counts = np.array([len(a) for a in per_read_alns], dtype=np.int32)
    flat = [h for alns in per_read_alns for h in alns]
    recs = np.zeros((len(flat), 4), dtype=np.uint32)
    if flat:
        cols = np.array(flat, dtype=np.int64).T
        recs[:, 0] = ((cols[0] & 0xFF) | ((cols[1] & 0xFF) << 8)
                      | ((cols[2] & 0xFF) << 16)
                      | ((cols[3] & 1) << 24)).astype(np.uint32)
        recs[:, 1] = cols[4].astype(np.uint32)
        recs[:, 2] = cols[5].astype(np.uint32)
        recs[:, 3] = cols[6].astype(np.uint32)
    return np.ascontiguousarray(recs.reshape(-1)), counts


_MAXDIFF_CACHE = {}


def _maxdiff_for(lens, fnr, max_mm):
    if fnr <= 0.0:
        return np.full(len(lens), max_mm, dtype=np.int64)
    out = np.empty(len(lens), dtype=np.int64)
    for i, l in enumerate(lens.tolist()):
        v = _MAXDIFF_CACHE.get((l, fnr))
        if v is None:
            v = cal_maxdiff(l, BWA_AVG_ERR, fnr)
            _MAXDIFF_CACHE[(l, fnr)] = v
        out[i] = v
    return out


def md_states(states, bns, pac):
    """Native MD/NM for a list of SeqState objects (the refine_gapped MD
    stage, bwa_cal_md1 bwase.c:253-315).  Returns True when handled, False
    to fall back to the Python path."""
    lib = native_mod._load()
    if lib is None:
        return False
    n = len(states)
    if n == 0:
        return True
    state = np.zeros((n, NF), dtype=np.int64)
    state[:, F_TYPE] = [s.type for s in states]
    state[:, F_POS] = [s.pos for s in states]
    seq_chunks = []
    empty = np.zeros(0, dtype=np.uint8)
    for s in states:
        if s.type == BWA_TYPE_NO_MATCH:
            seq_chunks.append(empty)
        else:
            r = s.read
            seq_chunks.append(r.rseq if s.strand else r.seq[::-1])
    seq_flat, seq_off = _flat(seq_chunks)
    cig_counts = np.zeros(n, dtype=np.int64)
    for i, s in enumerate(states):
        if s.cigar:
            cig_counts[i] = 2 * len(s.cigar)
    cig_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(cig_counts, out=cig_off[1:])
    cig = np.zeros(int(cig_off[-1]), dtype=np.int32)
    for i, s in enumerate(states):
        if s.cigar:
            cig[cig_off[i]:cig_off[i + 1]] = \
                np.array(s.cigar, dtype=np.int32).reshape(-1)
    _, _, _, _, amb_off, amb_len, amb_chr = _bns_emit_arrays(bns)
    md_cap = int(seq_off[-1]) * 2 + 24 * n + 16
    md_buf = np.empty(md_cap, dtype=np.uint8)
    md_off = np.zeros(n + 1, dtype=np.int64)
    rc = lib.md_batch(n, state.reshape(-1), seq_flat, seq_off, cig,
                      cig_off, np.ascontiguousarray(pac, dtype=np.uint8),
                      bns.l_pac, len(bns.ambs), amb_off, amb_len, amb_chr,
                      md_buf, md_cap, md_off, _post_threads())
    if rc != 0:
        return False
    text = md_buf[:int(md_off[-1])].tobytes().decode("latin1")
    offs = md_off.tolist()
    nms = state[:, F_NM].tolist()
    for i, s in enumerate(states):
        if s.type != BWA_TYPE_NO_MATCH:
            s.md = text[offs[i]:offs[i + 1]]
            s.nm = nms[i]
    return True


def emit_states(bns, states, mate_idx, mode, max_top2, rg_id=None):
    """Native SAM emission for a list of SeqState objects in print order
    (bwa_print_sam1, bwase.c:458-592).  mate_idx[i] = batch row of the
    mate or -1.  Returns bytes (newline-terminated lines) or None."""
    lib = native_mod._load()
    if lib is None:
        return None
    n = len(states)
    if n == 0:
        return b""
    # ONE pass over the state objects: 15 separate column comprehensions
    # cost ~3M attribute reads at 100k pairs (measured 1.5 s)
    rows = [(s.type, s.strand, s.pos, s.mapQ, s.seQ, s.c1, s.c2,
             s.n_mm, s.n_gapo, s.n_gape, s.nm, s.len,
             s.read.full_len, s.read.clip_len, s.extra_flag, 0, 0)
            for s in states]
    state = np.array(rows, dtype=np.int64)
    assert state.shape == (n, NF)

    names = [s.read.name.encode() for s in states]
    name_flat, name_off = _flat(names)
    bcs = [s.read.bc.encode() if s.read.bc else b"" for s in states]
    bc_flat, bc_off = _flat(bcs)
    sf_flat, sf_off = _flat([s.read.full_codes for s in states])
    q_flat, q_off = _flat([(s.read.qual.tobytes()
                            if s.read.qual is not None else b"")
                           for s in states])
    mds = [s.md.encode() if s.md else b"" for s in states]
    md_flat, md_off = _flat(mds)

    stride = max((len(s.multi) for s in states), default=0) + 1
    multi_pos = np.zeros(n * stride, dtype=np.uint64)
    multi_gap = np.zeros(n * stride, dtype=np.int32)
    multi_mm = np.zeros(n * stride, dtype=np.int32)
    multi_strand = np.zeros(n * stride, dtype=np.int32)
    multi_n = np.zeros(n, dtype=np.int32)
    mcig = {}
    for i, s in enumerate(states):
        if not s.multi:
            continue
        multi_n[i] = len(s.multi)
        for m, mu in enumerate(s.multi):
            o = i * stride + m
            multi_pos[o] = mu["pos"]
            multi_gap[o] = mu["gap"]
            multi_mm[o] = mu["mm"]
            multi_strand[o] = mu["strand"]
            if mu.get("cigar"):
                mcig[o] = mu["cigar"]

    cig_counts = np.zeros(n, dtype=np.int64)
    for i, s in enumerate(states):
        if s.cigar:
            cig_counts[i] = 2 * len(s.cigar)
    mcig_counts = np.zeros(n * stride, dtype=np.int64)
    for o, cg in mcig.items():
        mcig_counts[o] = 2 * len(cg)
    roff = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(cig_counts, out=roff[1:])
    moff = np.zeros(n * stride + 1, dtype=np.int64)
    np.cumsum(mcig_counts, out=moff[1:])
    moff += roff[-1]
    cig = np.zeros(int(moff[-1]), dtype=np.int32)
    for i, s in enumerate(states):
        if s.cigar:
            cig[roff[i]:roff[i + 1]] = \
                np.array(s.cigar, dtype=np.int32).reshape(-1)
    for o, cg in mcig.items():
        cig[moff[o]:moff[o + 1]] = \
            np.array(cg, dtype=np.int32).reshape(-1)
    cig_off_full = np.concatenate([roff, moff])

    ann_off, ann_len, ann_names, ann_name_off, amb_off, amb_len, \
        amb_chr = _bns_emit_arrays(bns)
    rg = rg_id.encode() if rg_id else b""
    rg_arr = np.frombuffer(rg, dtype=np.uint8) if rg else \
        np.zeros(0, dtype=np.uint8)
    mate_idx = np.ascontiguousarray(mate_idx, dtype=np.int64)
    cap = int(sf_off[-1]) * 3 + int(md_off[-1]) + 256 * n + 1024
    out = np.empty(cap, dtype=np.uint8)
    args = (n, state.reshape(-1), mate_idx,
            name_flat, name_off, bc_flat, bc_off,
            cig, cig_off_full, md_flat, md_off,
            sf_flat, sf_off, q_flat, q_off,
            multi_pos, multi_gap, multi_mm, multi_strand, multi_n, stride,
            bns.n_seqs, ann_off, ann_len, ann_names, ann_name_off,
            len(bns.ambs), amb_off, amb_len, amb_chr, bns.l_pac,
            mode, max_top2, rg_arr, len(rg))
    total = lib.sam_emit_batch(*args, out, cap, _post_threads())
    if total > cap:
        out = np.empty(int(total), dtype=np.uint8)
        total = lib.sam_emit_batch(*args, out, int(total), _post_threads())
    return out[:total].tobytes()


def build_pair_keys(engine, state, recs, counts, hit_off, n_pairs,
                    max_occ, pos_memo):
    """Vectorized pairing-candidate assembly (bwape.c:368-396 semantics
    incl. the wide-interval memo): gate each pair (both ends matched,
    n_occ within max_occ), expand every hit's SA interval to genome
    positions through batched sa_rows calls, and pack the per-pair
    sorted-later key arrays (pos<<32 | ki<<1 | j) for pe_pairing_batch.

    state: int64 [R, NF] with rows [0, 2*n_pairs) interleaved ends;
    recs/counts/hit_off: the _pack_recs layout over all R rows (hits of
    rows >= 2*n_pairs are ignored).  Returns (flat_keys, key_off); an
    empty segment means the pair skipped its gates."""
    from . import sampe as pe
    n = n_pairs
    n2 = 2 * n
    matched = state[:n2, F_TYPE] != BWA_TYPE_NO_MATCH
    lens = state[:, F_LEN]
    rev_len = engine.index.rev.seq_len
    nh2 = int(hit_off[n2])          # hits belonging to paired rows
    hk = recs[1:4 * nh2:4].astype(np.int64)
    hl = recs[2:4 * nh2:4].astype(np.int64)
    hw = hl - hk + 1
    hit_row = np.repeat(np.arange(n2, dtype=np.int64), counts[:n2])
    cs_w = np.zeros(nh2 + 1, dtype=np.int64)
    np.cumsum(hw, out=cs_w[1:])
    n_occ_read = cs_w[hit_off[1:n2 + 1]] - cs_w[hit_off[:n2]]
    pair_ok = (matched[0::2] & matched[1::2]
               & (n_occ_read[0::2] <= max_occ)
               & (n_occ_read[1::2] <= max_occ))
    hsel = pair_ok[hit_row >> 1]
    sk = hk[hsel]
    sw = hw[hsel]
    srow = hit_row[hsel]
    sstrand = ((recs[0:4 * nh2:4][hsel].astype(np.int64) >> 24) & 1)
    ski = (np.arange(nh2, dtype=np.int64)
           - hit_off[:n2][hit_row])[hsel]
    stag = (ski << 1) | (srow & 1)
    slen = lens[srow]
    spair = srow >> 1
    wide = sw >= pe.MIN_HASH_WIDTH

    # expansion jobs: direct hits in order + first-seen wide intervals
    d_k, d_w, d_strand, d_len = sk[~wide], sw[~wide], sstrand[~wide], \
        slen[~wide]
    wide_jobs = []          # (key, k, w, strand, len) first-seen wides
    wide_hits = []          # (pair, tag, key) every selected wide hit
    if wide.any():
        for kk, ww, st_, ln_, pr, tg in zip(
                sk[wide].tolist(), sw[wide].tolist(),
                sstrand[wide].tolist(), slen[wide].tolist(),
                spair[wide].tolist(), stag[wide].tolist()):
            key = (kk, kk + ww - 1)
            if key not in pos_memo:
                pos_memo[key] = ("pending", len(wide_jobs))
                wide_jobs.append((key, kk, ww, st_, ln_))
            wide_hits.append((pr, tg, key))
    j_k = np.concatenate([d_k, np.array([t[1] for t in wide_jobs],
                                        dtype=np.int64)])
    j_w = np.concatenate([d_w, np.array([t[2] for t in wide_jobs],
                                        dtype=np.int64)])
    j_strand = np.concatenate([d_strand,
                               np.array([t[3] for t in wide_jobs],
                                        dtype=np.int64)])
    j_len = np.concatenate([d_len, np.array([t[4] for t in wide_jobs],
                                            dtype=np.int64)])
    cw = np.zeros(len(j_w) + 1, dtype=np.int64)
    np.cumsum(j_w, out=cw[1:])
    tot = int(cw[-1])
    expanded = np.zeros(tot, dtype=np.uint64)
    if tot:
        rows_sa = (np.repeat(j_k, j_w)
                   + (np.arange(tot, dtype=np.int64)
                      - np.repeat(cw[:-1], j_w)))
        jstr = np.repeat(j_strand, j_w) != 0
        jlen = np.repeat(j_len, j_w)
        for a in (1, 0):
            jsel = jstr if a else ~jstr
            if not jsel.any():
                continue
            vals = engine.sa_rows(a, rows_sa[jsel].astype(np.uint32)) \
                .astype(np.int64)
            if a:
                expanded[jsel] = vals.astype(np.uint64)
            else:
                expanded[jsel] = ((rev_len - (vals + jlen[jsel]))
                                  & _NEG1).astype(np.uint64)
    n_dir = len(d_k)
    dir_base = int(cw[n_dir])      # direct expansions occupy [0, dir_base)
    for wj, (key, kk, ww, _s, _l) in enumerate(wide_jobs):
        o = int(cw[n_dir + wj])
        pos_memo[key] = expanded[o:o + ww].copy()

    # per-pair key assembly: direct block then wide block
    dir_cnt = np.bincount(spair[~wide], weights=sw[~wide],
                          minlength=n).astype(np.int64) if n_dir else \
        np.zeros(n, dtype=np.int64)
    wide_cnt = np.zeros(n, dtype=np.int64)
    for pr, tg, key in wide_hits:
        wide_cnt[pr] += len(pos_memo[key])
    key_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(dir_cnt + wide_cnt, out=key_off[1:])
    flat_keys = np.zeros(int(key_off[-1]), dtype=np.uint64)
    if n_dir:
        elem_pair = np.repeat(spair[~wide], d_w)
        dstart = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(dir_cnt, out=dstart[1:])
        slots = key_off[:-1][elem_pair] + (
            np.arange(dir_base, dtype=np.int64) - dstart[:-1][elem_pair])
        flat_keys[slots] = ((expanded[:dir_base] << np.uint64(32))
                            | np.repeat(stag[~wide], d_w)
                            .astype(np.uint64))
    if wide_hits:
        cursor = (key_off[:-1] + dir_cnt).copy()
        for pr, tg, key in wide_hits:
            posv = pos_memo[key]
            m = len(posv)
            flat_keys[cursor[pr]:cursor[pr] + m] = \
                (posv.astype(np.uint64) << np.uint64(32)) | np.uint64(tg)
            cursor[pr] += m
    return flat_keys, key_off


def sampe_bytes(engine, reads, per_read_alns, gopt, popt, rng, rg_id=None,
                last_ii=None, pos_memo=None, ntpac=None):
    """Columnar native sampe for one chunk (bwa_sai2sam_pe_core,
    bwape.c:660-762): SE selection + pairing + multi enumeration run in
    native batch kernels over a [2n, NF] interleaved state matrix; mate
    rescue stays on the existing device-batched SW generators via thin
    per-candidate proxies.  Returns (sam_bytes, ii) or None to fall back
    to the per-object pipeline (models.sampe.sampe).

    Byte-identical with the object pipeline: the drand48 stream, pairing
    sweep, rescue decisions and emit text all follow the same call order.
    """
    lib = native_mod._load()
    if lib is None or ntpac is not None or not reads[0]:
        return None
    from ..constants import (BWA_PET_STD, BWA_PET_SOLID, SAM_FPD, SAM_FR1,
                             SAM_FR2, SAM_FPP, BWA_TYPE_MATESW)
    from . import sampe as pe
    if popt.type not in (BWA_PET_STD, BWA_PET_SOLID):
        return None
    bns = engine.index.bns
    pac = engine.index.pac
    if pos_memo is None:
        pos_memo = {}

    n = len(reads[0])
    assert len(reads[1]) == n
    n2 = 2 * n
    # interleaved rows: 2i = end 0, 2i+1 = end 1 (the emit order)
    colsrc = None
    if isinstance(reads[0], fq.ReadBatch) \
            and isinstance(reads[1], fq.ReadBatch):
        colsrc = reads
        class _LazyFlat:
            # rescue proxies / refine jobs touch a handful of rows
            def __getitem__(self, row):
                return colsrc[row & 1][row >> 1]
        reads_flat = _LazyFlat()
    else:
        reads_flat = [reads[j][i] for i in range(n) for j in (0, 1)]
    from ..io import sai as sai_mod
    aln_cols = (isinstance(per_read_alns[0], sai_mod.AlnColumn)
                and isinstance(per_read_alns[1], sai_mod.AlnColumn))
    alns_flat = None if aln_cols else \
        [per_read_alns[j][i] for i in range(n) for j in (0, 1)]

    state = np.zeros((n2, NF), dtype=np.int64)
    lens = np.empty(n2, dtype=np.int64)
    if colsrc is not None:
        lens[0::2] = colsrc[0].clip_lens()
        lens[1::2] = colsrc[1].clip_lens()
        state[:, F_LEN] = lens
        state[0::2, F_FULL_LEN] = colsrc[0].full_lens()
        state[1::2, F_FULL_LEN] = colsrc[1].full_lens()
        state[:, F_CLIP_LEN] = lens
    else:
        lens[:] = [r.len for r in reads_flat]
        state[:, F_LEN] = lens
        state[:, F_FULL_LEN] = [r.full_len for r in reads_flat]
        state[:, F_CLIP_LEN] = [r.clip_len for r in reads_flat]
    xflag = np.full(n2, SAM_FPD | SAM_FR2, dtype=np.int64)
    xflag[0::2] = SAM_FPD | SAM_FR1
    state[:, F_XFLAG] = xflag

    # --- SE phase (bwape.c:316-338): exact drand48 stream, j inner ---
    if aln_cols:
        # raw .sai record words ARE the kernel layout: interleave the two
        # ends' byte columns with one native gather, no tuples
        r0, c0 = per_read_alns[0].columns()
        r1, c1 = per_read_alns[1].columns()
        counts = np.empty(n2, dtype=np.int32)
        counts[0::2] = c0
        counts[1::2] = c1
        o0 = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(c0.astype(np.int64) * 16, out=o0[1:])
        o1 = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(c1.astype(np.int64) * 16, out=o1[1:])
        rb, _ = _interleave_flats(r0.view(np.uint8), o0,
                                  r1.view(np.uint8), o1)
        recs = np.ascontiguousarray(rb).view(np.uint32) if len(rb) \
            else np.zeros(0, dtype=np.uint32)
    else:
        recs, counts = _pack_recs(alns_flat)
    hit_off = np.zeros(n2 + 1, dtype=np.int64)
    np.cumsum(counts, out=hit_off[1:])
    dummy_u64 = np.zeros(n2, dtype=np.uint64)
    dummy_i32 = np.zeros(n2, dtype=np.int32)
    multi_n0 = np.zeros(n2, dtype=np.int32)
    rngst = np.array([rng.x], dtype=np.uint64)
    lib.se_select_batch(n2, recs, counts, state.reshape(-1), rngst, 1,
                        0, dummy_u64, dummy_i32, dummy_i32, dummy_i32,
                        multi_n0)
    rng.x = int(rngst[0])

    # --- positions + mapQ (bwape.c:330-338) ---
    matched = state[:, F_TYPE] != BWA_TYPE_NO_MATCH
    strand = state[:, F_STRAND] != 0
    rev_len = engine.index.rev.seq_len
    for a in (1, 0):
        sel = matched & (strand if a else ~strand)
        if not sel.any():
            continue
        vals = engine.sa_rows(a, state[sel, F_SA].astype(np.uint32)) \
            .astype(np.int64)
        if a:
            state[sel, F_POS] = vals
        else:
            state[sel, F_POS] = (rev_len - (vals + lens[sel])) & _NEG1
    md_arr = _maxdiff_for(lens, gopt.fnr, gopt.max_diff)
    c1 = state[:, F_C1]
    c2 = state[:, F_C2]
    g = se.G_LOG_N[np.minimum(c2, 255)]
    mq = np.where(c1 == 0, 23,
                  np.where(c1 > 1, 0,
                           np.where(state[:, F_NMM] == md_arr, 25,
                                    np.where(c2 == 0, 37,
                                             np.where(23 < g, 0, 23 - g)))))
    state[matched, F_MAPQ] = mq[matched]
    state[matched, F_SEQ_Q] = mq[matched]

    # --- infer isize (bwape.c:341-346) ---
    p0 = state[0::2]
    p1 = state[1::2]
    good = (p0[:, F_MAPQ] >= 20) & (p1[:, F_MAPQ] >= 20)
    x_lo = p1[:, F_POS] + p1[:, F_LEN] - p0[:, F_POS]
    x_hi = p0[:, F_POS] + p0[:, F_LEN] - p1[:, F_POS]
    x = np.where(p0[:, F_POS] < p1[:, F_POS], x_lo, x_hi)
    isizes = x[good & (x < 100000)]
    max_len = int(lens.max(initial=1))
    ii, _ret = pe.infer_isize_core(isizes, max_len, popt.ap_prior,
                                   engine.index.fwd.seq_len)
    if ii.avg < 0.0 and last_ii is not None and last_ii.avg > 0.0:
        ii = last_ii
    if popt.force_isize:
        ii.low = ii.high = 0
        ii.avg = ii.std = -1.0

    # --- pairing (bwape.c:349-398): vectorized interval expansion with
    # the wide-interval memo, then the native per-pair sweep ---
    flat_keys, key_off = build_pair_keys(engine, state, recs, counts,
                                         hit_off, n, popt.max_occ,
                                         pos_memo)
    pet = 0 if popt.type == BWA_PET_STD else 1
    lib.pe_pairing_batch(
        n, flat_keys, key_off, recs, 4 * hit_off, state.reshape(-1),
        pet, popt.max_isize, gopt.s_mm,
        np.full(n, ii.high, dtype=np.int64),
        np.full(n, ii.high_bayesian, dtype=np.int64),
        np.full(n, float(ii.avg), dtype=np.float64),
        np.full(n, float(ii.std), dtype=np.float64))

    # --- multi hits (bwape.c:400-413) ---
    stride = 1
    multi_pos = np.zeros(n2, dtype=np.uint64)
    multi_gap = np.zeros(n2, dtype=np.int32)
    multi_mm = np.zeros(n2, dtype=np.int32)
    multi_strand = np.zeros(n2, dtype=np.int32)
    multi_n = np.zeros(n2, dtype=np.int32)
    if popt.N_multi or popt.n_multi:
        typ = state[:, F_TYPE]
        mate_typ = typ.reshape(n, 2)[:, ::-1].reshape(-1)
        fpp = (state[:, F_XFLAG] & SAM_FPP) != 0
        cond = (~fpp) & (mate_typ != BWA_TYPE_NO_MATCH)
        nm = np.where(cond,
                      np.where(state[:, F_C1] + state[:, F_C2] - 1
                               > popt.N_multi, popt.n_multi, popt.N_multi),
                      popt.n_multi)
        nm = np.where(typ != BWA_TYPE_NO_MATCH, nm, 0).astype(np.int32)
        stride = int(max(popt.n_multi, popt.N_multi)) + 1
        multi_pos = np.zeros(n2 * stride, dtype=np.uint64)
        multi_gap = np.zeros(n2 * stride, dtype=np.int32)
        multi_mm = np.zeros(n2 * stride, dtype=np.int32)
        multi_strand = np.zeros(n2 * stride, dtype=np.int32)
        lib.se_multi_batch(n2, recs, counts, state.reshape(-1), nm,
                           stride, multi_pos, multi_gap, multi_mm,
                           multi_strand, multi_n)

    # multi SA rows -> positions (bwape.c:407-410)
    mrows = np.nonzero(multi_n)[0]
    mslot, mlen = [], []
    for i in mrows.tolist():
        for m in range(multi_n[i]):
            mslot.append(i * stride + m)
            mlen.append(lens[i])
    mslot = np.array(mslot, dtype=np.int64)
    mlen = np.array(mlen, dtype=np.int64)
    if len(mslot):
        m_strand = multi_strand[mslot] != 0
        for a in (1, 0):
            msel = m_strand if a else ~m_strand
            if not msel.any():
                continue
            vals = engine.sa_rows(
                a, multi_pos[mslot[msel]].astype(np.uint32)) \
                .astype(np.int64)
            if a:
                multi_pos[mslot[msel]] = vals.astype(np.uint64)
            else:
                multi_pos[mslot[msel]] = \
                    ((rev_len - (vals + mlen[msel])) & _NEG1) \
                    .astype(np.uint64)

    # --- mate rescue (bwa_paired_sw, bwape.c:635-658): proxies for the
    # candidate pairs only, existing device-batched SW generators ---
    cigars = {}
    counters = {"n_tot": [0, 0], "n_mapped": [0, 0]}
    if popt.is_sw and ii.avg >= 0.0:
        mq_pair = np.maximum(p0[:, F_MAPQ], p1[:, F_MAPQ])
        cand = np.nonzero((mq_pair >= pe.SW_MIN_MAPQ)
                          & ((p0[:, F_XFLAG] & SAM_FPP) == 0))[0]
        if len(cand):
            prox_pairs = []
            for i in cand.tolist():
                pp = []
                for row in (2 * i, 2 * i + 1):
                    s = se.SeqState(reads_flat[row])
                    st = state[row]
                    s.type = int(st[F_TYPE])
                    s.strand = int(st[F_STRAND])
                    s.pos = int(st[F_POS])
                    s.mapQ = int(st[F_MAPQ])
                    s.seQ = int(st[F_SEQ_Q])
                    s.n_mm = int(st[F_NMM])
                    s.n_gapo = int(st[F_NGO])
                    s.n_gape = int(st[F_NGE])
                    s.extra_flag = int(st[F_XFLAG])
                    s.len = int(st[F_LEN])
                    pp.append(s)
                prox_pairs.append((i, pp))
            pe.paired_sw_batch(bns, pac, [pp for _, pp in prox_pairs],
                               popt, ii, counters)
            for i, pp in prox_pairs:
                for j, s in enumerate(pp):
                    row = 2 * i + j
                    st = state[row]
                    st[F_TYPE] = s.type
                    st[F_STRAND] = s.strand
                    st[F_POS] = s.pos
                    st[F_MAPQ] = s.mapQ
                    st[F_SEQ_Q] = s.seQ
                    st[F_NMM] = s.n_mm
                    st[F_NGO] = s.n_gapo
                    st[F_NGE] = s.n_gape
                    st[F_XFLAG] = s.extra_flag
                    if s.cigar:
                        cigars[row] = s.cigar

    # --- gapped refinement (bwa_refine_gapped, bwape.c:725-726) ---
    mcigars = {}
    jobs = []
    fwd_cache = {}
    strand = state[:, F_STRAND] != 0       # pairing/rescue moved strands

    def fwd_codes(i):
        c = fwd_cache.get(i)
        if c is None:
            c = reads_flat[i].seq[::-1]
            fwd_cache[i] = c
        return c

    for o in mslot.tolist():
        if multi_gap[o] == 0:
            continue
        i = o // stride
        seqc = reads_flat[i].rseq if multi_strand[o] else fwd_codes(i)

        def apply_m(cig, newpos, o=o):
            mcigars[o] = cig
            multi_pos[o] = newpos

        jobs.append((apply_m, seqc, int(multi_pos[o]),
                     (1 if multi_strand[o] else -1) * int(multi_gap[o])))
    typ = state[:, F_TYPE]
    gap_rows = np.nonzero((typ != BWA_TYPE_NO_MATCH)
                          & (typ != BWA_TYPE_MATESW)
                          & (state[:, F_NGO] > 0))[0]
    for i in gap_rows.tolist():
        seqc = reads_flat[i].rseq if strand[i] else fwd_codes(i)

        def apply_s(cig, newpos, i=i):
            cigars[i] = cig if cig else None
            state[i, F_POS] = newpos

        jobs.append((apply_s, seqc, int(state[i, F_POS]),
                     (1 if strand[i] else -1)
                     * int(state[i, F_NGO] + state[i, F_NGE])))
    se._refine_jobs(jobs, pac, bns.l_pac, use_device=True)

    # --- MD/NM ---
    if colsrc is not None:
        f0, o0 = colsrc[0].aligned_codes(strand[0::2])
        f1, o1 = colsrc[1].aligned_codes(strand[1::2])
        seq_flat, seq_off = _interleave_flats(f0, o0, f1, o1)
    else:
        seq_chunks = [(reads_flat[i].rseq if strand[i] else fwd_codes(i))
                      for i in range(n2)]
        seq_flat, seq_off = _flat(seq_chunks)
    cig_counts = np.zeros(n2, dtype=np.int64)
    for i, cg in cigars.items():
        if cg:
            cig_counts[i] = 2 * len(cg)
    cig_off = np.zeros(n2 + 1, dtype=np.int64)
    np.cumsum(cig_counts, out=cig_off[1:])
    cig = np.zeros(int(cig_off[-1]), dtype=np.int32)
    for i, cg in cigars.items():
        if cg:
            cig[cig_off[i]:cig_off[i + 1]] = \
                np.array(cg, dtype=np.int32).reshape(-1)
    _, _, _, _, amb_off, amb_len, amb_chr = _bns_emit_arrays(bns)
    md_cap = int(seq_off[-1]) * 2 + 24 * n2 + 16
    md_buf = np.empty(md_cap, dtype=np.uint8)
    md_off = np.zeros(n2 + 1, dtype=np.int64)
    rc = lib.md_batch(n2, state.reshape(-1), seq_flat, seq_off, cig,
                      cig_off, pac, bns.l_pac, len(bns.ambs),
                      amb_off, amb_len, amb_chr, md_buf, md_cap, md_off,
                      _post_threads())
    if rc != 0:
        # the drand48 stream and pos_memo advanced already — falling back
        # here would double-consume them
        raise RuntimeError("sampe_bytes: md_batch failed mid-pipeline")

    # --- quality-trim cigar correction (bwase.c:320-354; applied to
    # every read, the len restore matters for unmapped SEQ output) ---
    trimmed = np.nonzero(lens < state[:, F_FULL_LEN])[0]
    for i in trimmed.tolist():
        s = se.SeqState(reads_flat[i])
        s.strand = int(state[i, F_STRAND])
        s.cigar = list(cigars[i]) if cigars.get(i) else None
        s.len = int(state[i, F_LEN])
        se.correct_trimmed(s)
        cigars[i] = s.cigar
        state[i, F_LEN] = s.len

    # --- native SAM emission, interleaved with mate rows ---
    if colsrc is not None:
        # columnar batches carry no barcodes (the loader falls back to
        # the object reader in barcode mode), so the bc concat quirk
        # (bwape.c:731-740) has nothing to do
        name_flat, name_off = _interleave_flats(*colsrc[0].name_bytes(),
                                                *colsrc[1].name_bytes())
        bc_flat = np.zeros(0, dtype=np.uint8)
        bc_off = np.zeros(n2 + 1, dtype=np.int64)
        sf_flat, sf_off = _interleave_flats(*colsrc[0].code_bytes(),
                                            *colsrc[1].code_bytes())
        q_flat, q_off = _interleave_flats(*colsrc[0].qual_bytes(),
                                          *colsrc[1].qual_bytes())
    else:
        # bc concat quirk (bwape.c:731-740)
        bcs = [r.bc.encode() if r.bc else b"" for r in reads_flat]
        for i in range(n):
            if bcs[2 * i] or bcs[2 * i + 1]:
                bc = bcs[2 * i] + bcs[2 * i + 1]
                bcs[2 * i] = bcs[2 * i + 1] = bc
        names = [r.name.encode() for r in reads_flat]
        name_flat, name_off = _flat(names)
        bc_flat, bc_off = _flat(bcs)
        sf_flat, sf_off = _flat([r.full_codes for r in reads_flat])
        q_flat, q_off = _flat([(r.qual.tobytes() if r.qual is not None
                                else b"") for r in reads_flat])
    mcig_counts = np.zeros(n2 * stride, dtype=np.int64)
    for o, cg in mcigars.items():
        if cg:
            mcig_counts[o] = 2 * len(cg)
    roff = np.zeros(n2 + 1, dtype=np.int64)
    cig_counts[:] = 0
    for i, cg in cigars.items():
        if cg:
            cig_counts[i] = 2 * len(cg)
    np.cumsum(cig_counts, out=roff[1:])
    moff = np.zeros(n2 * stride + 1, dtype=np.int64)
    np.cumsum(mcig_counts, out=moff[1:])
    moff += roff[-1]
    cig = np.zeros(int(moff[-1]), dtype=np.int32)
    for i, cg in cigars.items():
        if cg:
            cig[roff[i]:roff[i + 1]] = \
                np.array(cg, dtype=np.int32).reshape(-1)
    for o, cg in mcigars.items():
        if cg:
            cig[moff[o]:moff[o + 1]] = \
                np.array(cg, dtype=np.int32).reshape(-1)
    cig_off_full = np.concatenate([roff, moff])

    ann_off, ann_len, ann_names, ann_name_off, amb_off, amb_len, \
        amb_chr = _bns_emit_arrays(bns)
    rg = rg_id.encode() if rg_id else b""
    rg_arr = np.frombuffer(rg, dtype=np.uint8) if rg else \
        np.zeros(0, dtype=np.uint8)
    mate_idx = np.arange(n2, dtype=np.int64) ^ 1
    cap = int(sf_off[-1]) * 3 + int(md_off[-1]) + 256 * n2 + 1024
    out = np.empty(cap, dtype=np.uint8)
    args = (n2, state.reshape(-1), mate_idx,
            name_flat, name_off, bc_flat, bc_off,
            cig, cig_off_full, md_buf, md_off,
            sf_flat, sf_off, q_flat, q_off,
            multi_pos, multi_gap, multi_mm, multi_strand, multi_n, stride,
            bns.n_seqs, ann_off, ann_len, ann_names, ann_name_off,
            len(bns.ambs), amb_off, amb_len, amb_chr, bns.l_pac,
            gopt.mode, gopt.max_top2, rg_arr, len(rg))
    total = lib.sam_emit_batch(*args, out, cap, _post_threads())
    if total > cap:
        out = np.empty(int(total), dtype=np.uint8)
        total = lib.sam_emit_batch(*args, out, int(total), _post_threads())
    return out[:total].tobytes(), ii


def samse_bytes(engine, reads, per_read_alns, opt, n_occ=3, rng=None,
                rg_id=None, ntpac=None):
    """Native-pipeline samse for one chunk; returns the SAM text as bytes
    (one line per read, newline-terminated), or None when the native
    library is unavailable or the color-space path is requested."""
    lib = native_mod._load()
    if lib is None or ntpac is not None or not reads:
        return None
    from ..utils.rand48 import Rand48

    bns = engine.index.bns
    pac = engine.index.pac
    if rng is None:
        rng = Rand48(bns.seed)

    n = len(reads)
    state = np.zeros((n, NF), dtype=np.int64)
    colsrc = reads if isinstance(reads, fq.ReadBatch) else None
    if colsrc is not None:
        # columnar batch: length columns come straight off the offsets
        lens = colsrc.clip_lens()
        state[:, F_LEN] = lens
        state[:, F_FULL_LEN] = colsrc.full_lens()
        state[:, F_CLIP_LEN] = lens
    else:
        lens = np.array([r.len for r in reads], dtype=np.int64)
        state[:, F_LEN] = lens
        state[:, F_FULL_LEN] = [r.full_len for r in reads]
        state[:, F_CLIP_LEN] = [r.clip_len for r in reads]

    # 1. hit selection + multi enumeration (exact drand48 stream)
    from ..io import sai as sai_mod
    if isinstance(per_read_alns, sai_mod.AlnColumn):
        recs, counts = per_read_alns.columns()
    else:
        recs, counts = _pack_recs(per_read_alns)
    stride = n_occ + 1
    multi_pos = np.zeros(n * stride, dtype=np.uint64)
    multi_gap = np.zeros(n * stride, dtype=np.int32)
    multi_mm = np.zeros(n * stride, dtype=np.int32)
    multi_strand = np.zeros(n * stride, dtype=np.int32)
    multi_n = np.zeros(n, dtype=np.int32)
    rngst = np.array([rng.x], dtype=np.uint64)
    lib.se_select_batch(n, recs, counts, state.reshape(-1), rngst, 1,
                        n_occ, multi_pos, multi_gap, multi_mm,
                        multi_strand, multi_n)
    rng.x = int(rngst[0])

    # 2. batched SA -> pac coordinate (bwa_cal_pac_pos, bwase.c:156-183)
    matched = state[:, F_TYPE] != BWA_TYPE_NO_MATCH
    strand = state[:, F_STRAND] != 0
    mrows = np.nonzero(multi_n)[0]
    mslot, mlen = [], []
    for i in mrows.tolist():
        for m in range(multi_n[i]):
            mslot.append(i * stride + m)
            mlen.append(lens[i])
    mslot = np.array(mslot, dtype=np.int64)
    mlen = np.array(mlen, dtype=np.int64)
    m_strand = multi_strand[mslot] != 0 if len(mslot) else \
        np.zeros(0, dtype=bool)

    rev_len = engine.index.rev.seq_len
    for a in (1, 0):
        sel = matched & (strand if a else ~strand)
        msel = (m_strand if a else ~m_strand) if len(mslot) else \
            np.zeros(0, dtype=bool)
        sas = np.concatenate([
            state[sel, F_SA].astype(np.uint32),
            multi_pos[mslot[msel]].astype(np.uint32)])
        if not len(sas):
            continue
        vals = engine.sa_rows(a, sas).astype(np.int64)
        k = int(sel.sum())
        pv, mv = vals[:k], vals[k:]
        if a:
            state[sel, F_POS] = pv
            multi_pos[mslot[msel]] = mv.astype(np.uint64)
        else:
            state[sel, F_POS] = (rev_len - (pv + lens[sel])) & _NEG1
            multi_pos[mslot[msel]] = \
                ((rev_len - (mv + mlen[msel])) & _NEG1).astype(np.uint64)

    # 3. vectorized mapQ (bwa_approx_mapQ, bwase.c:113-122)
    md_arr = _maxdiff_for(lens, opt.fnr, opt.max_diff)
    c1 = state[:, F_C1]
    c2 = state[:, F_C2]
    g = se.G_LOG_N[np.minimum(c2, 255)]
    mq = np.where(c1 == 0, 23,
                  np.where(c1 > 1, 0,
                           np.where(state[:, F_NMM] == md_arr, 25,
                                    np.where(c2 == 0, 37,
                                             np.where(23 < g, 0, 23 - g)))))
    state[matched, F_MAPQ] = mq[matched]
    state[matched, F_SEQ_Q] = mq[matched]

    # 4. gapped refinement (bwa_refine_gapped, bwase.c:356-423): device/
    #    native banded-global DPs for the few gapped rows + gapped multis
    cigars = {}
    mcigars = {}
    jobs = []
    fwd_cache = {}

    def fwd_codes(i):
        c = fwd_cache.get(i)
        if c is None:
            c = reads[i].seq[::-1]
            fwd_cache[i] = c
        return c

    for o in mslot.tolist():
        if multi_gap[o] == 0:
            continue
        i = o // stride
        seqc = reads[i].rseq if multi_strand[o] else fwd_codes(i)

        def apply_m(cig, newpos, o=o):
            mcigars[o] = cig
            multi_pos[o] = newpos

        jobs.append((apply_m, seqc, int(multi_pos[o]),
                     (1 if multi_strand[o] else -1) * int(multi_gap[o])))
    gap_rows = np.nonzero(matched & (state[:, F_NGO] > 0))[0]
    for i in gap_rows.tolist():
        seqc = reads[i].rseq if strand[i] else fwd_codes(i)

        def apply_s(cig, newpos, i=i):
            cigars[i] = cig if cig else None
            state[i, F_POS] = newpos

        jobs.append((apply_s, seqc, int(state[i, F_POS]),
                     (1 if strand[i] else -1)
                     * int(state[i, F_NGO] + state[i, F_NGE])))
    se._refine_jobs(jobs, pac, bns.l_pac, use_device=True)

    # 5. MD/NM (native walk with ambiguity holes)
    if colsrc is not None:
        seq_flat, seq_off = colsrc.aligned_codes(strand)
    else:
        seq_chunks = [(reads[i].rseq if strand[i] else fwd_codes(i))
                      for i in range(n)]
        seq_flat, seq_off = _flat(seq_chunks)
    cig_pairs = []
    cig_counts = np.zeros(n, dtype=np.int64)
    for i, cg in cigars.items():
        if cg:
            cig_counts[i] = 2 * len(cg)
    cig_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(cig_counts, out=cig_off[1:])
    cig = np.zeros(int(cig_off[-1]), dtype=np.int32)
    for i, cg in cigars.items():
        if cg:
            cig[cig_off[i]:cig_off[i + 1]] = \
                np.array(cg, dtype=np.int32).reshape(-1)
    _, _, _, _, amb_off, amb_len, amb_chr = _bns_emit_arrays(bns)
    md_cap = int(seq_off[-1]) * 2 + 24 * n + 16
    md_buf = np.empty(md_cap, dtype=np.uint8)
    md_off = np.zeros(n + 1, dtype=np.int64)
    rc = lib.md_batch(n, state.reshape(-1), seq_flat, seq_off, cig,
                      cig_off, pac, bns.l_pac, len(bns.ambs),
                      amb_off, amb_len, amb_chr, md_buf, md_cap, md_off,
                      _post_threads())
    if rc != 0:
        return None

    # 6. quality-trim cigar correction (bwa_correct_trimmed,
    #    bwase.c:320-354) — rare, per affected row
    trimmed = np.nonzero(lens < state[:, F_FULL_LEN])[0]
    for i in trimmed.tolist():
        s = se.SeqState(reads[i])
        s.strand = int(state[i, F_STRAND])
        s.cigar = list(cigars[i]) if cigars.get(i) else None
        s.len = int(state[i, F_LEN])
        se.correct_trimmed(s)
        cigars[i] = s.cigar
        state[i, F_LEN] = s.len

    # 7. native SAM emission
    if colsrc is not None:
        name_flat, name_off = colsrc.name_bytes()
        bc_flat, bc_off = np.zeros(0, np.uint8), np.zeros(n + 1, np.int64)
        sf_flat, sf_off = colsrc.code_bytes()
        q_flat, q_off = colsrc.qual_bytes()
    else:
        names = [r.name.encode() for r in reads]
        name_flat, name_off = _flat(names)
        bcs = [r.bc.encode() if r.bc else b"" for r in reads]
        bc_flat, bc_off = _flat(bcs)
        seqs_full = [r.full_codes for r in reads]
        sf_flat, sf_off = _flat(seqs_full)
        quals = [(r.qual.tobytes() if r.qual is not None else b"")
                 for r in reads]
        q_flat, q_off = _flat(quals)

    # cigars may have changed in step 6: rebuild flat, now with the multi
    # cigars appended (emitter layout: read offsets then multi offsets)
    cig_counts = np.zeros(n, dtype=np.int64)
    for i, cg in cigars.items():
        if cg:
            cig_counts[i] = 2 * len(cg)
    mcig_counts = np.zeros(n * stride, dtype=np.int64)
    for o, cg in mcigars.items():
        if cg:
            mcig_counts[o] = 2 * len(cg)
    roff = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(cig_counts, out=roff[1:])
    moff = np.zeros(n * stride + 1, dtype=np.int64)
    np.cumsum(mcig_counts, out=moff[1:])
    moff += roff[-1]
    cig = np.zeros(int(moff[-1]), dtype=np.int32)
    for i, cg in cigars.items():
        if cg:
            cig[roff[i]:roff[i + 1]] = \
                np.array(cg, dtype=np.int32).reshape(-1)
    for o, cg in mcigars.items():
        if cg:
            cig[moff[o]:moff[o + 1]] = \
                np.array(cg, dtype=np.int32).reshape(-1)
    cig_off_full = np.concatenate([roff, moff])

    ann_off, ann_len, ann_names, ann_name_off, amb_off, amb_len, \
        amb_chr = _bns_emit_arrays(bns)
    rg = rg_id.encode() if rg_id else b""
    rg_arr = np.frombuffer(rg, dtype=np.uint8) if rg else \
        np.zeros(0, dtype=np.uint8)
    mate_idx = np.full(n, -1, dtype=np.int64)
    cap = int(sf_off[-1]) * 3 + int(md_off[-1]) + 256 * n + 1024
    out = np.empty(cap, dtype=np.uint8)
    total = lib.sam_emit_batch(
        n, state.reshape(-1), mate_idx,
        name_flat, name_off, bc_flat, bc_off,
        cig, cig_off_full, md_buf, md_off,
        sf_flat, sf_off, q_flat, q_off,
        multi_pos, multi_gap, multi_mm, multi_strand, multi_n, stride,
        bns.n_seqs, ann_off, ann_len, ann_names, ann_name_off,
        len(bns.ambs), amb_off, amb_len, amb_chr, bns.l_pac,
        opt.mode, opt.max_top2, rg_arr, len(rg),
        out, cap, _post_threads())
    if total > cap:
        out = np.empty(int(total), dtype=np.uint8)
        total = lib.sam_emit_batch(
            n, state.reshape(-1), mate_idx,
            name_flat, name_off, bc_flat, bc_off,
            cig, cig_off_full, md_buf, md_off,
            sf_flat, sf_off, q_flat, q_off,
            multi_pos, multi_gap, multi_mm, multi_strand, multi_n, stride,
            bns.n_seqs, ann_off, ann_len, ann_names, ann_name_off,
            len(bns.ambs), amb_off, amb_len, amb_chr, bns.l_pac,
            opt.mode, opt.max_top2, rg_arr, len(rg),
            out, int(total), _post_threads())
    return out[:total].tobytes()
