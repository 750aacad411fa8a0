"""Pallas DFS kernel vs the jnp DFS engine (interpret mode on CPU).

The pallas kernel must produce bit-identical packed results — same hits,
same order, same overflow/hw bookkeeping — as ops.dfs.dfs_match_gap,
which is itself golden-tested against reference `bwa aln` .sai output
(test_dfs_device.py).
"""

import copy

import numpy as np
import jax.numpy as jnp
import pytest

from nabwa_tpu.index.build import build_index
from nabwa_tpu.index.fmindex import BwaIndex
from nabwa_tpu.io import fastq
from nabwa_tpu.models.aln import AlnEngine, _maxdiff_table
from nabwa_tpu.options import GapOpt
from nabwa_tpu.ops import dfs_pallas
from nabwa_tpu.ops.dfs import aln_device_step, unpack_result
from nabwa_tpu.refmodel.aln_scalar import cal_maxdiff
from nabwa_tpu.constants import BWA_AVG_ERR

from . import genomes


def _run_both(tmp_path, glen, n_reads, read_len, err, indel, seed, opt,
              stack_cap=128, hits_cap=16, hbm=False, refill=False,
              BB=None):
    fa, seqs = genomes.random_genome(glen, seed=seed)
    fq = genomes.sample_reads(seqs[0], n_reads, read_len, seed=seed + 1,
                              err_rate=err, indel_rate=indel)
    (tmp_path / "g.fa").write_bytes(fa)
    build_index(str(tmp_path / "g.fa"))
    idx = BwaIndex.load(str(tmp_path / "g.fa"))
    reads = fastq.read_fastq_batch(fastq.iter_fastq_bytes(fq), 1 << 20) \
        if hasattr(fastq, "iter_fastq_bytes") else None
    if reads is None:
        (tmp_path / "r.fq").write_bytes(fq)
        reads = fastq.read_fastq_batch(
            fastq.iter_fastq(str(tmp_path / "r.fq")), 1 << 20)

    eng = AlnEngine(idx, opt, use_pallas=False)
    max_len = max(r.len for r in reads)
    local = copy.copy(opt)
    if opt.fnr > 0.0:
        local.max_diff = cal_maxdiff(max_len, BWA_AVG_ERR, opt.fnr)
    if local.max_diff < local.max_gapo:
        local.max_gapo = local.max_diff
    if opt.fnr > 0.0:
        tab = _maxdiff_table(opt.fnr, max(max_len, 64))
        maxdiff = np.array([tab[r.len] for r in reads], dtype=np.int32)
    else:
        maxdiff = np.full(len(reads), opt.max_diff, dtype=np.int32)

    B = max(16, -(-len(reads) // 16) * 16)
    L = max(32, -(-max_len // 32) * 32)
    maxdiff = np.concatenate([maxdiff,
                              np.zeros(B - len(reads), np.int32)])
    seqs_a = np.full((B, 2, L), 4, dtype=np.int32)
    lengths = np.zeros(B, dtype=np.int32)
    for i, r in enumerate(reads):
        seqs_a[i, 0, :r.len] = r.seq
        seqs_a[i, 1, :r.len] = r.rseq
        lengths[i] = r.len
    SL = min(local.seed_len, L) if local.seed_len < 0x7FFFFFFF else L
    SL = max(SL, 1)
    has_seed = (lengths > local.seed_len
                if local.seed_len < 0x7FFFFFFF
                else np.zeros(B, dtype=bool))
    has_seed = np.asarray(has_seed, dtype=bool)
    seed_starts = np.maximum(
        lengths - (local.seed_len if local.seed_len < 0x7FFFFFFF else 0), 0)
    gi = np.minimum(seed_starts[:, None] + np.arange(SL), L - 1)
    sseq = np.stack([np.take_along_axis(seqs_a[:, 0, :], gi, 1),
                     np.take_along_axis(seqs_a[:, 1, :], gi, 1)], axis=1)
    slen = np.where(has_seed, min(local.seed_len, SL), 0).astype(np.int32)

    statics = dict(
        s_mm=local.s_mm, s_gapo=local.s_gapo, s_gape=local.s_gape,
        max_gape=local.max_gape, max_gapo=local.max_gapo,
        indel_end_skip=local.indel_end_skip,
        max_del_occ=local.max_del_occ, max_entries=local.max_entries,
        max_top2=local.max_top2, max_seed_diff=local.max_seed_diff,
        seed_len=local.seed_len, mode=local.mode,
        stack_cap=stack_cap, hits_cap=hits_cap, max_iters=100000)

    ref = np.asarray(aln_device_step(
        eng.bwt_cat, eng.bwt_fwd, eng.bwt_rev, eng.rev_off,
        eng.primary_fwd, eng.primary_rev, eng.l2, eng.seq_len,
        jnp.asarray(seqs_a), jnp.asarray(lengths), jnp.asarray(sseq),
        jnp.asarray(slen), jnp.asarray(has_seed), jnp.asarray(maxdiff),
        **statics))

    table, rev_row0 = dfs_pallas.build_table(
        np.asarray(eng.bwt_cat), eng.rev_off)
    params = dfs_pallas.build_params(
        np.asarray(eng.l2), eng.primary_fwd, eng.primary_rev,
        eng.seq_len, rev_row0)
    pal = np.asarray(dfs_pallas.aln_device_step_pallas(
        jnp.asarray(table), jnp.asarray(params), eng.bwt_fwd, eng.bwt_rev,
        eng.rev_off, eng.primary_fwd, eng.primary_rev, eng.l2, eng.seq_len,
        jnp.asarray(seqs_a), jnp.asarray(lengths), jnp.asarray(sseq),
        jnp.asarray(slen), jnp.asarray(has_seed), jnp.asarray(maxdiff),
        BB=BB or B, interpret=True, hbm=hbm, refill=refill, **statics))

    ru = unpack_result(ref, hits_cap)
    pu = unpack_result(pal, hits_cap)
    for i in range(len(reads)):
        ro, po = bool(ru["overflow"][i]), bool(pu["overflow"][i])
        assert ro == po, f"read {i}: overflow {ro} != {po}"
        if ro:
            continue
        assert ru["n_aln"][i] == pu["n_aln"][i], f"read {i} n_aln"
        n = int(ru["n_aln"][i])
        for f in ("hit_meta", "hit_k", "hit_l", "hit_score"):
            np.testing.assert_array_equal(
                ru[f][i, :n], pu[f][i, :n], err_msg=f"read {i} {f}")
        assert ru["hw"][i] == pu["hw"][i], f"read {i} hw"


def test_pallas_mismatches(tmp_path):
    _run_both(tmp_path, 20000, 16, 40, 0.02, 0.2, 301, GapOpt())


def test_pallas_gapped(tmp_path):
    _run_both(tmp_path, 30000, 16, 75, 0.02, 0.5, 302,
              GapOpt(max_diff=4, fnr=-1.0, max_gapo=2))


def test_pallas_seeded(tmp_path):
    _run_both(tmp_path, 30000, 16, 80, 0.03, 0.2, 303, GapOpt(seed_len=25))


def test_pallas_hbm_gapped(tmp_path):
    """The HBM-resident DMA variant must match the jnp engine bit-exactly
    (same kernel, block rows arriving by async copy instead of VMEM
    residency)."""
    _run_both(tmp_path, 30000, 16, 75, 0.02, 0.5, 304,
              GapOpt(max_diff=4, fnr=-1.0, max_gapo=2), hbm=True)


def test_pallas_hbm_seeded(tmp_path):
    _run_both(tmp_path, 30000, 16, 80, 0.03, 0.2, 305,
              GapOpt(seed_len=25), hbm=True)


def test_pallas_refill_gapped(tmp_path):
    """Persistent-occupancy (lane-refill) variant: BB=8 lanes cycle
    through 16 reads, outputs land by per-lane DMA — must match the jnp
    engine bit-exactly."""
    _run_both(tmp_path, 30000, 16, 75, 0.02, 0.5, 306,
              GapOpt(max_diff=4, fnr=-1.0, max_gapo=2), hbm=True,
              refill=True, BB=8)


def test_pallas_refill_seeded(tmp_path):
    _run_both(tmp_path, 30000, 16, 80, 0.03, 0.2, 307,
              GapOpt(seed_len=25), hbm=True, refill=True, BB=8)


def test_pallas_refill_overflow(tmp_path):
    """Stack-overflow reads must flush with the ovf flag through the
    refill path (tiny stack forces overflows)."""
    _run_both(tmp_path, 30000, 16, 75, 0.03, 0.5, 308,
              GapOpt(max_diff=4, fnr=-1.0, max_gapo=2), stack_cap=32,
              hbm=True, refill=True, BB=8)
