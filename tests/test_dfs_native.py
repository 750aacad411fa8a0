"""Native C++ DFS (native/dfsgap.cpp) vs the Python scalar oracle."""

import copy

import numpy as np
import pytest

from nabwa_tpu.index.build import build_index
from nabwa_tpu.index.fmindex import BwaIndex
from nabwa_tpu.index.native import dfs_match_gap_native
from nabwa_tpu.io import fastq
from nabwa_tpu.options import GapOpt
from nabwa_tpu.constants import BWA_AVG_ERR
from nabwa_tpu.refmodel.fm_scalar import ScalarFm
from nabwa_tpu.refmodel.aln_scalar import aln_batch, cal_maxdiff

from . import genomes


def _run(tmp_path, glen, n_reads, read_len, err, indel, seed, opt):
    fa, seqs = genomes.random_genome(glen, seed=seed)
    fq = genomes.sample_reads(seqs[0], n_reads, read_len, seed=seed + 1,
                              err_rate=err, indel_rate=indel)
    (tmp_path / "g.fa").write_bytes(fa)
    (tmp_path / "r.fq").write_bytes(fq)
    build_index(str(tmp_path / "g.fa"))
    idx = BwaIndex.load(str(tmp_path / "g.fa"))
    reads = fastq.read_fastq_batch(fastq.iter_fastq(str(tmp_path / "r.fq")),
                                   1 << 20)
    fms = (ScalarFm(idx.fwd.bwt, idx.fwd.primary, idx.fwd.l2,
                    idx.fwd.seq_len, idx.fwd.sa, idx.fwd.sa_intv),
           ScalarFm(idx.rev.bwt, idx.rev.primary, idx.rev.l2,
                    idx.rev.seq_len, idx.rev.sa, idx.rev.sa_intv))
    want = aln_batch(fms, reads, opt)

    max_len = max(r.len for r in reads)
    local = copy.copy(opt)
    if opt.fnr > 0.0:
        local.max_diff = cal_maxdiff(max_len, BWA_AVG_ERR, opt.fnr)
    if local.max_diff < local.max_gapo:
        local.max_gapo = local.max_diff
    maxdiff = np.array(
        [cal_maxdiff(r.len, BWA_AVG_ERR, opt.fnr) if opt.fnr > 0.0
         else opt.max_diff for r in reads], dtype=np.int32)
    got = dfs_match_gap_native(
        idx.fwd.bwt, idx.fwd.primary, idx.rev.bwt, idx.rev.primary,
        idx.fwd.l2, idx.fwd.seq_len, reads, maxdiff, local, hits_cap=4)
    if got is None:
        pytest.skip("native library unavailable")
    assert len(got) == len(want)
    for i, ((walns, whw), (galns, ghw)) in enumerate(zip(want, got)):
        assert walns == galns, f"read {i}"
        assert whw == ghw, f"read {i} hw"


def test_native_dfs_gapped(tmp_path):
    _run(tmp_path, 50000, 64, 75, 0.03, 0.3, 201, GapOpt())


def test_native_dfs_seeded(tmp_path):
    opt = GapOpt()
    opt.seed_len = 32
    _run(tmp_path, 50000, 64, 90, 0.04, 0.4, 202, opt)


def test_native_dfs_hits_cap_regrow(tmp_path):
    # hits_cap=4 above already forces the -1 retry/regrow path for
    # repeat-heavy reads; this case makes it certain with short reads
    _run(tmp_path, 30000, 48, 30, 0.0, 0.0, 203, GapOpt())
