"""Compare the native C++ DFS (native/dfsgap.cpp) against the Python
scalar oracle (refmodel/dfs_scalar.py) on random genomes/reads.

  GLEN=60000 NREADS=128 RLEN=75 ERR=0.03 INDEL=0.3 SEEDLEN=32 \
      python scripts/compare_dfs_native.py
"""

import copy
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")

from tests import genomes
from nabwa_tpu.index.build import build_index
from nabwa_tpu.index.fmindex import BwaIndex
from nabwa_tpu.io import fastq
from nabwa_tpu.options import GapOpt
from nabwa_tpu.constants import BWA_AVG_ERR
from nabwa_tpu.refmodel.fm_scalar import ScalarFm
from nabwa_tpu.refmodel.aln_scalar import aln_batch, cal_maxdiff
from nabwa_tpu.index.native import dfs_match_gap_native

glen = int(os.environ.get("GLEN", "60000"))
n_reads = int(os.environ.get("NREADS", "128"))
read_len = int(os.environ.get("RLEN", "75"))
err = float(os.environ.get("ERR", "0.03"))
indel = float(os.environ.get("INDEL", "0.3"))
seed = int(os.environ.get("SEED", "101"))
seed_len = int(os.environ.get("SEEDLEN", "0"))

workdir = "/tmp/cmp_dfs_native"
os.makedirs(workdir, exist_ok=True)
fa, seqs = genomes.random_genome(glen, seed=seed)
fq = genomes.sample_reads(seqs[0], n_reads, read_len, seed=seed + 1,
                          err_rate=err, indel_rate=indel)
open(f"{workdir}/g.fa", "wb").write(fa)
open(f"{workdir}/r.fq", "wb").write(fq)
build_index(f"{workdir}/g.fa", f"{workdir}/g.fa")
idx = BwaIndex.load(f"{workdir}/g.fa")
reads = fastq.read_fastq_batch(fastq.iter_fastq(f"{workdir}/r.fq"), 1 << 20)

opt = GapOpt()
if seed_len:
    opt.seed_len = seed_len

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
    idx.fwd.l2, idx.fwd.seq_len, reads, maxdiff, local)
assert got is not None, "native library unavailable"

bad = 0
for i, ((walns, whw), (galns, ghw)) in enumerate(zip(want, got)):
    wl = [tuple(h) for h in walns]
    gl = [tuple(h) for h in galns]
    if wl != gl or whw != ghw:
        bad += 1
        if bad <= 5:
            print(f"read {i} MISMATCH (hw {whw} vs {ghw})")
            print("  oracle:", wl[:8])
            print("  native:", gl[:8])
print(f"reads={len(reads)} mismatches={bad}")
print("PASS" if bad == 0 else "FAIL")
sys.exit(0 if bad == 0 else 1)
