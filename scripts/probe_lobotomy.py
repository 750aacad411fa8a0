"""Per-iteration cost attribution for the HBM Pallas DFS via cumulative
lobotomy cuts at a FIXED iteration count ("nodone" + MAXIT).  Results are
wrong under every cut; only the us/iteration deltas matter.

  GLEN=64000000 NREADS=512 MAXIT=256 python scripts/probe_lobotomy.py
"""

import copy
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests import genomes
from nabwa_tpu.index.build import build_index
from nabwa_tpu.index.fmindex import BwaIndex
from nabwa_tpu.io import fastq
from nabwa_tpu.options import GapOpt
from nabwa_tpu.models.aln import AlnEngine, _maxdiff_table
from nabwa_tpu.constants import BWA_AVG_ERR
from nabwa_tpu.refmodel.aln_scalar import cal_maxdiff

glen = int(os.environ.get("GLEN", "64000000"))
n_reads = int(os.environ.get("NREADS", "512"))
MAXIT = int(os.environ.get("MAXIT", "256"))
read_len = 100
seed = 7

workdir = "/tmp/time_dfs_pallas"
os.makedirs(workdir, exist_ok=True)
fa_p = f"{workdir}/g_{glen}_{seed}.fa"
if not os.path.exists(fa_p + ".bwt"):
    fa, seqs = genomes.random_genome(glen, seed=seed)
    open(fa_p, "wb").write(fa)
    build_index(fa_p, fa_p)
idx = BwaIndex.load(fa_p)
fa, seqs = genomes.random_genome(glen, seed=seed)
fq = genomes.sample_reads(seqs[0], n_reads, read_len, seed=seed + 1,
                          err_rate=0.01, indel_rate=0.1)
open(f"{workdir}/r.fq", "wb").write(fq)
reads = fastq.read_fastq_batch(fastq.iter_fastq(f"{workdir}/r.fq"), 1 << 22)

opt = GapOpt()
eng = AlnEngine(idx, opt, use_pallas=True, tier0_max_iters=MAXIT)
max_len = max(r.len for r in reads)
local = copy.copy(opt)
local.max_diff = cal_maxdiff(max_len, BWA_AVG_ERR, opt.fnr)
if local.max_diff < local.max_gapo:
    local.max_gapo = local.max_diff
tab = _maxdiff_table(opt.fnr, max(max_len, 64))
maxdiff = np.array([tab[r.len] for r in reads], dtype=np.int32)
results = [None] * len(reads)
eng._device_init()
n_blocks = -(-max(64, -(-len(reads) // 64) * 64) // eng.PALLAS_BB)
tot_it = n_blocks * MAXIT

CUTS = [
    ("skel", ("nodone", "skel")),
    ("full", ("nodone",)),
    ("-fetch", ("nodone", "fetch")),
    ("-occ", ("nodone", "occ")),
    ("-extracts", ("nodone", "extracts")),
    ("-cand", ("nodone", "cand")),
    ("-push", ("nodone", "push")),
    ("-shadow", ("nodone", "shadow")),
    ("-pop", ("nodone", "pop")),
    ("-popmin", ("nodone", "popmin")),
    ("-pend", ("nodone", "pend")),
    ("-hit", ("nodone", "hit")),
    ("-all", ("nodone", "extracts", "cand", "pop", "push", "shadow",
              "occ", "fetch")),
    ("-ALL+", ("nodone", "extracts", "cand", "popmin", "pop", "push",
               "shadow", "occ", "fetch", "pend", "hit")),
]

for name, cuts in CUTS:
    ctx = eng._run_device(reads, maxdiff, local, results, 0, max_len,
                          dispatch_only=True, lobotomy=cuts)
    np.asarray(ctx["out"])
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        ctx = eng._run_device(reads, maxdiff, local, results, 0, max_len,
                              dispatch_only=True, lobotomy=cuts)
        np.asarray(ctx["out"])
        best = min(best, time.time() - t0)
    print(f"{name:8s}  {best*1e3:8.1f} ms  {best*1e6/tot_it:7.2f} us/iter",
          flush=True)
