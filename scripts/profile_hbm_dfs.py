"""Profile the HBM-tier Pallas DFS at genome scale: one traced run,
then a breakdown of where the time goes (jax.profiler trace).

  GLEN=64000000 NREADS=512 python scripts/profile_hbm_dfs.py
"""

import copy
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests import genomes
from nabwa_tpu.index.build import build_index
from nabwa_tpu.index.fmindex import BwaIndex
from nabwa_tpu.io import fastq
from nabwa_tpu.options import GapOpt
from nabwa_tpu.models.aln import AlnEngine, _maxdiff_table
from nabwa_tpu.ops import dfs_pallas
from nabwa_tpu.constants import BWA_AVG_ERR
from nabwa_tpu.refmodel.aln_scalar import cal_maxdiff

glen = int(os.environ.get("GLEN", "64000000"))
n_reads = int(os.environ.get("NREADS", "512"))
read_len = 100
seed = 7
S = int(os.environ.get("SCAP", "256"))
BB = int(os.environ.get("BB", "64"))
H = 32

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
eng = AlnEngine(idx, opt, use_pallas=True)
eng.stack_cap = S
max_len = max(r.len for r in reads)
local = copy.copy(opt)
local.max_diff = cal_maxdiff(max_len, BWA_AVG_ERR, opt.fnr)
if local.max_diff < local.max_gapo:
    local.max_gapo = local.max_diff
tab = _maxdiff_table(opt.fnr, max(max_len, 64))
maxdiff = np.array([tab[r.len] for r in reads], dtype=np.int32)

results = [None] * len(reads)
print("tiers: mxu", eng._pal_mxu, "hbm", eng._pal_hbm,
      "table", None if eng._pal_table is None else eng._pal_table.shape)

# warm-up (compile)
t0 = time.time()
ctx = eng._run_device(reads, maxdiff, local, results, 0, max_len,
                      dispatch_only=True)
ctx["out"].block_until_ready()
print(f"compile+run: {time.time()-t0:.2f}s")

t0 = time.time()
ctx = eng._run_device(reads, maxdiff, local, results, 0, max_len,
                      dispatch_only=True)
ctx["out"].block_until_ready()
dt = time.time() - t0
print(f"steady: {dt:.3f}s  {n_reads/dt:.0f} reads/s")

trace_dir = "/tmp/jax_trace_hbm"
with jax.profiler.trace(trace_dir):
    ctx = eng._run_device(reads, maxdiff, local, results, 0, max_len,
                          dispatch_only=True)
    ctx["out"].block_until_ready()
print("trace written to", trace_dir)
