"""Cost attribution for the HBM Pallas DFS tier at genome scale:
iteration counts, lane utilization, and derived us/iteration.

The packed output's last five columns are [n_aln, hw, ovf, fin, iters]
(dfs_pallas_call docstring); iters is per-BB-block (same value across
the block's lanes), fin is the iteration each lane finished at.

  GLEN=64000000 NREADS=2048 python scripts/probe_iters.py
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
n_reads = int(os.environ.get("NREADS", "2048"))
read_len = int(os.environ.get("RLEN", "100"))
seed = 7
SCAP = int(os.environ.get("SCAP", "256"))
MAXIT = int(os.environ.get("MAXIT", "768"))
ERR = float(os.environ.get("ERR", "0.01"))
INDEL = float(os.environ.get("INDEL", "0.1"))

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
                          err_rate=ERR, indel_rate=INDEL)
open(f"{workdir}/r.fq", "wb").write(fq)
reads = fastq.read_fastq_batch(fastq.iter_fastq(f"{workdir}/r.fq"), 1 << 22)

opt = GapOpt()
eng = AlnEngine(idx, opt, use_pallas=True, stack_cap=SCAP,
                tier0_max_iters=MAXIT)
if os.environ.get("BB"):
    eng.PALLAS_BB = int(os.environ["BB"])
max_len = max(r.len for r in reads)
local = copy.copy(opt)
local.max_diff = cal_maxdiff(max_len, BWA_AVG_ERR, opt.fnr)
if local.max_diff < local.max_gapo:
    local.max_gapo = local.max_diff
tab = _maxdiff_table(opt.fnr, max(max_len, 64))
maxdiff = np.array([tab[r.len] for r in reads], dtype=np.int32)
results = [None] * len(reads)
eng._device_init()
print("tiers: mxu", eng._pal_mxu, "hbm", eng._pal_hbm, flush=True)

ctx = eng._run_device(reads, maxdiff, local, results, 0, max_len,
                      dispatch_only=True)
np.asarray(ctx["out"])          # compile + run

for trial in range(3):
    t0 = time.time()
    ctx = eng._run_device(reads, maxdiff, local, results, 0, max_len,
                          dispatch_only=True)
    out = np.asarray(ctx["out"])
    dt = time.time() - t0
    H = ctx["hits_cap"]
    n_aln = out[:, 4 * H]
    hw = out[:, 4 * H + 1]
    ovf = out[:, 4 * H + 2]
    fin = out[:, 4 * H + 3]
    iters = out[:, 4 * H + 4]
    BB = eng.PALLAS_BB
    blocks = iters.reshape(-1, BB)[:, 0]
    fin2 = np.where(fin == 0, 1, fin)          # done-at-init lanes
    util = fin2.reshape(-1, BB).sum(1) / (blocks * BB)
    tot_iters = int(blocks.sum())
    print(f"trial {trial}: {dt*1e3:.1f} ms  {len(reads)/dt:.0f} reads/s  "
          f"tot_block_iters={tot_iters}  us/iter={dt*1e6/tot_iters:.2f}")
    print(f"  fin: p50={np.percentile(fin2,50):.0f} "
          f"p90={np.percentile(fin2,90):.0f} max={fin2.max()} "
          f"  block iters: p50={np.percentile(blocks,50):.0f} "
          f"max={blocks.max()}  mean lane util={util.mean():.3f}")
    print(f"  ovf={int(ovf.sum())}/{len(reads)}  "
          f"hw: p50={np.percentile(hw,50):.0f} p90={np.percentile(hw,90):.0f}"
          f" max={hw.max()}")
    out5 = np.asarray(ctx["out"])[:, 4 * H + 5]
    print(f"  pend iters: p50={np.percentile(out5,50):.0f} "
          f"p90={np.percentile(out5,90):.0f} max={out5.max()} "
          f"sum={int(out5.sum())} (vs fin sum {int(fin2.sum())})")
