"""Lane-liveness probe for the HBM Pallas DFS on the bench workload.

The kernel runs BB reads in lockstep; a lane whose read finished keeps
iterating as a no-op until the whole block drains.  summ already records
per-read `fin` (the iteration the lane went done) and per-block `iters`;
avg liveness = sum(fin)/(iters*BB) bounds the win from lane refill.

  NREADS=2048 python scripts/probe_liveness.py
"""

import copy
import os
import pathlib
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nabwa_tpu.index.fmindex import BwaIndex
from nabwa_tpu.io import fastq
from nabwa_tpu.options import GapOpt
from nabwa_tpu.models.aln import AlnEngine, _maxdiff_table
from nabwa_tpu.constants import BWA_AVG_ERR
from nabwa_tpu.refmodel.aln_scalar import cal_maxdiff
from nabwa_tpu.ops.dfs import unpack_result

WORK = pathlib.Path("/tmp/nabwa_bench64")
n_reads = int(os.environ.get("NREADS", "2048"))
S = int(os.environ.get("SCAP", "256"))

reads = fastq.read_fastq_batch(
    fastq.iter_fastq(str(WORK / "r.fq")), 1 << 22)[:n_reads]
idx = BwaIndex.load(str(WORK / "g.fa"))
opt = GapOpt()
eng = AlnEngine(idx, opt, use_pallas=True, stack_cap=S)
max_len = max(r.len for r in reads)
local = copy.copy(opt)
local.max_diff = cal_maxdiff(max_len, BWA_AVG_ERR, opt.fnr)
if local.max_diff < local.max_gapo:
    local.max_gapo = local.max_diff
tab = _maxdiff_table(opt.fnr, max(max_len, 64))
maxdiff = np.array([tab[r.len] for r in reads], dtype=np.int32)
results = [None] * len(reads)
print("tiers: mxu", eng._pal_mxu, "hbm", eng._pal_hbm)

BB = eng.PALLAS_BB
for rep in range(3):
    t0 = time.time()
    ctx = eng._run_device(reads, maxdiff, local, results, 0, max_len,
                          dispatch_only=True)
    ctx["out"].block_until_ready()
    dt = time.time() - t0
    out = unpack_result(np.asarray(ctx["out"]), ctx["hits_cap"])
    fin = out["fin"] if "fin" in out else None
    print(f"run {rep}: {dt:.3f}s  {len(reads)/dt:.0f} reads/s")

# per-block stats from the packed summ columns
packed = np.asarray(ctx["out"])
H = ctx["hits_cap"]
fin = packed[:, 4 * H + 3]
iters = packed[:, 4 * H + 4]
ovf = packed[:, 4 * H + 2]
nblk = len(fin) // BB
tot_live = 0
tot_slots = 0
for b in range(nblk):
    f = fin[b * BB:(b + 1) * BB].astype(np.int64)
    it = int(iters[b * BB])
    tot_live += int(f.sum())
    tot_slots += it * BB
    if b < 6:
        print(f"block {b}: iters={it} fin p50={int(np.median(f))} "
              f"p90={int(np.percentile(f, 90))} max={int(f.max())} "
              f"live={f.sum()/(it*BB):.3f}")
print(f"TOTAL: blocks={nblk} avg_liveness={tot_live/tot_slots:.3f} "
      f"(refill upper bound {tot_slots/tot_live:.2f}x) "
      f"ovf={int((ovf != 0).sum())}")
