"""End-to-end check of the HBM Pallas tier at genome scale: device-only
run_chunk timing + bit-identity vs the native engine.

  GLEN=64000000 NREADS=8192 python scripts/check_hbm_engine.py
"""

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

glen = int(os.environ.get("GLEN", "64000000"))
n_reads = int(os.environ.get("NREADS", "8192"))
read_len = int(os.environ.get("RLEN", "100"))
seed = 7
DB = int(os.environ.get("DB", "1024"))

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
from nabwa_tpu.models.aln import AlnEngine

eng = AlnEngine(idx, opt, host_frac=0.0)
print("tiers: mxu", eng._pal_mxu if eng._dev or eng._device_init() else "?",
      "hbm", eng._pal_hbm)

# compile + warm
t0 = time.time()
res = eng.run_chunk(reads[:DB], device_batch=DB)
print(f"compile+first chunk: {time.time()-t0:.2f}s")

t0 = time.time()
res = eng.run_chunk(reads, device_batch=DB)
dt = time.time() - t0
n_hit = sum(1 for a, hw in res if a)
print(f"device-only: {dt:.3f}s  {len(reads)/dt:.0f} reads/s  "
      f"hits {n_hit}/{len(reads)}")

# correctness vs native
eng2 = AlnEngine(idx, opt)
os.environ["NABWA_FORCE_NATIVE"] = "1"
t0 = time.time()
res_n = eng2.run_chunk(reads, device_batch=DB)
dtn = time.time() - t0
del os.environ["NABWA_FORCE_NATIVE"]
print(f"native 4-core: {dtn:.3f}s  {len(reads)/dtn:.0f} reads/s")
bad = 0
for i, (a, b) in enumerate(zip(res, res_n)):
    if a[0] != b[0]:
        bad += 1
        if bad <= 3:
            print(f"  mismatch at read {i}:")
            print("   dev:", a[0][:4])
            print("   nat:", b[0][:4])
print("MISMATCHES:", bad, "of", len(reads))
sys.exit(1 if bad else 0)
