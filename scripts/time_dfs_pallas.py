"""Time the pallas DFS vs the jnp DFS on the real chip (warm cache).

Reuses the compare harness inputs; prints reads/s for each engine.
"""

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
from nabwa_tpu.ops.dfs import aln_device_step, unpack_result
from nabwa_tpu.ops import dfs_pallas
from nabwa_tpu.constants import BWA_AVG_ERR
from nabwa_tpu.refmodel.aln_scalar import cal_maxdiff
import copy

glen = int(os.environ.get("GLEN", "2000000"))
n_reads = int(os.environ.get("NREADS", "2048"))
read_len = int(os.environ.get("RLEN", "100"))
err = float(os.environ.get("ERR", "0.01"))
seed = int(os.environ.get("SEED", "7"))
S = int(os.environ.get("SCAP", "256"))
BB = int(os.environ.get("BB", "256"))
H = int(os.environ.get("HCAP", "32"))
which = os.environ.get("WHICH", "both")
MAXIT = int(os.environ.get("MAXIT", "200000"))

workdir = "/tmp/time_dfs_pallas"
os.makedirs(workdir, exist_ok=True)
fa_p = f"{workdir}/g_{glen}_{seed}.fa"
if not os.path.exists(fa_p + ".bwt"):
    fa, seqs = genomes.random_genome(glen, seed=seed)
    open(fa_p, "wb").write(fa)
    build_index(fa_p, fa_p)
else:
    seqs = None
idx = BwaIndex.load(fa_p)
if seqs is None:
    fa, seqs = genomes.random_genome(glen, seed=seed)
fq = genomes.sample_reads(seqs[0], n_reads, read_len, seed=seed + 1,
                          err_rate=err, indel_rate=0.1)
open(f"{workdir}/r.fq", "wb").write(fq)
reads = fastq.read_fastq_batch(fastq.iter_fastq(f"{workdir}/r.fq"), 1 << 22)

opt = GapOpt()
eng = AlnEngine(idx, opt)

max_len = max(r.len for r in reads)
local = copy.copy(opt)
if opt.fnr > 0.0:
    local.max_diff = cal_maxdiff(max_len, BWA_AVG_ERR, opt.fnr)
if local.max_diff < local.max_gapo:
    local.max_gapo = local.max_diff
tab = _maxdiff_table(opt.fnr, max(max_len, 64)) if opt.fnr > 0 else None
maxdiff = np.array([tab[r.len] if tab is not None else opt.max_diff
                    for r in reads], dtype=np.int32)
B = len(reads)
L = max(32, -(-max_len // 32) * 32)
seqs_a = np.full((B, 2, L), 4, dtype=np.int32)
lengths = np.zeros(B, dtype=np.int32)
for i, r in enumerate(reads):
    seqs_a[i, 0, :r.len] = r.seq
    seqs_a[i, 1, :r.len] = r.rseq
    lengths[i] = r.len
has_seed = np.zeros(B, dtype=bool)
sseq = seqs_a[:, :, :1].copy()
slen = np.zeros(B, dtype=np.int32)

statics = dict(
    s_mm=local.s_mm, s_gapo=local.s_gapo, s_gape=local.s_gape,
    max_gape=local.max_gape, max_gapo=local.max_gapo,
    indel_end_skip=local.indel_end_skip, max_del_occ=local.max_del_occ,
    max_entries=local.max_entries, max_top2=local.max_top2,
    max_seed_diff=local.max_seed_diff, seed_len=local.seed_len,
    mode=local.mode)


def run_jnp():
    return aln_device_step(
        eng.bwt_cat, eng.bwt_fwd, eng.bwt_rev, eng.rev_off,
        eng.primary_fwd, eng.primary_rev, eng.l2, eng.seq_len,
        jnp.asarray(seqs_a), jnp.asarray(lengths), jnp.asarray(sseq),
        jnp.asarray(slen), jnp.asarray(has_seed), jnp.asarray(maxdiff),
        stack_cap=S, hits_cap=H, max_iters=MAXIT, **statics)


table, rev_row0 = dfs_pallas.build_table(np.asarray(eng.bwt_cat), eng.rev_off)
HBM = os.environ.get("HBM", "0") == "1"
MXU = (not HBM) and os.environ.get("MXU", "1") == "1"
if MXU:
    table = dfs_pallas.build_table_i8(table)
params = dfs_pallas.build_params(np.asarray(eng.l2), eng.primary_fwd,
                                 eng.primary_rev, eng.seq_len, rev_row0)
table_d = jnp.asarray(table)
params_d = jnp.asarray(params)


def run_pal():
    return dfs_pallas.aln_device_step_pallas(
        table_d, params_d, eng.bwt_fwd, eng.bwt_rev, eng.rev_off,
        eng.primary_fwd, eng.primary_rev, eng.l2, eng.seq_len,
        jnp.asarray(seqs_a), jnp.asarray(lengths), jnp.asarray(sseq),
        jnp.asarray(slen), jnp.asarray(has_seed), jnp.asarray(maxdiff),
        stack_cap=S, hits_cap=H, max_iters=MAXIT, BB=BB, mxu=MXU,
        hbm=HBM, **statics)


for name, fn in (("jnp", run_jnp), ("pallas", run_pal)):
    if which not in ("both", name):
        continue
    out = fn()
    out.block_until_ready()     # compile + first run
    t0 = time.time()
    out = fn()
    out.block_until_ready()
    dt = time.time() - t0
    u = unpack_result(np.asarray(out), H)
    ovf = int(np.sum(u["overflow"][:n_reads]))
    iters = int(u["iters"])
    print(f"{name}: {dt:.3f}s  {n_reads/dt:.0f} reads/s  "
          f"ovf={ovf}/{n_reads}  iters={iters}  "
          f"{dt/max(iters,1)*1e6:.1f}us/iter")
