"""Compare the Pallas DFS kernel against the proven jnp DFS (ops.dfs)
on a random genome.  Usage:

  python scripts/compare_dfs_pallas.py cpu   # interpret mode, small
  python scripts/compare_dfs_pallas.py tpu   # real kernel on the chip
"""

import os
import sys
import time

mode = sys.argv[1] if len(sys.argv) > 1 else "cpu"

import jax

if mode == "cpu":
    jax.config.update("jax_platforms", "cpu")
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

glen = int(os.environ.get("GLEN", "60000"))
n_reads = int(os.environ.get("NREADS", "64"))
read_len = int(os.environ.get("RLEN", "75"))
err = float(os.environ.get("ERR", "0.03"))
indel = float(os.environ.get("INDEL", "0.3"))
seed = int(os.environ.get("SEED", "101"))
seed_len = int(os.environ.get("SEEDLEN", "0"))

workdir = "/tmp/cmp_dfs_pallas"
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
eng = AlnEngine(idx, opt)

# ---- build inputs exactly as AlnEngine._run_device does ----
max_len = max(r.len for r in reads)
import copy
local = copy.copy(opt)
if opt.fnr > 0.0:
    local.max_diff = cal_maxdiff(max_len, BWA_AVG_ERR, opt.fnr)
if local.max_diff < local.max_gapo:
    local.max_gapo = local.max_diff
tab = _maxdiff_table(opt.fnr, max(max_len, 64)) if opt.fnr > 0 else None
maxdiff = np.array([tab[r.len] if tab is not None else opt.max_diff
                    for r in reads], dtype=np.int32)

B = max(64, -(-len(reads) // 64) * 64)
L = max(32, -(-max_len // 32) * 32)
maxdiff = np.concatenate([maxdiff, np.zeros(B - len(reads), np.int32)])
SL = min(local.seed_len, L) if local.seed_len < 0x7FFFFFFF else L
SL = max(SL, 1)
seqs_a = np.full((B, 2, L), 4, dtype=np.int32)
lengths = np.zeros(B, dtype=np.int32)
for i, r in enumerate(reads):
    seqs_a[i, 0, :r.len] = r.seq
    seqs_a[i, 1, :r.len] = r.rseq
    lengths[i] = r.len
has_seed = lengths > local.seed_len if local.seed_len < 0x7FFFFFFF \
    else np.zeros(B, dtype=bool)
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
    indel_end_skip=local.indel_end_skip, max_del_occ=local.max_del_occ,
    max_entries=local.max_entries, max_top2=local.max_top2,
    max_seed_diff=local.max_seed_diff, seed_len=local.seed_len,
    mode=local.mode)

S = int(os.environ.get("SCAP", "256"))
H = 32

t0 = time.time()
ref_out = aln_device_step(
    eng.bwt_cat, eng.bwt_fwd, eng.bwt_rev, eng.rev_off,
    eng.primary_fwd, eng.primary_rev, eng.l2, eng.seq_len,
    jnp.asarray(seqs_a), jnp.asarray(lengths), jnp.asarray(sseq),
    jnp.asarray(slen), jnp.asarray(has_seed), jnp.asarray(maxdiff),
    stack_cap=S, hits_cap=H, max_iters=200000, **statics)
ref_np = np.asarray(ref_out)
print(f"jnp DFS done in {time.time()-t0:.1f}s")

# ---- pallas ----
table, rev_row0 = dfs_pallas.build_table(
    np.asarray(eng.bwt_cat), eng.rev_off)
print(f"table rows={table.shape[0]} bytes={table.nbytes}")
MXU = os.environ.get("MXU", "1") == "1"
if MXU:
    table = dfs_pallas.build_table_i8(table)
params = dfs_pallas.build_params(np.asarray(eng.l2), eng.primary_fwd,
                                 eng.primary_rev, eng.seq_len, rev_row0)
BB = int(os.environ.get("BB", "8" if mode == "cpu" else "256"))
if B % BB:
    BB = B
t0 = time.time()
pal_out = dfs_pallas.aln_device_step_pallas(
    jnp.asarray(table), jnp.asarray(params), eng.bwt_fwd, eng.bwt_rev,
    eng.rev_off, eng.primary_fwd, eng.primary_rev, eng.l2, eng.seq_len,
    jnp.asarray(seqs_a), jnp.asarray(lengths), jnp.asarray(sseq),
    jnp.asarray(slen), jnp.asarray(has_seed), jnp.asarray(maxdiff),
    stack_cap=S, hits_cap=H, max_iters=200000, BB=BB,
    interpret=(mode == "cpu"), mxu=MXU, **statics)
pal_np = np.asarray(pal_out)
print(f"pallas DFS done in {time.time()-t0:.1f}s")

ref_u = unpack_result(ref_np, H)
pal_u = unpack_result(pal_np, H)

bad = 0
for i in range(len(reads)):
    ro, po = bool(ref_u["overflow"][i]), bool(pal_u["overflow"][i])
    if ro or po:
        if ro != po:
            print(f"read {i}: overflow mismatch ref={ro} pal={po}")
            bad += 1
        continue
    rn, pn = int(ref_u["n_aln"][i]), int(pal_u["n_aln"][i])
    ok = rn == pn
    if ok:
        for h in range(rn):
            for f in ("hit_meta", "hit_k", "hit_l", "hit_score"):
                if ref_u[f][i, h] != pal_u[f][i, h]:
                    ok = False
    if not ok:
        bad += 1
        if bad <= 5:
            print(f"read {i}: MISMATCH")
            print("  ref:", [(int(ref_u['hit_meta'][i, h]),
                              int(ref_u['hit_k'][i, h]),
                              int(ref_u['hit_l'][i, h]),
                              int(ref_u['hit_score'][i, h]))
                             for h in range(rn)])
            print("  pal:", [(int(pal_u['hit_meta'][i, h]),
                              int(pal_u['hit_k'][i, h]),
                              int(pal_u['hit_l'][i, h]),
                              int(pal_u['hit_score'][i, h]))
                             for h in range(pn)])
    if ref_u["hw"][i] != pal_u["hw"][i] and not (ro or po):
        print(f"read {i}: hw ref={ref_u['hw'][i]} pal={pal_u['hw'][i]}")
ovf_r = int(np.sum(ref_u["overflow"][:len(reads)]))
ovf_p = int(np.sum(pal_u["overflow"][:len(reads)]))
print(f"reads={len(reads)} mismatches={bad} ovf ref={ovf_r} pal={ovf_p}")
print("PASS" if bad == 0 else "FAIL")
