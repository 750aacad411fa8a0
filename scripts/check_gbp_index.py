"""Self-consistency check for a Gbp-scale index built by
scripts/bench_index_build.py (the reference binary cannot cross-check at
this scale in reasonable time — its own bwtsw build takes hours).

For N error-free substrings sampled from the genome: run the native DFS
(exact path) against the built .bwt/.rbwt and resolve each hit interval
to text coordinates via the sampled .sa (host invPsi walk).  Every read
must report its source position among its hits.

  WORKDIR=/tmp/nabwa_idxbuild_3000000000 N=64 python scripts/check_gbp_index.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    workdir = os.environ.get("WORKDIR", "/tmp/nabwa_idxbuild_3000000000")
    n_reads = int(os.environ.get("N", "64"))
    read_len = int(os.environ.get("RLEN", "100"))
    fa = f"{workdir}/g.fa"

    from nabwa_tpu.index.fmindex import BwaIndex
    from nabwa_tpu.index.native import dfs_match_gap_native
    from nabwa_tpu.refmodel.fm_scalar import ScalarFm
    from nabwa_tpu.io.fastq import Read
    from nabwa_tpu.options import GapOpt

    t0 = time.time()
    idx = BwaIndex.load(fa)
    print(f"[load] index loaded in {time.time()-t0:.1f}s "
          f"(l_pac={idx.fwd.seq_len})")

    # sample reads straight from the pac (2-bit codes)
    codes = idx.pac
    rng = np.random.default_rng(4321)
    starts = rng.integers(0, idx.fwd.seq_len - read_len, size=n_reads)
    reads = []
    for s in starts:
        seq = codes[s:s + read_len].astype(np.uint8)
        rev = (3 - seq)[::-1].copy()
        # backward-search convention: seq stored reversed (bwaseqio.c:234)
        reads.append(Read(name=f"r{s}", seq=seq[::-1].copy(),
                          rseq=rev[::-1].copy(), qual=None,
                          full_len=read_len, clip_len=read_len))

    opt = GapOpt()
    opt.max_diff = 0        # exact: hits must include the source locus
    opt.fnr = 0.0
    opt.max_gapo = 0
    md = np.zeros(n_reads, dtype=np.int32)
    t0 = time.time()
    res = dfs_match_gap_native(
        np.ascontiguousarray(idx.fwd.bwt, np.uint32), idx.fwd.primary,
        np.ascontiguousarray(idx.rev.bwt, np.uint32), idx.rev.primary,
        np.ascontiguousarray(idx.fwd.l2, np.uint32), idx.fwd.seq_len,
        reads, md, opt)
    assert res is not None, "native engine unavailable"
    print(f"[aln] {n_reads} exact searches in {time.time()-t0:.1f}s")

    fm_f = ScalarFm(idx.fwd.bwt, idx.fwd.primary, idx.fwd.l2,
                    idx.fwd.seq_len, idx.fwd.sa, idx.fwd.sa_intv)
    fm_r = ScalarFm(idx.rev.bwt, idx.rev.primary, idx.rev.l2,
                    idx.rev.seq_len, idx.rev.sa, idx.rev.sa_intv)

    def sa_value(fm, intv, row):
        # bwt_sa (bwt.c:72-81): invPsi walk to a sampled row
        steps = 0
        while row % intv:
            row = fm.inv_psi(row)
            steps += 1
        return (int(np.uint32(fm.sa_arr[row // intv])) + steps) & 0xFFFFFFFF
    t0 = time.time()
    n_ok = 0
    for want, (alns, hw) in zip(starts, res):
        assert alns, f"no hits for read at {want}"
        found = set()
        for h in alns:
            for row in range(h["k"], h["l"] + 1):
                if h["a"]:
                    pos = sa_value(fm_f, idx.fwd.sa_intv, row)
                else:
                    pos = idx.rev.seq_len - (sa_value(fm_r, idx.rev.sa_intv,
                                                      row) + read_len)
                found.add(pos)
        assert int(want) in found, (want, sorted(found)[:5])
        n_ok += 1
    print(f"[check] {n_ok}/{n_reads} reads map to their source locus "
          f"({time.time()-t0:.1f}s resolve)")
    print("GBP INDEX CHECK OK")


if __name__ == "__main__":
    main()
