"""Scalar aln batch driver — bwa_cal_sa_reg_gap semantics (bwtaln.c:93-142).

Replicates the batch-level quirks that matter for equivalence:
- local max_diff derived from the BATCH max read length first (used to size
  the stack and, crucially, to clamp max_gapo once per batch,
  bwtaln.c:102-105), then recomputed per read (bwtaln.c:125);
- per-read seed_len = opt.seed_len if shorter than the read else INT_MAX
  (bwtaln.c:126) and seed widths over the last seed_len bases;
- widths computed on the opposite-strand BWT (bwtaln.c:123-129).
"""

import copy
import math

import numpy as np

from .dfs_scalar import match_gap
from ..constants import BWA_AVG_ERR


def cal_maxdiff(l, err, thres):
    """bwa_cal_maxdiff (bwtaln.c:37-49)."""
    elambda = math.exp(-l * err)
    esum = elambda
    y = 1.0
    x = 1
    for k in range(1, 1000):
        y *= l * err
        x *= k
        esum += elambda * y / x
        if 1.0 - esum < thres:
            return k
    return 2


def scalar_cal_width(fm, query):
    """bwt_cal_width (bwtaln.c:52-76) against a ScalarFm."""
    ln = len(query)
    w = np.zeros(ln + 1, dtype=np.uint32)
    bid = np.zeros(ln + 1, dtype=np.int64)
    k, l, cur = 0, fm.seq_len, 0
    for i in range(ln):
        c = int(query[i])
        if c < 4:
            ok = fm.occ(k - 1, c)
            ol = fm.occ(l, c)
            k = fm.L2[c] + ok + 1
            l = fm.L2[c] + ol
        if k > l or c > 3:
            k, l = 0, fm.seq_len
            cur += 1
        w[i] = l - k + 1
        bid[i] = cur
    w[ln] = 0
    bid[ln] = cur + 1
    return w, bid


def aln_batch(fms, reads, opt):
    """Run the DFS over a batch of prepared reads.  fms = (fwd, rev)
    ScalarFm pair.  Returns list of (alns, max_entries)."""
    max_len = max((r.len for r in reads), default=0)
    local = copy.copy(opt)
    if opt.fnr > 0.0:
        local.max_diff = cal_maxdiff(max_len, BWA_AVG_ERR, opt.fnr)
    if local.max_diff < local.max_gapo:
        local.max_gapo = local.max_diff
    results = []
    for r in reads:
        if r.len == 0:
            results.append(([], 0))
            continue
        seqs = (r.seq, r.rseq)
        widths = (scalar_cal_width(fms[0], r.seq),
                  scalar_cal_width(fms[1], r.rseq))
        if opt.fnr > 0.0:
            local.max_diff = cal_maxdiff(r.len, BWA_AVG_ERR, opt.fnr)
        local.seed_len = opt.seed_len if opt.seed_len < r.len else 0x7FFFFFFF
        seed_widths = None
        if r.len > opt.seed_len:
            seed_widths = (
                scalar_cal_width(fms[0], r.seq[r.len - opt.seed_len:]),
                scalar_cal_width(fms[1], r.rseq[r.len - opt.seed_len:]))
        alns, hw = match_gap(fms, r.len, seqs, widths, seed_widths, local,
                             local.max_diff, local.max_gapo)
        results.append((alns, hw))
    return results
