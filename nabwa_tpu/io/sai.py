""".sai stream format, bit-compatible with the reference.

Layout (bwtaln.c:387,242-246): one raw gap_opt_t (64 B), then per read an
int32 n_aln followed by n_aln × bwt_aln1_t records.  bwt_aln1_t
(bwtaln.h:41-45) is 16 B: u32 bitfield (n_mm | n_gapo<<8 | n_gape<<16 |
a<<24), u32 k, u32 l, i32 score.
"""

import struct

import numpy as np

from ..options import GapOpt, GAP_OPT_SIZE

ALN_DTYPE = np.dtype([("meta", "<u4"), ("k", "<u4"), ("l", "<u4"),
                      ("score", "<i4")])


def pack_aln(n_mm, n_gapo, n_gape, a, k, l, score):
    rec = np.zeros(1, dtype=ALN_DTYPE)
    rec["meta"] = (n_mm & 0xFF) | ((n_gapo & 0xFF) << 8) \
        | ((n_gape & 0xFF) << 16) | ((a & 1) << 24)
    rec["k"] = k
    rec["l"] = l
    rec["score"] = score
    return rec


def write_sai(path_or_file, opt: GapOpt, per_read_alns):
    """per_read_alns: iterable of lists of dicts with n_mm/n_gapo/n_gape/a/
    k/l/score (append order preserved)."""
    own = isinstance(path_or_file, str)
    f = open(path_or_file, "wb") if own else path_or_file
    try:
        f.write(opt.pack())
        for alns in per_read_alns:
            f.write(struct.pack("<i", len(alns)))
            if alns:
                recs = np.zeros(len(alns), dtype=ALN_DTYPE)
                for i, h in enumerate(alns):
                    recs[i]["meta"] = ((h["n_mm"] & 0xFF)
                                       | ((h["n_gapo"] & 0xFF) << 8)
                                       | ((h["n_gape"] & 0xFF) << 16)
                                       | ((h["a"] & 1) << 24))
                    recs[i]["k"] = h["k"]
                    recs[i]["l"] = h["l"]
                    recs[i]["score"] = h["score"]
                f.write(recs.tobytes())
    finally:
        if own:
            f.close()


def read_sai(path):
    """Returns (GapOpt, list-of-record-arrays)."""
    with open(path, "rb") as f:
        data = f.read()
    opt = GapOpt.unpack(data[:GAP_OPT_SIZE])
    pos = GAP_OPT_SIZE
    out = []
    while pos < len(data):
        (n,) = struct.unpack_from("<i", data, pos)
        pos += 4
        recs = np.frombuffer(data, dtype=ALN_DTYPE, count=n, offset=pos)
        pos += n * ALN_DTYPE.itemsize
        out.append(recs)
    return opt, out


def aln_records_to_dicts(recs):
    return [dict(n_mm=int(r["meta"]) & 0xFF,
                 n_gapo=(int(r["meta"]) >> 8) & 0xFF,
                 n_gape=(int(r["meta"]) >> 16) & 0xFF,
                 a=(int(r["meta"]) >> 24) & 1,
                 k=int(r["k"]), l=int(r["l"]), score=int(r["score"]))
            for r in recs]
