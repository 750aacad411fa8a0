""".bwt / .sa binary file formats, bit-compatible with the reference
(bwt_dump_bwt / bwt_dump_sa / restore, bwtio.c:17-37,147-217)."""

import numpy as np

from ..constants import OCC_INTERVAL, SA_INTERVAL


def write_bwt(path, primary, l2, bwt_interleaved):
    """.bwt = primary u32, L2[1..4] u32, interleaved words (bwtio.c:17-25)."""
    with open(path, "wb") as f:
        np.asarray([primary], dtype=np.uint32).tofile(f)
        np.asarray(l2[1:5], dtype=np.uint32).tofile(f)
        np.asarray(bwt_interleaved, dtype=np.uint32).tofile(f)


def read_bwt(path):
    """Returns (primary, l2[5], bwt_interleaved, seq_len).

    The interleaved words come back as a read-only np.memmap view: loads
    are lazy (pages fault in as the search touches them) and co-located
    worker processes share one physical copy through the page cache —
    the reference's USE_MMAP loader for cluster deployments
    (bwtio.c:39-143, design notes bam2bam.c:818-843)."""
    raw = np.memmap(path, dtype=np.uint32, mode="r")
    primary = int(raw[0])
    l2 = np.zeros(5, dtype=np.uint32)
    l2[1:] = raw[1:5]
    bwt = raw[5:]
    seq_len = int(l2[4])
    # sanity check mirroring bwt_restore_bwt's size reconstruction
    n_occ = (seq_len + OCC_INTERVAL - 1) // OCC_INTERVAL + 1
    expect = ((seq_len + 15) >> 4) + 4 * n_occ
    assert len(bwt) == expect, (len(bwt), expect)
    return primary, l2, bwt, seq_len


def write_plain_bwt(path, primary, l2, words):
    """Pre-bwtupdate .bwt: primary, L2[1..4], (seq_len+15)>>4 plain 2-bit
    words — what `pac2bwt` emits before `bwtupdate` interleaves the Occ
    checkpoints (bwtmisc.c:119, bwt_dump_bwt bwtio.c:17-25)."""
    with open(path, "wb") as f:
        np.asarray([primary], dtype=np.uint32).tofile(f)
        np.asarray(l2[1:5], dtype=np.uint32).tofile(f)
        np.asarray(words, dtype=np.uint32).tofile(f)


def read_plain_bwt(path):
    """Returns (primary, l2[5], plain_words, seq_len)."""
    raw = np.fromfile(path, dtype=np.uint32)
    primary = int(raw[0])
    l2 = np.zeros(5, dtype=np.uint32)
    l2[1:] = raw[1:5]
    words = raw[5:].copy()
    seq_len = int(l2[4])
    assert len(words) == (seq_len + 15) >> 4, (len(words), seq_len)
    return primary, l2, words, seq_len


def write_sa(path, primary, l2, sa, seq_len, sa_intv=SA_INTERVAL):
    """.sa = primary, L2[1..4], sa_intv, seq_len, sa[1:] (bwtio.c:27-37)."""
    with open(path, "wb") as f:
        np.asarray([primary], dtype=np.uint32).tofile(f)
        np.asarray(l2[1:5], dtype=np.uint32).tofile(f)
        np.asarray([sa_intv, seq_len], dtype=np.uint32).tofile(f)
        np.asarray(sa[1:], dtype=np.uint32).tofile(f)


def read_sa(path):
    """Returns (sa_full_array_with_leading_-1, sa_intv).  Validates the
    header like bwt_restore_sa (bwtio.c:79-87 xasserts).  The body is a
    read-only memmap; only the leading -1 slot (bwt.c:69, never stored on
    disk) needs a one-word private page, so the copy is unavoidable —
    but it is a single sequential 1/32nd-of-genome read."""
    raw = np.memmap(path, dtype=np.uint32, mode="r")
    sa_intv = int(raw[5])
    seq_len = int(raw[6])
    n_sa = (seq_len + sa_intv) // sa_intv
    body = raw[7:]
    assert len(body) == n_sa - 1, (len(body), n_sa - 1)
    sa = np.empty(n_sa, dtype=np.uint32)
    sa[0] = np.uint32(0xFFFFFFFF)
    sa[1:] = body
    return sa, sa_intv, int(raw[0]), seq_len
