"""Crash-recovery and output-discipline unit tests.

Covers the `.sai` resume scanner (_attempt_recovery vs bwtaln.c:259-297),
the no-duplicate-header guarantee on resume, corrupt-count handling, the
final_rename trailing-underscore discipline (utils.c:159-173), and the
scheduler's strictly-ordered writer releases (bam2bam.c:1551-1574).
"""

import struct
import threading
import time

from nabwa_tpu.cli import _attempt_recovery
from nabwa_tpu.options import GapOpt, GAP_OPT_SIZE
from nabwa_tpu.utils.files import final_rename
from nabwa_tpu.parallel.scheduler import run_distributed


def _rec(naln, payload=b""):
    return struct.pack("<i", naln) + payload


def _body(naln):
    return b"\x00" * (16 * naln)


def test_recovery_fresh_file(tmp_path):
    fn = tmp_path / "out.sai"
    f, skip, opt, header_needed = _attempt_recovery(str(fn))
    f.close()
    assert skip == 0 and opt is None and header_needed


def test_recovery_header_only_no_duplicate(tmp_path):
    # crash during the first chunk: complete header, zero records.  The
    # resume must NOT append a second header (ADVICE r1 high finding).
    fn = tmp_path / "out.sai"
    base = GapOpt(max_diff=7, fnr=-1.0)
    fn.write_bytes(base.pack())
    f, skip, opt, header_needed = _attempt_recovery(str(fn))
    f.close()
    assert skip == 0 and not header_needed
    assert opt.max_diff == 7
    assert fn.read_bytes() == base.pack()  # untouched, exactly one header


def test_recovery_truncates_partial_record(tmp_path):
    fn = tmp_path / "out.sai"
    good = GapOpt().pack() + _rec(2, _body(2)) + _rec(0) + _rec(1, _body(1))
    fn.write_bytes(good + _rec(3, _body(3)[:-5]))  # torn final record
    f, skip, opt, header_needed = _attempt_recovery(str(fn))
    f.close()
    assert skip == 3 and not header_needed
    assert fn.read_bytes() == good


def test_recovery_negative_count_not_counted(tmp_path):
    # negative n_aln must stop the scan without advancing past it
    # (the reference's fread loop fails out, bwtaln.c:275-277)
    fn = tmp_path / "out.sai"
    good = GapOpt().pack() + _rec(1, _body(1))
    fn.write_bytes(good + _rec(-7) + _body(4))
    f, skip, opt, header_needed = _attempt_recovery(str(fn))
    f.close()
    assert skip == 1
    assert fn.read_bytes() == good


def test_final_rename(tmp_path):
    f = tmp_path / "out.bam__"
    f.write_bytes(b"x")
    final_rename("t", str(f))
    assert not f.exists()
    assert (tmp_path / "out.bam").read_bytes() == b"x"
    # no trailing underscore: untouched
    g = tmp_path / "plain.bam"
    g.write_bytes(b"y")
    final_rename("t", str(g))
    assert g.read_bytes() == b"y"
    # all-underscore name: untouched (the reference skips empty stems)
    h = tmp_path / "___"
    h.write_bytes(b"z")
    final_rename("t", str(h))
    assert h.exists()


def test_writer_strictly_ordered_under_contention():
    # slow/fast alternating chunks + many workers: writer must still see
    # 0,1,2,... (the mux's ordered-release invariant).
    order = []
    lock = threading.Lock()

    def work(cid, payload):
        time.sleep(0.02 if cid % 3 == 0 else 0.0)
        return payload * 2

    def writer(oid, r):
        with lock:
            order.append(oid)
        time.sleep(0.005 if oid % 2 else 0.0)  # widen the race window

    results, sched = run_distributed(list(range(40)), work, n_workers=8,
                                     writer=writer)
    assert order == list(range(40))
    assert results == [i * 2 for i in range(40)]
