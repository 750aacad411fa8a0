"""Chunk-lease scheduler: redelivery, dedup and ordering invariants (the
mux protocol checks of bam2bam.c:1507-1650 re-expressed for chunk leases)."""

import random
import threading
import time

import pytest

from nabwa_tpu.parallel.scheduler import ChunkScheduler, run_distributed


def test_happy_path_ordering():
    chunks = list(range(50))
    results, sched = run_distributed(
        chunks, lambda cid, payload: payload * 2, n_workers=8,
        lease_timeout=5.0)
    assert results == [c * 2 for c in chunks]
    assert sched.total_dups == 0
    assert sched.finished


def test_redelivery_on_worker_loss():
    """Workers that silently drop ~30% of chunks (crash mid-work): every
    chunk must still complete exactly once via lease reissue."""
    chunks = list(range(40))
    rng = random.Random(7)
    drop_lock = threading.Lock()
    dropped_once = set()

    def wrapper(wid, fn):
        def wrapped(cid, payload):
            with drop_lock:
                first = cid not in dropped_once
                if first and rng.random() < 0.3:
                    dropped_once.add(cid)
                    return None  # vanish: lease must expire and re-issue
            return fn(cid, payload)
        return wrapped

    results, sched = run_distributed(
        chunks, lambda cid, p: p + 100, n_workers=6, lease_timeout=0.2,
        worker_wrapper=wrapper)
    assert results == [c + 100 for c in chunks]
    assert sched.total_resends >= len(dropped_once) > 0


def test_duplicate_results_dropped():
    """Slow duplicate completions (the redelivered copy finishing after
    the original) are counted and dropped — first copy wins."""
    chunks = list(range(30))
    slow = set(range(0, 30, 5))

    def wrapper(wid, fn):
        def wrapped(cid, payload):
            if cid in slow:
                time.sleep(0.35)  # beyond the lease; a twin will also run
            return fn(cid, payload)
        return wrapped

    results, sched = run_distributed(
        chunks, lambda cid, p: ("r", p), n_workers=6, lease_timeout=0.15,
        worker_wrapper=wrapper)
    assert results == [("r", c) for c in chunks]
    assert sched.total_dups > 0 or sched.total_resends > 0


def test_windowed_in_order_release():
    sched = ChunkScheduler(10, lease_timeout=10.0, window=4)
    first = [sched.acquire() for _ in range(4)]
    assert first == [0, 1, 2, 3]
    # window full, no expiries -> nothing to hand out
    assert sched.acquire(now=time.monotonic()) is None
    # completing out of order releases nothing until chunk 0 lands
    sched.complete(2, "c2")
    assert sched.release_ready() == []
    sched.complete(0, "c0")
    assert sched.release_ready() == [(0, "c0")]
    sched.complete(1, "c1")
    assert sched.release_ready() == [(1, "c1"), (2, "c2")]
    # window slides
    assert sched.acquire() == 4


def test_poison_chunk_aborts_with_backoff():
    """A deterministically failing chunk must not hot-spin: fail() re-issues
    with exponential backoff and the pass aborts after max_attempts instead
    of retrying forever (ADVICE r3: previously deadline=0.0 → 100% CPU spin)."""
    import pytest

    attempts = []

    def work(cid, payload):
        if cid == 3:
            attempts.append(time.monotonic())
            raise ValueError("poison")
        return payload

    t0 = time.monotonic()
    with pytest.raises(RuntimeError, match="chunk 3 failed"):
        run_distributed(list(range(6)), work, n_workers=2,
                        lease_timeout=60.0, max_attempts=5)
    elapsed = time.monotonic() - t0
    assert len(attempts) == 5
    # backoff actually spaced the retries out (not a hot spin):
    # delays 0.05+0.1+0.2+0.4 ≈ 0.75s minimum
    assert elapsed > 0.5


def test_fail_backoff_delays_reissue():
    sched = ChunkScheduler(2, lease_timeout=60.0)
    now = 100.0
    cid = sched.acquire(now=now)
    assert cid == 0
    sched.fail(0, now=now)
    # not yet re-issuable before the backoff delay
    assert sched.acquire(now=now + 0.01) == 1  # fresh chunk still flows
    assert sched.acquire(now=now + 0.01) is None
    assert sched.acquire(now=now + 0.06) == 0


def test_streaming_producer_ordered_results():
    """Streaming mode (bam2bam's overlapped input read): chunks appear
    while workers run; results release strictly in order; a transient
    worker failure still redelivers."""
    import threading

    fail_once = {"done": False}

    def work(cid, payload):
        if cid == 7 and not fail_once["done"]:
            fail_once["done"] = True
            raise ValueError("transient")
        return payload * 10

    applied = []

    def writer(oid, r):
        applied.append((oid, r))

    def producer(append):
        for i in range(20):
            append(i)
            if i % 5 == 0:
                time.sleep(0.02)     # workers outrun the producer

    results, sched = run_distributed(
        [], work, n_workers=3, lease_timeout=60.0, writer=writer,
        producer=producer)
    assert results == [i * 10 for i in range(20)]
    assert applied == [(i, i * 10) for i in range(20)]
    assert sched.finished


def test_streaming_producer_error_propagates():
    def work(cid, payload):
        return payload

    def producer(append):
        append(1)
        raise RuntimeError("reader died")

    with pytest.raises(RuntimeError, match="reader died"):
        run_distributed([], work, n_workers=2, lease_timeout=60.0,
                        producer=producer)
