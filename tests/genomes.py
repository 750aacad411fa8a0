"""Synthetic genome / read generators for tests (fixed seeds)."""

import numpy as np

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def random_genome(n, seed=7, n_frac=0.0, n_seqs=1, lowercase_frac=0.0):
    """Random FASTA text with optional N runs; returns (fasta_bytes, seqs)."""
    rng = np.random.default_rng(seed)
    out = []
    seqs = []
    per = n // n_seqs
    for s in range(n_seqs):
        codes = rng.integers(0, 4, size=per)
        arr = BASES[codes].copy()
        if n_frac > 0:
            n_holes = max(1, int(per * n_frac / 5))
            for _ in range(n_holes):
                start = rng.integers(0, per)
                ln = int(rng.integers(1, 10))
                arr[start:start + ln] = ord("N")
        if lowercase_frac > 0:
            m = rng.random(per) < lowercase_frac
            arr[m] |= 0x20
        seqs.append(arr.tobytes())
        out.append(b">seq%d test comment %d\n" % (s, s))
        for i in range(0, per, 70):
            out.append(arr[i:i + 70].tobytes() + b"\n")
    return b"".join(out), seqs


def sample_reads(genome_seq, n_reads, read_len, seed=42, err_rate=0.0,
                 indel_rate=0.0, revcomp=True):
    """Sample reads (FASTQ bytes) from a genome string (bytes, ACGT only)."""
    comp = dict(zip(b"ACGT", b"TGCA"))
    rng = np.random.default_rng(seed)
    g = np.frombuffer(genome_seq, dtype=np.uint8)
    lines = []
    for i in range(n_reads):
        start = int(rng.integers(0, len(g) - read_len))
        r = bytearray(g[start:start + read_len].tobytes())
        # substitutions
        if err_rate > 0:
            for j in range(read_len):
                if rng.random() < err_rate:
                    r[j] = BASES[int(rng.integers(0, 4))]
        # simple 1-base indel
        if indel_rate > 0 and rng.random() < indel_rate:
            pos = int(rng.integers(10, read_len - 10))
            if rng.random() < 0.5:
                del r[pos]
                r.append(BASES[int(rng.integers(0, 4))])
            else:
                r.insert(pos, BASES[int(rng.integers(0, 4))])
                del r[-1]
        if revcomp and rng.random() < 0.5:
            r = bytearray(comp.get(b, b) for b in reversed(r))
        qual = bytes([33 + int(q) for q in rng.integers(20, 40, read_len)])
        lines.append(b"@read%d\n%s\n+\n%s\n" % (i, bytes(r), qual))
    return b"".join(lines)
