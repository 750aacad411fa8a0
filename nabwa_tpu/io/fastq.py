"""FASTQ/FASTA read input with the reference's exact preparation semantics
(bwa_read_seq, bwaseqio.c:181-251):

- base → nt4 code via nst_nt4_table
- optional Illumina-1.3 qual shift (-I), Casava filter (-Y), barcode split
  (-B), BWA-style quality trimming (-q)
- `seq`  = REVERSED read codes (searched on the reverse BWT)
- `rseq` = reversed complement (complement iff BWA_MODE_COMPREAD)
- read names lose a trailing /1 or /2
"""

import dataclasses
import gzip

import numpy as np

from ..constants import (BWA_MODE_COMPREAD, BWA_MODE_IL13, BWA_MODE_CFY,
                         BWA_MIN_RDLEN, BWA_MAX_BCLEN)
from ..index.pack import NT4

BARCODE_LOW_QUAL = 13  # bwaseqio.c:179


@dataclasses.dataclass
class Read:
    name: str
    seq: np.ndarray      # reversed nt4 codes, trimmed length (len,)
    rseq: np.ndarray     # reversed (complemented) codes, trimmed length
    qual: np.ndarray     # ascii quals (phred+33), ORIGINAL orientation, or None
    full_len: int
    clip_len: int
    full_codes: np.ndarray = None   # untrimmed nt4 codes, original orientation
    bc: str = ""

    @property
    def len(self):
        return len(self.seq)


def _open(path):
    with open(path, "rb") as f:
        gz = f.read(2) == b"\x1f\x8b"
    return gzip.open(path, "rb") if gz else open(path, "rb")


def iter_fastq(path):
    """Yield (name, comment, seq_bytes, qual_bytes_or_None)."""
    with _open(path) as f:
        while True:
            hdr = f.readline()
            if not hdr:
                return
            hdr = hdr.rstrip(b"\r\n")
            if not hdr:
                continue
            if hdr.startswith(b"@"):
                seq = f.readline().rstrip(b"\r\n")
                f.readline()  # '+'
                qual = f.readline().rstrip(b"\r\n")
                sp = hdr[1:].split(None, 1)
                yield (sp[0].decode(), sp[1].decode() if len(sp) > 1 else None,
                       seq, qual)
            elif hdr.startswith(b">"):  # FASTA
                seq_parts = []
                pos = f.tell()
                line = f.readline()
                while line and not line.startswith(b">") and not line.startswith(b"@"):
                    seq_parts.append(line.rstrip(b"\r\n"))
                    pos = f.tell()
                    line = f.readline()
                f.seek(pos)
                sp = hdr[1:].split(None, 1)
                yield (sp[0].decode(), sp[1].decode() if len(sp) > 1 else None,
                       b"".join(seq_parts), None)


def trim_read(trim_qual, codes, quals, full_len):
    """bwa_trim_read (bwaseqio.c:110-123): BWA-style partial-sum trimming.
    Returns new length."""
    if trim_qual < 1 or quals is None:
        return full_len
    s, mx, max_l = 0, 0, full_len - 1
    for l in range(full_len - 1, BWA_MIN_RDLEN - 2, -1):
        s += trim_qual - (int(quals[l]) - 33)
        if s < 0:
            break
        if s > mx:
            mx, max_l = s, l
    return max_l + 1


def read_bam_batch(reader, n_needed, which, mode=BWA_MODE_COMPREAD,
                   trim_qual=0):
    """bwa_read_bam (bwaseqio.c:125-165): pull reads from an open
    io.bam.BamReader.  which: bit1 = paired read1, bit2 = paired read2,
    bit4 = unpaired.  Reverse-strand records are restored to original
    orientation before the usual search-form preparation."""
    from .bam import BAM_FPAIRED, BAM_FREAD1, BAM_FREAD2

    is_comp = bool(mode & BWA_MODE_COMPREAD)
    out = []
    while len(out) < n_needed:
        rec = reader.read1()
        if rec is None:
            break
        fl = rec.flag
        go = (((which & 1) and (fl & BAM_FPAIRED) and (fl & BAM_FREAD1))
              or ((which & 2) and (fl & BAM_FPAIRED) and (fl & BAM_FREAD2))
              or ((which & 4) and not (fl & BAM_FPAIRED)))
        if not go:
            continue
        codes = rec.seq_nt4().copy()
        q = np.minimum(rec.quals().astype(np.int32) + 33,
                       126).astype(np.uint8)
        if fl & 0x10:   # mapped reverse: restore original orientation
            codes = np.where(codes < 4, 3 - codes, codes)[::-1] \
                .astype(np.uint8)
            q = q[::-1].copy()
        full_len = len(codes)
        ln = trim_read(trim_qual, codes, q, full_len)
        fwd = codes[:ln]
        rseq = fwd[::-1].copy()
        if is_comp:
            rseq = np.where(rseq < 4, 3 - rseq, rseq).astype(np.uint8)
        out.append(Read(name=rec.qname, seq=fwd[::-1].copy(), rseq=rseq,
                        qual=q, full_len=full_len, clip_len=ln,
                        full_codes=codes, bc=""))
    return out


def read_fastq_batch(it, n_needed, mode=BWA_MODE_COMPREAD, trim_qual=0):
    """Pull up to n_needed prepared reads from iter_fastq iterator."""
    is_comp = bool(mode & BWA_MODE_COMPREAD)
    is_64 = bool(mode & BWA_MODE_IL13)
    cfy = bool(mode & BWA_MODE_CFY)
    l_bc = (mode >> 24) & 0xFF
    if l_bc > BWA_MAX_BCLEN:
        raise ValueError("barcode too long")
    out = []
    for name, comment, seq, qual in it:
        if cfy and comment:
            ci = comment.find(":")
            if ci >= 0 and ci + 1 < len(comment) and comment[ci + 1] == "Y":
                continue
        q = np.frombuffer(qual, dtype=np.uint8).copy() if qual else None
        if is_64 and q is not None:
            q -= 31
        if len(seq) <= l_bc:
            continue
        bc = ""
        if l_bc:
            bcs = []
            for i in range(l_bc):
                low = q is not None and q[i] - 33 < BARCODE_LOW_QUAL
                ch = chr(seq[i])
                bcs.append(ch.lower() if low else ch.upper())
            bc = "".join(bcs)
            seq = seq[l_bc:]
            if q is not None:
                q = q[l_bc:]
        codes = NT4[np.frombuffer(seq, dtype=np.uint8)].astype(np.uint8)
        full_len = len(codes)
        ln = trim_read(trim_qual, codes, q, full_len) if q is not None \
            else full_len
        fwd = codes[:ln]
        rseq = fwd[::-1].copy()
        if is_comp:
            rseq = np.where(rseq < 4, 3 - rseq, rseq).astype(np.uint8)
        sname = name
        if len(sname) > 2 and sname[-2] == "/" and sname[-1] in "12":
            sname = sname[:-2]
        out.append(Read(name=sname, seq=fwd[::-1].copy(), rseq=rseq,
                        qual=q, full_len=full_len, clip_len=ln,
                        full_codes=codes, bc=bc))
        if len(out) == n_needed:
            break
    return out
