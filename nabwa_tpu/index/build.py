"""`index` pipeline: FASTA → the eight reference-compatible index files
(.pac .rpac .ann .amb .bwt .rbwt .sa .rsa), mirroring bwa_index
(bwtindex.c:42-192)."""

import os

import numpy as np

from . import pack as packmod
from . import sa as samod
from . import formats
from ..constants import SA_INTERVAL

# Above this length the blockwise incremental builder replaces SA-IS:
# the reference makes the same switch at 50 Mbp (`-a is` -> `-a bwtsw`,
# bwtindex.c:107,176) for the same reason — the full suffix array does
# not fit in sane RAM at genome scale (8+ B/char vs ~0.65 B/char).
BWT_INC_THRESHOLD = 50_000_000


def _build_one(codes, prefix, ext_bwt, ext_sa, sa_intv):
    env = os.environ.get("NABWA_BWT_INC")
    if env is None:
        use_inc = len(codes) > BWT_INC_THRESHOLD
    else:
        v = env.strip().lower()
        if v in ("1", "true", "yes", "on"):
            use_inc = True
        elif v in ("", "0", "false", "no", "off"):
            use_inc = False
        else:
            import sys
            print(f"[index] NABWA_BWT_INC={env!r} not understood "
                  f"(use 0/1); using size-based default", file=sys.stderr)
            use_inc = len(codes) > BWT_INC_THRESHOLD
    inc = None
    if use_inc:
        from . import native as native_mod
        block = int(os.environ.get("NABWA_BWT_INC_BLOCK", "0"))
        inc = native_mod.bwt_inc_native(codes, block)
    if inc is not None:
        bwt, primary = inc
        counts = np.zeros(4, dtype=np.int64)
        CH = 1 << 26
        for lo in range(0, len(codes), CH):
            counts += np.bincount(codes[lo:lo + CH], minlength=4)[:4]
        l2 = np.zeros(5, dtype=np.uint32)
        l2[1:] = np.cumsum(counts)
        words = samod.pack_bwt_words(bwt)
        inter = samod.interleave_occ(words, bwt, len(codes))
        del bwt, words
        formats.write_bwt(str(prefix) + ext_bwt, primary, l2, inter)
        # no suffix array exists on this path: the sampled SA comes from
        # the invPsi walk over the finished BWT, exactly like the
        # reference's separate `bwtsw2 -> bwt2sa` step (bwtmisc.c:154-176)
        sa_samp = samod.cal_sa_from_bwt(inter, primary, l2, len(codes),
                                        sa_intv)
        formats.write_sa(str(prefix) + ext_sa, primary, l2, sa_samp,
                         len(codes), sa_intv)
        return
    # chunked derivations: the suffix array (8 B/char) is freed before
    # the interleave/sample staging allocates
    bwt, primary, l2, sa_samp = samod.bwt_and_sample_from_codes(
        codes, sa_intv)
    words = samod.pack_bwt_words(bwt)
    inter = samod.interleave_occ(words, bwt, len(codes))
    del bwt, words
    formats.write_bwt(str(prefix) + ext_bwt, primary, l2, inter)
    formats.write_sa(str(prefix) + ext_sa, primary, l2, sa_samp,
                     len(codes), sa_intv)


def build_index(fa_path, prefix=None, sa_intv=SA_INTERVAL, color=False):
    """Build all index files.  Returns the BntSeq metadata.

    color=True mirrors `bwa index -c` (bwtindex.c:86-102): the FASTA
    packs to prefix.nt.{pac,ann,amb}, pac2cspac derives the color-space
    pac (+ copied ann/amb) at `prefix`, and the BWT chain runs on the
    color sequence."""
    if prefix is None:
        prefix = fa_path
    if color:
        nt_prefix = str(prefix) + ".nt"
        bns, _ = packmod.fasta_to_pac(fa_path, nt_prefix)
        bns, codes = packmod.pac2cspac(nt_prefix, prefix)
    else:
        bns, codes = packmod.fasta_to_pac(fa_path, prefix)
    if bns.l_pac > 0xFFFFFFFF:
        raise ValueError("references over 4GB not supported (bwtint_t is "
                         "uint32, bwtindex.c:103-105)")
    big = bns.l_pac > BWT_INC_THRESHOLD
    if big:
        # big genomes: swap the anonymous 1 B/char codes for the
        # read_pac memmap cache, and never hold both strands' codes at
        # once — at 3 Gbp the old flow kept 6 GB of anonymous code
        # arrays alive through both strand builds (the reference builds
        # human in ~2.5 GB, bwa.txt:374-376)
        del codes
        codes = packmod.read_pac(str(prefix) + ".pac")
    _build_one(codes, prefix, ".bwt", ".sa", sa_intv)
    del codes
    rcodes = packmod.reverse_pac(prefix, as_memmap=big)
    _build_one(rcodes, prefix, ".rbwt", ".rsa", sa_intv)
    return bns
