"""`index` pipeline: FASTA → the eight reference-compatible index files
(.pac .rpac .ann .amb .bwt .rbwt .sa .rsa), mirroring bwa_index
(bwtindex.c:42-192)."""

import numpy as np

from . import pack as packmod
from . import sa as samod
from . import formats
from ..constants import SA_INTERVAL


def _build_one(codes, prefix, ext_bwt, ext_sa, sa_intv):
    bwt, primary, l2, sa_full = samod.bwt_from_codes(codes)
    words = samod.pack_bwt_words(bwt)
    inter = samod.interleave_occ(words, bwt, len(codes))
    formats.write_bwt(str(prefix) + ext_bwt, primary, l2, inter)
    sa_samp = samod.cal_sa_sample(sa_full, len(codes), sa_intv)
    formats.write_sa(str(prefix) + ext_sa, primary, l2, sa_samp,
                     len(codes), sa_intv)


def build_index(fa_path, prefix=None, sa_intv=SA_INTERVAL):
    """Build all index files.  Returns the BntSeq metadata."""
    if prefix is None:
        prefix = fa_path
    bns, codes = packmod.fasta_to_pac(fa_path, prefix)
    if bns.l_pac > 0xFFFFFFFF:
        raise ValueError("references over 4GB not supported (bwtint_t is "
                         "uint32, bwtindex.c:103-105)")
    rcodes = packmod.reverse_pac(prefix)
    _build_one(codes, prefix, ".bwt", ".sa", sa_intv)
    _build_one(rcodes, prefix, ".rbwt", ".rsa", sa_intv)
    return bns
