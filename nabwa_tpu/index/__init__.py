from .fmindex import BwaIndex, FmIndex
from .build import build_index
