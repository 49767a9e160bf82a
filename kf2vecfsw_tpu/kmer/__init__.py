from .vocab import (
    canonical_vocab_codes,
    canonical_vocab_size,
    codes_to_strings,
    revcomp_codes,
    low_complexity_mask,
)
from .counter import KmerCounter, count_canonical_numpy, window_codes_numpy
