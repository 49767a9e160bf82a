from .fasta import (
    read_sequences,
    encode_bases,
    remove_gaps,
    list_sequence_files,
    sample_name,
    SEQUENCE_EXTENSIONS,
)
from .kf import write_kf, read_kf, read_kf_files, float_repr
