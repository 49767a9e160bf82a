from .frequencies import get_frequencies
from .kmers import get_kmers
from .chunks import get_chunks
from .tree_ops import divide_tree, get_distances, scale_tree
