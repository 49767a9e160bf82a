from .newick import Node, Tree, parse_newick, read_tree_newick
from .distance import leaf_distance_matrix
from .cluster import sum_branch_clusters
