"""kf2vecfsw-tpu: TPU-native alignment-free phylogenetic placement framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of kf2vecFSW
(k-mer frequency -> embedding -> placement distance matrices):

- in-repo canonical k-mer counting engine (replaces the Jellyfish binary)
  with an MXU-histogram Pallas kernel and multi-chip sharded counting,
- host tree toolkit (newick, patristic distance matrices, sum_branch
  clustering; replaces treeswift + TreeCluster),
- jitted, ICI-sharded training engines for the subtree classifier and the
  per-subtree distance-embedding models (dense, chunked-streaming and
  Fourier Sliced-Wasserstein variants),
- blocked batch inference producing APPLES-compatible placement inputs.

File formats (.kf, .subtrees, .di_mtrx, classes.out, embeddings/distortions
CSVs, apples_input matrices) are byte/tolerance compatible with the
reference so downstream tooling (APPLES, gappa) keeps working.
"""

__version__ = "0.1.0"
