import os

import numpy as np
import pytest

from kf2vecfsw_tpu.tree import parse_newick, read_tree_newick, leaf_distance_matrix
from kf2vecfsw_tpu.tree.cluster import assign_clades, sum_branch_clusters
from kf2vecfsw_tpu.tree.distance import read_di_mtrx, reindex_matrix, write_di_mtrx


def test_newick_roundtrip():
    s = "((A:0.1,B:0.2)ab:0.5,(C:0.3,D:0.4):0.6);"
    t = parse_newick(s)
    assert t.leaf_labels() == ["A", "B", "C", "D"]
    assert t.write_newick() == s.replace(";", ";")


def test_quoted_labels_and_comments():
    t = parse_newick("('sp one':1,[note]B:2);")
    assert t.leaf_labels() == ["sp one", "B"]


def test_distance_matrix_simple():
    t = parse_newick("((A:1,B:2):3,C:4);")
    labels, d = leaf_distance_matrix(t)
    m = {l: i for i, l in enumerate(labels)}
    assert d[m["A"], m["B"]] == 3
    assert d[m["A"], m["C"]] == 8
    assert d[m["B"], m["C"]] == 9
    assert np.allclose(d, d.T) and np.all(np.diag(d) == 0)


def test_diameter_and_scale():
    t = parse_newick("((A:1,B:2):3,C:4);")
    assert t.diameter() == 9
    t.scale_edges(10)
    assert t.diameter() == 90


def test_extract_tree_with_suppresses_unifurcations():
    t = parse_newick("(((A:1,B:1):1,C:1):1,D:1);")
    sub = t.extract_tree_with({"A", "B"})
    labels, d = leaf_distance_matrix(sub)
    assert sorted(labels) == ["A", "B"]
    assert d.max() == 2


def test_sum_branch_toy_tree(toy):
    t = read_tree_newick(os.path.join(toy, "train_tree_newick", "train_tree.nwk"))
    for n in t.traverse_postorder():
        if n.label is not None:
            n.edge_length = 1.0
    clusters = sum_branch_clusters(t, 4)
    clades = dict(assign_clades(clusters))
    golden = {}
    with open(os.path.join(toy, "train_tree_newick", "train_tree.subtrees")) as f:
        next(f)
        for line in f:
            g, c = line.split()
            golden[g] = int(c)
    assert clades == golden


def test_distance_matrix_toy_goldens(toy):
    t = read_tree_newick(os.path.join(toy, "train_tree_newick", "train_tree.nwk"))
    # full tree golden (single-clade fixture covers the whole tree)
    labels, d = leaf_distance_matrix(t)
    rl, cl, v = read_di_mtrx(
        os.path.join(toy, "train_tree_newick_single_clade", "train_tree_subtree_0.di_mtrx")
    )
    assert np.abs(d - reindex_matrix(rl, cl, v, labels)).max() == 0.0
    # per-subtree goldens
    for c, members in [
        (0, {"G000830275", "G000402355"}),
        (1, {"G000830295", "G001871415", "G001940645"}),
    ]:
        sub = t.extract_tree_with(members)
        sl, sd = leaf_distance_matrix(sub)
        rl, cl, v = read_di_mtrx(
            os.path.join(toy, "train_tree_newick", f"train_tree_subtree_{c}.di_mtrx")
        )
        assert np.abs(sd - reindex_matrix(rl, cl, v, sl)).max() == 0.0


def test_scaled_newick_matches_golden(toy):
    t = read_tree_newick(os.path.join(toy, "train_tree_newick", "train_tree.nwk"))
    t.scale_edges(100.0)
    golden = open(os.path.join(toy, "train_tree_newick", "train_tree_r100.0.nwk")).read().strip()
    assert t.write_newick() == golden


def test_di_mtrx_roundtrip(tmp_path):
    t = parse_newick("((A:0.15,B:0.25):0.3,C:0.4);")
    labels, d = leaf_distance_matrix(t)
    p = str(tmp_path / "x.di_mtrx")
    write_di_mtrx(p, labels, d)
    rl, cl, v = read_di_mtrx(p)
    assert rl == labels and cl == labels
    assert np.array_equal(v, d)


def test_deep_pectinate_tree_no_recursion_limit():
    """Ladder trees deeper than Python's recursion limit must parse, write,
    extract and scale (iterative tree ops; a 12000-taxon phylogeny can be
    arbitrarily unbalanced)."""
    from kf2vecfsw_tpu.tree.newick import parse_newick

    depth = 4000
    nwk = ""
    for i in range(depth):
        nwk = f"(L{i}:1.0" + ("," + nwk + ":1.0)" if nwk else f",L{depth}:1.0)")
    nwk += ";"
    t = parse_newick(nwk)
    labels = t.leaf_labels()
    assert len(labels) == depth + 1
    roundtrip = parse_newick(t.write_newick())
    assert sorted(roundtrip.leaf_labels()) == sorted(labels)
    sub = t.extract_tree_with(set(labels[:100]))
    assert len(sub.leaf_labels()) == 100


def test_trailing_content_after_first_tree_ignored():
    # a multi-tree file (or stray ';') must parse the FIRST tree and ignore
    # the rest, like treeswift's parsers — the iterative loop previously hung
    t = parse_newick("(A:1,B:2);(C:3,D:4);")
    assert sorted(t.leaf_labels()) == ["A", "B"]
    t2 = parse_newick("(A,B); trailing garbage")
    assert sorted(t2.leaf_labels()) == ["A", "B"]


def _random_binary_tree(rng, n_leaves, unit_edges=True):
    """Random binary tree via sequential leaf attachment."""
    from kf2vecfsw_tpu.tree.newick import Node, Tree

    nodes = [Node(f"L0", 1.0), Node(f"L1", 1.0)]
    root = Node(None, None, nodes[:2])
    for c in nodes:
        c.parent = root
    leaves = list(nodes)
    for i in range(2, n_leaves):
        target = leaves[int(rng.integers(0, len(leaves)))]
        newleaf = Node(f"L{i}", 1.0)
        inner = Node(None, target.edge_length)
        parent = target.parent
        parent.children[parent.children.index(target)] = inner
        inner.parent = parent
        target.edge_length = 1.0
        inner.children = [target, newleaf]
        target.parent = inner
        newleaf.parent = inner
        leaves.append(newleaf)
    if not unit_edges:
        for nd in Tree(root).traverse_postorder():
            if nd.edge_length is not None:
                nd.edge_length = float(rng.random()) * 2.0
    return Tree(root)


def _cluster_branch_sum(tree, cluster):
    """Total branch length of the subtree induced by the cluster's leaves
    (sum of edges strictly below the cluster's LCA-rooted extracted tree)."""
    sub = tree.extract_tree_with(set(cluster))
    total = 0.0
    for nd in sub.traverse_postorder():
        if nd is not sub.root and nd.edge_length:
            total += nd.edge_length
    return total


@pytest.mark.parametrize("seed,n,unit", [(0, 100, True), (1, 300, True), (2, 100, False), (3, 500, True), (4, 1000, True)])
def test_sum_branch_threshold_invariant_random_trees(seed, n, unit):
    """Every emitted cluster's internal branch-length sum must respect the
    threshold (the sum_branch mode's contract), clusters must partition the
    leaves, and the result must be deterministic — on random 100-1000 leaf
    trees at several thresholds."""
    from kf2vecfsw_tpu.tree.cluster import sum_branch_clusters

    rng = np.random.default_rng(seed)
    t = _random_binary_tree(rng, n, unit_edges=unit)
    all_leaves = sorted(t.leaf_labels())
    for thr in (2.0, 4.0, 10.0, 30.0):
        clusters = sum_branch_clusters(t, thr)
        got = sorted(x for c in clusters for x in c)
        assert got == all_leaves  # partition: every leaf exactly once
        for c in clusters:
            if len(c) > 1:
                assert _cluster_branch_sum(t, c) <= thr + 1e-9, (thr, len(c))
        assert clusters == sum_branch_clusters(t, thr)


def test_sum_branch_cuts_both_children_when_both_exceed():
    """A node whose two child subtrees BOTH exceed the threshold must cut
    both (a single cut would pass an over-threshold total upward and a later
    cut would emit a violating cluster)."""
    from kf2vecfsw_tpu.tree.cluster import sum_branch_clusters

    # two balanced 8-leaf unit subtrees under the root: each side's internal
    # sum is 8*1 + 4 + 2 = 14 edges = 14.0 > threshold 10; together 30
    def balanced(prefix, depth):
        from kf2vecfsw_tpu.tree.newick import Node

        if depth == 0:
            return Node(prefix, 1.0)
        left = balanced(prefix + "0", depth - 1)
        right = balanced(prefix + "1", depth - 1)
        nd = Node(None, 1.0, [left, right])
        left.parent = right.parent = nd
        return nd

    from kf2vecfsw_tpu.tree.newick import Node, Tree

    l = balanced("A", 3)
    r = balanced("B", 3)
    root = Node(None, None, [l, r])
    l.parent = r.parent = root
    t = Tree(root)
    clusters = sum_branch_clusters(t, 10.0)
    for c in clusters:
        if len(c) > 1:
            assert _cluster_branch_sum(t, c) <= 10.0 + 1e-9, c


def test_sum_branch_ambiguity_never_fires_at_reference_regime():
    """divide_tree's regime (unit edges, threshold 2*850): the
    both-children-over-threshold case requires both post-cut child totals
    within one edge length of the threshold — measured ZERO occurrences on
    random-attachment and balanced unit-edge trees up to 16k leaves, so the
    default (cut-until-under) and -tc_single_cut (upstream TreeCluster)
    modes produce identical partitions."""
    from kf2vecfsw_tpu.tree.cluster import sum_branch_clusters

    for seed, n in [(0, 4096), (1, 8192)]:
        t = _random_binary_tree(np.random.default_rng(seed), n)
        stats = {}
        multi = sum_branch_clusters(t, 1700.0, stats=stats)
        assert stats["ambiguous_nodes"] == 0
        assert multi == sum_branch_clusters(t, 1700.0, single_cut=True)


def test_sum_branch_single_cut_diverges_only_on_ambiguous_nodes():
    """When the ambiguous case does fire (only reachable when threshold is
    O(edge length), far below any real -size), the single-cut mode mirrors
    upstream by propagating the over-threshold remainder — which can emit
    clusters violating the branch-sum contract; the default never does."""
    from kf2vecfsw_tpu.tree.cluster import sum_branch_clusters

    rng = np.random.default_rng(100)
    t = _random_binary_tree(rng, 3184, unit_edges=False)  # edges ~ U[0,2)
    stats = {}
    multi = sum_branch_clusters(t, 5.0, stats=stats)
    assert stats["ambiguous_nodes"] > 0  # the case fires at this scale
    single = sum_branch_clusters(t, 5.0, single_cut=True)
    assert multi != single
    # default keeps the contract on every cluster
    for c in multi:
        if len(c) > 1:
            assert _cluster_branch_sum(t, c) <= 5.0 + 1e-9
    # both modes still partition the leaves exactly
    all_leaves = sorted(t.leaf_labels())
    assert sorted(x for c in single for x in c) == all_leaves
    # measured across a 40-tree x 5-threshold sweep: single-cut's propagated
    # over-threshold remainder never produced a cluster whose INDUCED branch
    # sum violates the contract (the live total overcounts by the edges
    # toward already-cut subtrees), so the divergence is partition-shape
    # only — still a real artifact difference, hence the warning + flag
