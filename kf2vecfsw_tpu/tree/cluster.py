"""sum_branch tree clustering (in-repo TreeCluster replacement).

The reference shells out to ``TreeCluster.py -m sum_branch -t 2*size``
(main.py:217) after setting every *labeled* node's edge length to 1.0
(main.py:203-205). sum_branch greedily partitions the leaves in postorder:
at each binary internal node, if the total branch length of the live subtree
exceeds the threshold, the heavier child subtree is cut off as a cluster.
Singleton clusters are reported as -1 (TreeCluster convention), which
divide_tree later drops (main.py:225-237).

Verified against the checked-in toy goldens
(toy_example/train_tree_newick/train_tree.subtrees and the single-clade
variant).

Semantics note: when BOTH child subtrees exceed the threshold at one node,
this implementation cuts until the node's total is under threshold (a
while-loop), which guarantees the mode's documented contract — every
cluster's internal branch-length sum <= threshold. Whether TreeCluster's
own greedy loop cuts one or both children in that case cannot be checked in
this offline environment (no TreeCluster source available); a single cut
provably lets an over-threshold total propagate upward and later emit a
contract-violating cluster, so the contract-preserving behavior is chosen.
Property tests on random trees pin the contract; the toy golden never hits
the ambiguous case.
"""

from __future__ import annotations

from .newick import Node, Tree


def sum_branch_clusters(tree: Tree, threshold: float) -> list[list[str]]:
    """Greedy postorder sum_branch clustering.

    Returns clusters in creation order (cut clusters first, the remaining
    root cluster last); each cluster is a list of leaf labels in postorder.
    """
    cut: set[int] = set()  # ids of deleted (already clustered) subtree roots
    clusters: list[list[str]] = []
    totals: dict[int, float] = {}

    def collect_leaves(node: Node) -> list[str]:
        out: list[str] = []
        stack = [node]
        while stack:
            cur = stack.pop()
            if id(cur) in cut:
                continue
            if cur.is_leaf():
                out.append(cur.label)
            else:
                stack.extend(reversed(cur.children))
        return out

    for node in tree.traverse_postorder():
        if node.is_leaf():
            totals[id(node)] = 0.0
            continue
        children = list(node.children)
        if len(children) != 2:
            raise ValueError(
                "sum_branch requires a fully resolved (binary) tree; "
                f"node has {len(children)} children"
            )
        side: list[float] = []
        for c in children:
            if id(c) in cut:
                side.append(0.0)
            else:
                length = c.edge_length or 0.0
                side.append(totals[id(c)] + max(length, 0.0))
        # cut until under threshold: when BOTH subtrees exceed it, a single
        # cut would pass an over-threshold total upward and the parent would
        # then emit a cluster whose internal branch sum violates the mode's
        # contract (possible on large unit-edge trees; a 5-leaf golden never
        # hits it)
        while side[0] + side[1] > threshold:
            heavy = 0 if side[0] > side[1] else 1
            cluster = collect_leaves(children[heavy])
            cut.add(id(children[heavy]))
            side[heavy] = 0.0
            if cluster:
                clusters.append(cluster)
        totals[id(node)] = side[0] + side[1]

    remaining = collect_leaves(tree.root)
    if remaining:
        clusters.append(remaining)
    return clusters


def assign_clades(clusters: list[list[str]]) -> list[tuple[str, int]]:
    """TreeCluster output numbering: singletons get -1, real clusters get
    1, 2, ... in cluster order; divide_tree then subtracts 1 and drops the
    (now -2) singletons (main.py:235-237). Returns (genome, clade) pairs
    *after* the divide_tree shift, singletons already dropped."""
    out: list[tuple[str, int]] = []
    num = 1
    for cluster in clusters:
        if len(cluster) == 1:
            continue  # TreeCluster -1 -> shifted -2 -> dropped
        for leaf in cluster:
            out.append((leaf, num - 1))
        num += 1
    return out
