"""FSW-family end-to-end scale demo: 64 simulated 1 Mb genomes.

Evolves genomes along a random 64-leaf phylogeny, builds the FSW library at
the CLI surface (get_kmers -> divide_tree -> get_distances ->
train_model_set), trains each clade's NeuralNetFSW BOTH with the exact
shared-sort path and with -fsw_lazy_refresh 128, then places 12 mutated
1/3-genome fragments through process_query_data and reports classification
+ nearest-backbone placement accuracy for both variants.

Usage: python - [epochs] < experiments/fsw_scale_demo.py  (from /root/repo)
"""

import os
import subprocess
import sys
import time

import numpy as np

EPOCHS = int(sys.argv[1]) if len(sys.argv) > 1 else 300
N_LEAVES = int(os.environ.get("FSW_DEMO_LEAVES", "64"))
GENOME_LEN = int(os.environ.get("FSW_DEMO_GENOME_LEN", "1000000"))
VARIANTS = os.environ.get("FSW_DEMO_VARIANTS", "lazy,exact").split(",")
BASE = os.environ.get("FSW_DEMO_DIR", "/tmp/fsw_scale_demo")


def gen_tree_and_genomes(rng):
    """Random coalescent-ish binary tree; per-edge substitution prob ~ len."""
    nodes = [{"name": f"G{i:03d}", "children": [], "bl": 0.0} for i in range(N_LEAVES)]
    pool = list(range(N_LEAVES))
    all_nodes = list(nodes)
    while len(pool) > 1:
        i, j = rng.choice(len(pool), 2, replace=False)
        if i > j:
            i, j = j, i
        a, b = pool[i], pool[j]
        parent = {"name": "", "children": [all_nodes[a], all_nodes[b]], "bl": 0.0}
        all_nodes.append(parent)
        pool[i] = len(all_nodes) - 1
        pool.pop(j)
    root = all_nodes[pool[0]]
    for n in all_nodes[:-1]:
        n["bl"] = float(rng.exponential(0.02) + 0.005)

    def newick(n):
        if not n["children"]:
            return f"{n['name']}:{n['bl']:.6f}"
        inner = ",".join(newick(c) for c in n["children"])
        return f"({inner}):{n['bl']:.6f}" if n is not root else f"({inner});"

    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    root_seq = rng.choice(bases, size=GENOME_LEN)
    leaves = {}

    def evolve(n, seq):
        if n is not root and n["bl"] > 0:
            p = min(n["bl"], 0.35)
            mask = rng.random(GENOME_LEN) < p
            seq = seq.copy()
            seq[mask] = rng.choice(bases, size=int(mask.sum()))
        if not n["children"]:
            leaves[n["name"]] = seq
        for c in n["children"]:
            evolve(c, seq)

    evolve(root, root_seq)
    return newick(root), leaves


def sh(cmd, **kw):
    t0 = time.time()
    r = subprocess.run(cmd, shell=True, capture_output=True, text=True, **kw)
    if r.returncode != 0:
        print(r.stdout[-2000:], r.stderr[-2000:])
        raise SystemExit(f"FAILED: {cmd}")
    return time.time() - t0


def main():
    rng = np.random.default_rng(42)
    os.makedirs(BASE, exist_ok=True)
    fna = os.path.join(BASE, "fna")
    if not os.path.isdir(fna) or len(os.listdir(fna)) != N_LEAVES:
        os.makedirs(fna, exist_ok=True)
        nwk, leaves = gen_tree_and_genomes(rng)
        with open(os.path.join(BASE, "tree.nwk"), "w") as f:
            f.write(nwk + "\n")
        for name, seq in leaves.items():
            with open(os.path.join(fna, f"{name}.fna"), "w") as f:
                f.write(f">{name}\n{seq.tobytes().decode()}\n")
        # 12 query fragments: 1/3 of a genome, 2% extra point mutations
        qdir = os.path.join(BASE, "qfna")
        os.makedirs(qdir, exist_ok=True)
        bases = np.frombuffer(b"ACGT", dtype=np.uint8)
        qnames = rng.choice(sorted(leaves), size=12, replace=False)
        for qn in qnames:
            seq = leaves[qn]
            start = rng.integers(0, GENOME_LEN - GENOME_LEN // 3)
            frag = seq[start : start + GENOME_LEN // 3].copy()
            mask = rng.random(frag.size) < 0.02
            frag[mask] = rng.choice(bases, size=int(mask.sum()))
            with open(os.path.join(qdir, f"q_{qn}.fna"), "w") as f:
                f.write(f">q_{qn}\n{frag.tobytes().decode()}\n")
        print(f"generated {N_LEAVES} genomes + 12 query fragments", flush=True)

    feats = os.path.join(BASE, "feats")
    os.makedirs(feats, exist_ok=True)
    if len([f for f in os.listdir(feats) if f.endswith(".npy")]) != N_LEAVES:
        dt = sh(f"python -m kf2vecfsw_tpu get_kmers -input_dir {fna} -output_dir {feats} -k 7")
        print(f"get_kmers: {dt:.0f}s", flush=True)
    if len([f for f in os.listdir(feats) if f.endswith(".kf")]) != N_LEAVES:
        dt = sh(f"python -m kf2vecfsw_tpu get_frequencies -input_dir {fna} -output_dir {feats} -k 7")
        print(f"get_frequencies: {dt:.0f}s", flush=True)

    tree = os.path.join(BASE, "work", "tree.nwk")
    os.makedirs(os.path.dirname(tree), exist_ok=True)
    if not os.path.exists(os.path.join(BASE, "work", "tree.subtrees")):
        sh(f"cp {os.path.join(BASE, 'tree.nwk')} {tree}")
        dt = sh(f"python -m kf2vecfsw_tpu divide_tree -tree {tree} -size 16")
        dt += sh(
            f"python -m kf2vecfsw_tpu get_distances -tree {tree} "
            f"-subtrees {os.path.join(BASE, 'work', 'tree.subtrees')} -mode hybrid"
        )
        print(f"divide_tree + get_distances: {dt:.0f}s", flush=True)
    work = os.path.join(BASE, "work")
    subtrees = os.path.join(work, "tree.subtrees")

    results = {}
    all_variants = {
        "lazy": "-fsw_lazy_refresh 128",
        "exact": "",
        "dense": "-no_fsw",
    }
    for tag, extra in ((t, all_variants[t]) for t in VARIANTS):
        mdir = os.path.join(BASE, f"models_{tag}")
        os.makedirs(mdir, exist_ok=True)
        t_cls = sh(
            f"python -m kf2vecfsw_tpu train_classifier -input_dir {feats} "
            f"-subtrees {subtrees} -e 200 -o {mdir}"
        ) if not os.path.exists(os.path.join(mdir, "classifier_model.ckpt")) else 0.0
        t_dist = sh(
            f"python -m kf2vecfsw_tpu train_model_set -input_dir {feats} "
            f"-subtrees {subtrees} -true_dist {work} -e {EPOCHS} -batch_sz 16 "
            f"-o {mdir} {extra}"
        )
        print(f"[{tag}] classifier {t_cls:.0f}s, FSW distance models {t_dist:.0f}s", flush=True)

        qout = os.path.join(BASE, f"qout_{tag}")
        os.makedirs(qout, exist_ok=True)
        t_q = sh(
            f"python -m kf2vecfsw_tpu process_query_data -input_dir {os.path.join(BASE, 'qfna')} "
            f"-classifier_model {mdir} -distance_model {mdir} -output_dir {qout} -k 7"
        )
        # score placement: nearest backbone by the emitted APPLES matrices
        clade_of = {}
        with open(subtrees) as f:
            next(f)
            for line in f:
                g, c = line.split()
                clade_of[g] = int(c)
        correct_class = top1 = top3 = total = 0
        ranks = []
        import csv
        import glob as _glob

        for mat in _glob.glob(os.path.join(qout, "apples_input_di_mtrx_subtree_*.csv")):
            c = int(mat.rsplit("_", 1)[1].split(".")[0])
            with open(mat) as f:
                rd = csv.reader(f, delimiter="\t")
                header = next(rd)
                backbone = header[1:]
                for row in rd:
                    qn = row[0]
                    src = qn[2:]  # q_{name}
                    total += 1
                    if clade_of.get(src) == c:
                        correct_class += 1
                    dists = np.array([float(x) for x in row[1:]])
                    if src not in backbone:
                        ranks.append(len(backbone))
                        continue
                    # rank of the source among backbone genomes by distance
                    # (the simulated coalescent makes sister taxa near-
                    # identical, so strict nearest==source is noise-bound;
                    # top-3 + rank distribution is the meaningful metric)
                    order = np.argsort(dists)
                    rank = int(np.where(np.array(backbone)[order] == src)[0][0])
                    ranks.append(rank)
                    top1 += rank == 0
                    top3 += rank <= 2
        results[tag] = (correct_class, top1, top3, total, sorted(ranks), t_dist, t_q)
        print(
            f"[{tag}] classified {correct_class}/{total} into source clade; "
            f"source top-1 {top1}/{total}, top-3 {top3}/{total}, "
            f"ranks={sorted(ranks)} (query {t_q:.0f}s)",
            flush=True,
        )
    print(results, flush=True)


main()
