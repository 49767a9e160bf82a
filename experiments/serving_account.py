"""Account for every millisecond of the serving e2e bench (VERDICT r3 item 1).

Reproduces bench_serving's fixture (512 queries, V=8192, 850-genome backbone,
2 dense subtrees) and times each phase of classify_func + query_func in
isolation: checkpoint disk read, param host->device transfer, .kf parse,
query-block transfer, device compute, result fetch, text format/write.
The parts must sum to ~the e2e wall clock or the accounting is wrong.
"""

import os
import sys
import tempfile
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kf2vecfsw_tpu.infer.classify import classify_func
from kf2vecfsw_tpu.infer.query import query_func
from kf2vecfsw_tpu.io.kf import read_kf_files, write_kf
from kf2vecfsw_tpu.models.mlp import classifier_apply, dist_embed_apply, init_classifier, init_dist_embed
from kf2vecfsw_tpu.ops.pairwise import cdist_exact_blocked, squared_clamped
from kf2vecfsw_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from kf2vecfsw_tpu.train.distance import f32_row


def t(f, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        r = f()
        best = min(best, time.perf_counter() - t0)
    return best, r


def main():
    rng = np.random.default_rng(11)
    nq, v, nb, e = 512, 8192, 850, 1024
    key = jax.random.PRNGKey(0)
    d = tempfile.mkdtemp()
    qdir, mdir, odir = (os.path.join(d, x) for x in "qmo")
    for p in (qdir, mdir, odir):
        os.makedirs(p)
    files = []
    for i in range(nq):
        p = os.path.join(qdir, f"q{i}.kf")
        write_kf(p, [(f"q{i}", rng.random(v) / v)])
        files.append(p)
    save_checkpoint(
        os.path.join(mdir, "classifier_model.ckpt"),
        "NeuralNetClassifierOnly",
        {"model_input_size": v, "model_hidden_size_fc1": 2048, "model_class_count": 2},
        init_classifier(key, v, 2048, 2),
    )
    for c in (0, 1):
        save_checkpoint(
            os.path.join(mdir, f"model_subtree_{c}.ckpt"),
            "NeuralNet",
            {"model_input_size": v, "model_hidden_size_fc1": 2048, "model_embedding_size": e},
            init_dist_embed(key, v, 2048, e),
        )
    emb = rng.normal(size=(nb, e)).astype(np.float32)
    for c in (0, 1):
        with open(os.path.join(mdir, f"embeddings_subtree_{c}.csv"), "w") as f:
            for i in range(nb):
                f.write(f"g{i}\t" + f32_row(emb[i]))

    # ---- e2e (the bench number), warm then timed
    classify_func(qdir, files, mdir, 28, odir)
    query_func(qdir, files, mdir, odir, 28, odir)
    t0 = time.perf_counter()
    classify_func(qdir, files, mdir, 28, odir)
    t_cls = time.perf_counter() - t0
    t0 = time.perf_counter()
    query_func(qdir, files, mdir, odir, 28, odir)
    t_qry = time.perf_counter() - t0
    print(f"e2e classify: {t_cls*1e3:8.1f} ms")
    print(f"e2e query:    {t_qry*1e3:8.1f} ms")
    print(f"e2e total:    {(t_cls+t_qry)*1e3:8.1f} ms  -> {nq/(t_cls+t_qry):.1f} q/s")

    # ---- phase isolation
    dt, _ = t(lambda: load_checkpoint(os.path.join(mdir, "classifier_model.ckpt")))
    print(f"ckpt disk read (classifier, 67MB): {dt*1e3:8.1f} ms")
    _, _, cls_p = load_checkpoint(os.path.join(mdir, "classifier_model.ckpt"))
    _, _, dst_p = load_checkpoint(os.path.join(mdir, "model_subtree_0.ckpt"))
    nbytes = sum(a.nbytes for a in jax.tree.leaves(cls_p))
    dt, cls_dev = t(lambda: jax.block_until_ready(jax.device_put(cls_p)), reps=2)
    print(f"param transfer classifier ({nbytes/1e6:.0f} MB): {dt*1e3:8.1f} ms  ({nbytes/1e6/dt:.1f} MB/s)")
    nbytes = sum(a.nbytes for a in jax.tree.leaves(dst_p))
    dt, dst_dev = t(lambda: jax.block_until_ready(jax.device_put(dst_p)), reps=2)
    print(f"param transfer dist model ({nbytes/1e6:.0f} MB): {dt*1e3:8.1f} ms  ({nbytes/1e6/dt:.1f} MB/s)")

    dt, (names, qmat) = t(lambda: read_kf_files(files, dtype=np.float32))
    print(f".kf parse 512 files ({sum(os.path.getsize(p) for p in files)/1e6:.0f} MB): {dt*1e3:8.1f} ms")
    # split: file IO vs parse
    def _io():
        return [open(p, "rb").read() for p in files]
    dt_io, blobs = t(_io)
    print(f"  of which raw file reads: {dt_io*1e3:8.1f} ms")
    from kf2vecfsw_tpu.io.native import lib as native_lib
    nat = native_lib.try_load()
    blob = b"".join(b if b.endswith(b"\n") else b + b"\n" for b in blobs)
    dt_p, _ = t(lambda: nat.parse_table(blob))
    print(f"  native parse_table of joined blob ({len(blob)/1e6:.0f} MB): {dt_p*1e3:8.1f} ms")

    x = qmat * np.float32(1e4)
    dt, x_dev = t(lambda: jax.block_until_ready(jax.device_put(x)), reps=2)
    print(f"query block transfer ({x.nbytes/1e6:.0f} MB): {dt*1e3:8.1f} ms")

    fwd_cls = jax.jit(lambda p, x: classifier_apply(p, x))
    fwd_dst = jax.jit(lambda p, x: dist_embed_apply(p, x))
    emb_dev = jax.device_put(emb)

    @jax.jit
    def qstep(p, x, anchors):
        out = dist_embed_apply(p, x)
        return out, squared_clamped(cdist_exact_blocked(out, anchors))

    np.asarray(fwd_cls(cls_dev, x_dev)[:1])
    np.asarray(qstep(dst_dev, x_dev, emb_dev)[1][:1, :4])
    dt, _ = t(lambda: np.asarray(fwd_cls(cls_dev, x_dev)[:2, :2]))
    print(f"classify forward (device-resident, incl 1 RTT): {dt*1e3:8.1f} ms")
    dt, _ = t(lambda: np.asarray(qstep(dst_dev, x_dev, emb_dev)[1][:2, :2]))
    print(f"query forward+cdist (device-resident, incl 1 RTT): {dt*1e3:8.1f} ms")

    out_dev, d_dev = qstep(dst_dev, x_dev, emb_dev)
    dt, outs = t(lambda: (np.asarray(out_dev), np.asarray(d_dev)))
    o_np, d_np = outs
    print(f"fetch outputs ({(o_np.nbytes+d_np.nbytes)/1e6:.1f} MB): {dt*1e3:8.1f} ms")

    def _fmt():
        buf = []
        for i in range(nq):
            buf.append("x\t" + f32_row(d_np[i]))
            buf.append("x\t" + f32_row(o_np[i]))
        return buf
    dt, _ = t(_fmt)
    print(f"format {nq} dist+emb rows: {dt*1e3:8.1f} ms")

    # params transferred by the actual code path: numpy params into jit each call
    dt, _ = t(lambda: np.asarray(fwd_cls(cls_p, x)[:2, :2]), reps=2)
    print(f"classify forward with NUMPY params+x (as shipped): {dt*1e3:8.1f} ms")
    dt, _ = t(lambda: np.asarray(qstep(dst_p, x, emb)[1][:2, :2]), reps=2)
    print(f"query forward with NUMPY params+x (as shipped): {dt*1e3:8.1f} ms")

    # embeddings csv parse (per clade)
    from kf2vecfsw_tpu.infer.query import read_embeddings_csv
    dt, _ = t(lambda: read_embeddings_csv(os.path.join(mdir, "embeddings_subtree_0.csv")))
    print(f"embeddings csv parse (850x1024): {dt*1e3:8.1f} ms")

    # link probe for context
    from kf2vecfsw_tpu.kernels import histogram as H
    print(f"link probe: {H.link_bandwidth_mbps():.1f} MB/s")


if __name__ == "__main__":
    main()
