"""Chunked-streaming trainers (reference: train_model_set_chunks.py,
train_classifier_model_chunks.py).

Each genome's features are a (c_i, V) matrix of raw per-10kb-window k-mer
counts (from get_chunks). Per epoch and per genome, the trainer draws random
contiguous window spans — span length ~ floor(Exp(c/5))+1 capped at c
(datasets.py:48-53) — sums them, renormalizes, and trains on the synthetic
"partial genome". The distance trainer draws TWO spans per genome (Siamese
pairs, Dataset_chunks_2rows) and repeats the true-distance labels twice
(train_model_set_chunks.py:396-397); the loss is Loss_chunks
(weight 1/(d+1000), losses.py:58-117).

TPU-native architecture: sampling happens on the host over the raw
uint16/uint8 chunk matrices (the streaming side — this is what lets backbones
far larger than device memory train unchanged: each host only materializes
its B sampled vectors per step), while the jitted device step consumes the
sampled batch sharded over the mesh 'data' axis via GSPMD sharding
annotations. A background prefetch thread overlaps host sampling with device
compute.
"""

from __future__ import annotations

import math
import os
import threading
import time
from collections import deque
from concurrent.futures import ThreadPoolExecutor
from queue import Queue

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding
from jax.sharding import PartitionSpec as P

from .. import defaults
from ..models.mlp import (
    classifier_apply,
    count_params,
    dist_embed_apply,
    init_classifier,
    init_dist_embed,
)
from ..ops.losses import chunks_weighted_sqrt_mse, nll_loss
from ..ops.pairwise import pairwise_l2_exact
from ..parallel.mesh import DATA_AXIS, make_mesh
from ..utils.logging import close_logger, make_run_logger, timestamp
from ..utils.timing import hms
from .checkpoint import save_checkpoint
from .classifier import load_kf_matrix, write_classes_table
from .distance import export_embeddings, load_subtree_dist
from .schedule import step_lr
from .step import adam_init, adam_update

F32 = np.float32


class ChunkStore:
    """Host-resident chunk matrices + span sampling.

    Matches the reference's memory story: uint16 by default, uint8 with
    ``cap`` (values clamped to 255, utils.py:408-430). ``column_mask``
    drops feature columns up front (the hidden -mask low-complexity filter,
    train_classifier_model_chunks.py:171-195).
    """

    def __init__(
        self,
        kf_paths: list[str],
        cap: bool = False,
        threads: int = 8,
        column_mask: np.ndarray | None = None,
    ):
        from ..io.kf import read_kf

        def load(p):
            _, mat = read_kf(p)
            if column_mask is not None:
                mat = mat[:, column_mask]
            if cap:
                return np.minimum(mat, 255).astype(np.uint8)
            return mat.astype(np.uint16)

        with ThreadPoolExecutor(max_workers=threads) as pool:
            self.matrices = list(pool.map(load, kf_paths))
        self.names = [os.path.basename(p)[: -len(".kf")] for p in kf_paths]

    @property
    def input_size(self) -> int:
        return self.matrices[0].shape[1]

    def sample_one(self, rng: np.random.Generator, gi: int) -> np.ndarray:
        """One normalized random-span vector (datasets.py:44-62)."""
        m = self.matrices[gi]
        c = m.shape[0]
        nrows = int(np.floor(rng.exponential(c / 5))) + 1
        if nrows > c:
            nrows = int(rng.integers(1, c + 1))
        ix = int(rng.integers(0, c - nrows + 1))
        tmp = m[ix : ix + nrows].sum(axis=0, dtype=np.int64).astype(np.float64)
        total = tmp.sum()
        if total > 0:
            tmp /= total
        else:
            tmp[:] = 0.0
        return (tmp * defaults.FEATURES_SCALER).astype(F32)

    def sample_one_uniform(self, rng: np.random.Generator, gi: int) -> np.ndarray:
        """Legacy uniform-span sampling (Dataset_chunks, datasets.py:271-325):
        span length ~ U[1, c), start ~ U[0, c-span)."""
        m = self.matrices[gi]
        c = m.shape[0]
        nrows = int(rng.integers(1, max(c, 2)))
        ix = int(rng.integers(0, max(c - nrows, 1)))
        tmp = m[ix : ix + nrows].sum(axis=0, dtype=np.int64).astype(np.float64)
        total = tmp.sum()
        if total > 0:
            tmp /= total
        return (tmp * defaults.FEATURES_SCALER).astype(F32)

    def sample_batch(self, rng, genome_indices, draws: int) -> np.ndarray:
        """(len(indices) * draws, V) float32: `draws` spans per genome,
        consecutive rows belong to the same genome."""
        out = np.empty((len(genome_indices) * draws, self.input_size), dtype=F32)
        row = 0
        for gi in genome_indices:
            for _ in range(draws):
                out[row] = self.sample_one(rng, gi)
                row += 1
        return out


def _prefetch(batches_iter, depth: int = 2):
    """Tiny background-thread prefetcher for host-sampled batches."""
    q: Queue = Queue(maxsize=depth)
    DONE = object()

    def worker():
        for b in batches_iter:
            q.put(b)
        q.put(DONE)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is DONE:
            return
        yield item


# -- chunked distance trainer --------------------------------------------------


def train_model_set_chunks_func(
    features_folder: str,
    input_dir_fullgenomes: str,
    feature_files: list[str],
    clades_info: str,
    true_dist_dir: str,
    num_epochs: int,
    hidden_size: int,
    embedding_size: int,
    batch_size: int,
    lr0: float,
    lr_min: float,
    lr_decay: float,
    clades_to_train: list[int] | None,
    seed: int,
    cap_data: bool,
    model_filepath: str,
    mesh=None,
    log_every: int = 1,
) -> list[str]:
    from ..ingest.tree_ops import read_subtrees

    since = time.time()
    clade_tag = (
        "_".join(str(c) for c in clades_to_train) if clades_to_train is not None else "all"
    )
    log = make_run_logger(model_filepath, f"train_model_{timestamp()}_clade_{clade_tag}.log")
    mesh = mesh or make_mesh()
    try:
        log.info("\n==> Input arguments...\n")
        log.info(f"Feature directory: {features_folder}")
        log.info(f"Clades information: {clades_info}")
        log.info(f"Ground truth directory: {true_dist_dir}")
        log.info("\n==> Parameters...\n")
        log.info(f"Backend: {jax.default_backend()} ({len(jax.devices())} devices)")
        log.info(f"Hidden Size fc1: {hidden_size}")
        log.info(f"Embedding Size: {embedding_size}")
        log.info(f"Total Epochs: {num_epochs}")
        log.info(f"Batch Size: {batch_size}")
        log.info(f"Cap kmer frequencies: {cap_data}")

        rows = read_subtrees(clades_info)
        clade_order: list[int] = []
        for _, c in rows:
            if c not in clade_order:
                clade_order.append(c)
        if clades_to_train is not None:
            clade_order = list(clades_to_train)
        log.info(f"Number of Classes: {len(clade_order)}")

        avail = {os.path.basename(f)[: -len(".kf")]: f for f in feature_files}
        saved: list[str] = []
        rng = np.random.default_rng(seed)
        key = jax.random.PRNGKey(seed)

        for c in clade_order:
            log.info(f"\n==> Working on subtree {c}...\n")
            clade_genomes = {g for g, cl in rows if cl == c}
            backbone_names = [g for g in avail if g in clade_genomes]
            store = ChunkStore([avail[g] for g in backbone_names], cap=cap_data)
            input_size = store.input_size
            n_items = len(backbone_names)
            log.info(f"Dimensions of feature matrix rows: {n_items}, cols: {input_size}")

            dist = load_subtree_dist(true_dist_dir, c, backbone_names).astype(F32)
            dist_dev = jax.device_put(dist)

            params = init_dist_embed(key, input_size, hidden_size, embedding_size)
            opt = adam_init(params)
            log.info(f"Total parameters: {count_params(params)}")

            x_sharding = NamedSharding(mesh, P(DATA_AXIS))

            @jax.jit
            def step(params, opt, x, idx, lr):
                def loss_fn(p):
                    emb = dist_embed_apply(p, x)
                    md = pairwise_l2_exact(emb)
                    ridx = jnp.repeat(idx, 2)
                    td = dist_dev[jnp.ix_(ridx, ridx)]
                    return chunks_weighted_sqrt_mse(md, td)

                loss, grads = jax.value_and_grad(loss_fn)(params)
                params, opt = adam_update(params, grads, opt, lr)
                return params, opt, loss

            n_batches = max(1, math.ceil(n_items / batch_size))
            stop_epochs = int(math.ceil(n_items / batch_size * 2))
            lq: deque = deque([float("nan")] * stop_epochs, maxlen=stop_epochs)
            log.info(f"Stopping epochs: {stop_epochs}")
            consec_lowest, consec_best_epoch = math.inf, -1

            lowest, best_epoch, best_params = math.inf, -1, params
            ckpt_path = os.path.join(model_filepath, f"model_subtree_{c}.ckpt")
            meta = {
                "model_input_size": input_size,
                "model_hidden_size_fc1": hidden_size,
                "model_embedding_size": embedding_size,
            }

            for epoch in range(num_epochs):
                lr = step_lr(epoch, lr0, lr_min, lr_decay)
                perm = rng.permutation(n_items)
                epoch_loss, items = 0.0, 0.0

                def batches():
                    for bi in range(n_batches):
                        gidx = perm[bi * batch_size : (bi + 1) * batch_size]
                        x = store.sample_batch(rng, gidx, draws=2)
                        yield gidx.astype(np.int32), x

                for bi, (gidx, x) in enumerate(_prefetch(batches())):
                    x_dev = jax.device_put(x, x_sharding) if x.shape[0] % mesh.shape[DATA_AXIS] == 0 else x
                    params, opt, loss = step(params, opt, x_dev, gidx, jnp.float32(lr))
                    loss = float(loss)
                    if epoch > 5 and loss > 0.2:
                        log.info(
                            f"Epoch [{epoch + 1}/{num_epochs}], Step [{bi + 1}/{n_batches}], "
                            f"Outlier: {loss:.20f} batch size: {x.shape[0]}"
                        )
                    if math.isnan(loss):
                        log.info(f"Loss: {loss}")
                    epoch_loss += loss * len(gidx)
                    items += len(gidx)
                epoch_loss /= max(items, 1)

                if epoch_loss < lowest:
                    lowest, best_epoch, best_params = epoch_loss, epoch, params
                lq.appendleft(epoch_loss)
                lq_mean = float(np.nanmean(lq))
                if lq_mean < consec_lowest:
                    consec_lowest, consec_best_epoch = lq_mean, epoch
                if (epoch + 1) % log_every == 0 or epoch == num_epochs - 1:
                    hrs, m, s = hms(time.time() - since)
                    log.info(
                        f"Epoch [{epoch + 1}/{num_epochs}], Step [{n_batches}/{n_batches}], "
                        f"Train loss: {epoch_loss:.20f}, Time: {hrs:02d}:{m:02d}:{s:02d}"
                    )

            log.info(f"Best Epoch [{best_epoch + 1}/{num_epochs}], Lowest loss: {lowest:.20f}")
            log.info(
                f"Best consecutive Epoch [{consec_best_epoch + 1}/{num_epochs}], "
                f"Lowest loss: {consec_lowest:.20f}"
            )
            save_checkpoint(
                ckpt_path, "NeuralNet", {**meta, "best_epoch": best_epoch, "lowest_loss": lowest},
                best_params,
            )
            saved.append(ckpt_path)

            # final embeddings from FULL genomes (train_model_set_chunks.py:578-616)
            full_paths = [
                os.path.join(input_dir_fullgenomes, g + ".kf") for g in backbone_names
            ]
            full_names, full_feats = load_kf_matrix(full_paths)
            full_feats = full_feats * F32(defaults.FEATURES_SCALER)
            export_embeddings(
                lambda p, x: dist_embed_apply(p, x),
                jax.device_get(best_params),
                full_feats,
                full_names,
                model_filepath,
                c,
                log,
            )
            log.info(f"\n==> Training for subtree {c} completed!\n")

        log.info("\n==> Training Completed!\n")
        hrs, m, s = hms(time.time() - since)
        log.info(f"Time: {hrs:02d}:{m:02d}:{s:02d}")
        return saved
    finally:
        close_logger(log)


# -- chunked classifier trainer -------------------------------------------------


def train_classifier_chunks_func(
    features_folder: str,
    input_dir_fullgenomes: str,
    feature_files: list[str],
    clades_info: str,
    num_epochs: int,
    hidden_size: int,
    batch_size: int,
    lr0: float,
    lr_min: float,
    lr_decay: float,
    seed: int,
    custom_mask: bool,
    cap_data: bool,
    model_filepath: str,
    mesh=None,
    log_every: int = 1,
) -> str:
    from ..ingest.tree_ops import read_subtrees

    since = time.time()
    log = make_run_logger(model_filepath, f"train_classifier_{timestamp()}.log")
    mesh = mesh or make_mesh()
    try:
        log.info("\n==> Preparing Data...\n")
        column_mask = None
        if custom_mask:
            from ..io.kf import read_kf
            from ..kmer.vocab import low_complexity_mask
            from .classifier import VOCAB_SIZES_TO_K

            _, probe = read_kf(feature_files[0])
            k_inferred = VOCAB_SIZES_TO_K.get(probe.shape[1])
            if k_inferred is None:
                raise ValueError(f"cannot infer k from width {probe.shape[1]} for -mask")
            column_mask = low_complexity_mask(k_inferred)
        store = ChunkStore(feature_files, cap=cap_data, column_mask=column_mask)
        names = store.names
        input_size = store.input_size
        n_items = len(names)
        log.info(f"Dimensions of feature matrix rows: {n_items}, cols: {input_size}")
        log.info(f"Masking: {custom_mask}")
        log.info(f"Cap kmer frequencies: {cap_data}")

        clade_map = dict(read_subtrees(clades_info))
        labels = np.array([clade_map[n] for n in names], dtype=np.int32)
        class_count = int(np.unique(labels).size)
        labels_dev = jax.device_put(labels)
        log.info(f"Number of Classes: {class_count}")

        key = jax.random.PRNGKey(seed)
        params = init_classifier(key, input_size, hidden_size, class_count)
        opt = adam_init(params)
        log.info(f"Total parameters: {count_params(params)}")

        @jax.jit
        def step(params, opt, x, idx, lr):
            def loss_fn(p):
                lp = classifier_apply(p, x)
                y = labels_dev[idx]
                loss = nll_loss(lp, y)
                correct = jnp.sum(jnp.argmax(lp, axis=1) == y)
                return loss, correct

            (loss, correct), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            params, opt = adam_update(params, grads, opt, lr)
            return params, opt, loss, correct

        rng = np.random.default_rng(seed)
        n_batches = max(1, math.ceil(n_items / batch_size))
        lowest, best_epoch, best_params, highest_acc = math.inf, -1, params, -1.0

        for epoch in range(num_epochs):
            lr = step_lr(epoch, lr0, lr_min, lr_decay)
            perm = rng.permutation(n_items)
            epoch_loss, correct, items = 0.0, 0.0, 0.0

            def batches():
                for bi in range(n_batches):
                    gidx = perm[bi * batch_size : (bi + 1) * batch_size]
                    yield gidx.astype(np.int32), store.sample_batch(rng, gidx, draws=1)

            for gidx, x in _prefetch(batches()):
                params, opt, loss, corr = step(params, opt, x, gidx, jnp.float32(lr))
                epoch_loss += float(loss) * len(gidx)
                correct += float(corr)
                items += len(gidx)
            epoch_loss /= max(items, 1)
            acc = correct / max(items, 1)

            if epoch_loss < lowest:
                lowest, highest_acc, best_epoch, best_params = epoch_loss, acc, epoch, params
            if (epoch + 1) % log_every == 0 or epoch == num_epochs - 1:
                hrs, m, s = hms(time.time() - since)
                log.info(
                    f"Epoch [{epoch + 1}/{num_epochs}], Step [{n_batches}/{n_batches}], "
                    f"Train loss: {epoch_loss:.20f}, {acc:.20f}, Time: {hrs:02d}:{m:02d}:{s:02d}"
                )

        log.info(
            f"Best Epoch [{best_epoch + 1}/{num_epochs}], Lowest loss: {lowest:.20f}, "
            f"Highest accuracy: {highest_acc:.20f}"
        )
        meta = {
            "model_input_size": input_size,
            "model_hidden_size_fc1": hidden_size,
            "model_class_count": class_count,
        }
        if custom_mask:
            meta["low_complexity_mask_k"] = k_inferred
        ckpt_path = os.path.join(model_filepath, "classifier_model.ckpt")
        save_checkpoint(ckpt_path, "NeuralNetClassifierOnly", meta, best_params)

        # backbone classes from FULL genomes (train_classifier_model_chunks.py:517-559);
        # the column mask is applied here too (the reference would crash on
        # this path with -mask: its final pass feeds unmasked features)
        full_paths = [os.path.join(input_dir_fullgenomes, g + ".kf") for g in names]
        full_names, full_feats = load_kf_matrix(full_paths)
        if column_mask is not None:
            full_feats = full_feats[:, column_mask]
        full_feats = full_feats * F32(defaults.FEATURES_SCALER)
        lp = jax.jit(lambda p, x: classifier_apply(p, x))(jax.device_get(best_params), full_feats)
        probs = np.exp(np.asarray(lp))
        out = os.path.join(model_filepath, "backbone_classes.out")
        full_labels = np.array([clade_map[n] for n in full_names], dtype=np.int32)
        write_classes_table(out, full_names, probs, class_count, true_class=full_labels)
        log.info(f"Dimensions of class output rows:{len(full_names)} cols:{4 + class_count}")

        log.info("\n==> Training Completed!\n")
        hrs, m, s = hms(time.time() - since)
        log.info(f"Time: {hrs:02d}:{m:02d}:{s:02d}")
        return ckpt_path
    finally:
        close_logger(log)
