"""Per-subtree distance-embedding trainer (reference: train_model_set.py).

One model per clade: embeddings are trained so pairwise L2 distances
approximate sqrt(patristic distance) under inverse-distance weighting
(losses.py:13-49). Supports the dense `.kf` path (NeuralNet) and the FSW
`.npy` path (NeuralNetFSW), a held-out test set, periodic snapshot saving,
and exports the APPLES-compatible embeddings/distortions CSVs.

TPU-first: the clade's features + true-distance matrix live on device; each
epoch is one jitted lax.scan sharded over the mesh (see train/step.py).
"""

from __future__ import annotations

import contextlib
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from .. import defaults
from ..io.kf import read_kf
from ..models.fsw import fsw_dist_embed_apply, fsw_dist_embed_specs, init_fsw_dist_embed
from ..models.mlp import count_params, dist_embed_apply, dist_embed_specs, init_dist_embed
from ..ops.pairwise import cdist_exact_blocked, squared_clamped
from ..parallel.mesh import MODEL_AXIS, fetch_replicated, make_mesh, shard_params
from ..utils.logging import close_logger, make_run_logger, timestamp
from ..utils.timing import hms
from .checkpoint import save_checkpoint
from .classifier import load_kf_matrix
from .schedule import step_lr
from .step import DistanceEpochRunner, adam_init, lr_schedule_args, split_spans

F32 = np.float32


def f32_str(v) -> str:
    return str(np.float32(v))


def f32_row(vals, sep: str = "\t") -> str:
    """One str(np.float32)-formatted row ending in '\\n' (native fast path)."""
    from ..io.native import lib as native_lib

    native = native_lib.try_load()
    if native is not None:
        line = native.format_floats(np.asarray(vals, dtype=np.float32), sep=sep)
        if line is not None:
            return line
    return sep.join(f32_str(v) for v in vals) + "\n"


def read_test_ids(path: str | None) -> list[str]:
    """-test_set file: one filename per line, extension stripped
    (utils.py:440-454)."""
    if path is None:
        return []
    with open(path) as f:
        return [os.path.splitext(line.strip())[0] for line in f if line.strip()]


def load_subtree_dist(true_dist_dir: str, clade: int, order: list[str]) -> np.ndarray:
    """Find *_subtree_{c}.di_mtrx and reindex to feature order
    (train_model_set.py:260-268 + utils.py sort_df)."""
    from ..tree.distance import read_di_mtrx, reindex_matrix

    candidates = [
        f for f in os.listdir(true_dist_dir) if f"_subtree_{clade}.di_mtrx" in f
    ]
    if not candidates:
        raise FileNotFoundError(
            f"no *_subtree_{clade}.di_mtrx under {true_dist_dir}"
        )
    rl, cl, v = read_di_mtrx(os.path.join(true_dist_dir, candidates[0]))
    return reindex_matrix(rl, cl, v, order)


def pad_point_sets(mats: list[np.ndarray], n_fixed: int | None = None) -> np.ndarray:
    """Zero-pad variable-length (N_i, k+1) FSW matrices to (n, Nbucket, k+1);
    padded rows carry weight 0 (pad_collate, train_model_set.py:72-90). The
    point-set length pads to a geometric bucket so FSW programs are reused
    across clades/query blocks instead of recompiling per max-N; n_fixed
    pins the padded length outright (query pads to the full vocab size at
    dense-capable k so EVERY subtree's block shares one compiled forward)."""
    from .step import bucket_items

    if n_fixed is not None and n_fixed >= max(m.shape[0] for m in mats):
        n_max = n_fixed
    else:
        n_max = bucket_items(max(m.shape[0] for m in mats), floor=128)
    width = mats[0].shape[1]
    out = np.zeros((len(mats), n_max, width), dtype=np.float32)
    for i, m in enumerate(mats):
        out[i, : m.shape[0]] = m
    return out


def export_embeddings(
    apply_fn, params, feats, backbone_names: list[str], out_dir: str, clade, log
) -> np.ndarray:
    """Embed the full backbone; write distortions_subtree_{c}.csv (squared,
    <1e-6 clamped to 0) and embeddings_subtree_{c}.csv
    (train_model_set.py:602-643). Returns the embeddings.

    apply_fn should be jitted by the CALLER: snapshot exports then reuse one
    compiled forward per clade instead of recompiling per call. params must
    be host values (see parallel.mesh.fetch_replicated for sharded trees).

    Multi-process: only the coordinator computes + writes (concurrent
    identical writes race)."""
    from .resume import is_coordinator

    if not is_coordinator():
        return None
    # blocked forward: one unblocked call materializes O(n_items * N * d_in)
    # transients (GBs for k=9 FSW point sets even though training is
    # batch-bounded). FSW 3-D point sets get train-batch-sized blocks; the
    # tail pads to the block so only one block shape ever compiles.
    feats = np.asarray(feats)
    n = feats.shape[0]
    block = 16 if feats.ndim == 3 else 512
    if n <= block:
        outputs = np.asarray(apply_fn(params, feats))
    else:
        outs = []
        for i in range(0, n, block):
            fb = feats[i : i + block]
            real = fb.shape[0]
            if real < block:
                fb = np.concatenate(
                    [fb, np.zeros((block - real,) + fb.shape[1:], fb.dtype)]
                )
            outs.append(np.asarray(apply_fn(params, fb))[:real])
        outputs = np.concatenate(outs, axis=0)
    dist = np.asarray(
        squared_clamped(cdist_exact_blocked(jax.numpy.asarray(outputs), jax.numpy.asarray(outputs)))
    )
    dis_path = os.path.join(out_dir, f"distortions_subtree_{clade}.csv")
    with open(dis_path, "w") as f:
        f.write("\t" + "\t".join(backbone_names) + "\n")
        for name, row in zip(backbone_names, dist):
            f.write(name + "\t" + f32_row(row))
    emb_path = os.path.join(out_dir, f"embeddings_subtree_{clade}.csv")
    with open(emb_path, "w") as f:
        for name, row in zip(backbone_names, outputs):
            f.write(name + "\t" + f32_row(row))
    if log:
        log.info(
            f"Dimensions of distortion matrix rows:{len(backbone_names)} "
            f"cols:{len(backbone_names) + 1}"
        )
        log.info(
            f"Dimensions of embedding output rows:{len(backbone_names)} "
            f"cols:{outputs.shape[1] + 1}"
        )
    return outputs


def train_model_set_func(
    features_folder: str,
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
    model_filepath: str,
    test_ids_path: str | None = None,
    save_interval: int | None = None,
    use_fsw: bool = True,
    base_dim: int = defaults.FSW_BASE_DIM,
    fswout_dim: int = defaults.FSW_OUT_DIM,
    mesh=None,
    log_every: int = 1,
    resume: bool = False,
    autosave_every: int = 500,
    fsw_lazy_refresh: int | None = None,
) -> list[str]:
    since = time.time()
    clade_tag = (
        "_".join(str(c) for c in clades_to_train) if clades_to_train is not None else "all"
    )
    log = make_run_logger(
        model_filepath, f"train_model_{timestamp()}_clade_{clade_tag}.log"
    )
    try:
        return _train_all(
            log, since, features_folder, feature_files, clades_info, true_dist_dir,
            num_epochs, hidden_size, embedding_size, batch_size, lr0, lr_min,
            lr_decay, clades_to_train, seed, model_filepath, test_ids_path,
            save_interval, use_fsw, base_dim, fswout_dim, mesh, log_every,
            resume, autosave_every, fsw_lazy_refresh,
        )
    finally:
        close_logger(log)


def _train_all(
    log, since, features_folder, feature_files, clades_info, true_dist_dir,
    num_epochs, hidden_size, embedding_size, batch_size, lr0, lr_min, lr_decay,
    clades_to_train, seed, model_filepath, test_ids_path, save_interval,
    use_fsw, base_dim, fswout_dim, mesh, log_every, resume, autosave_every,
    fsw_lazy_refresh=None,
):
    from ..ingest.tree_ops import read_subtrees

    log.info("\n==> Input arguments...\n")
    log.info(f"Feature directory: {features_folder}")
    log.info(f"Clades information: {clades_info}")
    log.info(f"Ground truth directory: {true_dist_dir}")
    log.info(f"Test set: {test_ids_path if test_ids_path else 'None'}")

    log.info("\n==> Parameters...\n")
    log.info(f"Backend: {jax.default_backend()} ({len(jax.devices())} devices)")
    log.info(f"Hidden Size fc1: {hidden_size}")
    log.info(f"Embedding Size: {embedding_size}")
    log.info(f"Total Epochs: {num_epochs}")
    log.info(f"Batch Size: {batch_size}")
    log.info(f"Learning Rate: {lr0:g}")
    log.info(f"Learning Rate Min: {lr_min:g}")
    log.info(f"Learning Rate Decay: {lr_decay:g}")
    log.info(f"Clades to train: {clade_list_str(clades_to_train)}")
    log.info(f"Random Seed: {seed}")
    log.info(f"Model save interval: {save_interval if save_interval is not None else 'unspecified'}")
    log.info(f"Model family: {'NeuralNetFSW' if use_fsw else 'NeuralNet'}")

    log.info("\n==> Subtree training...\n")
    rows = read_subtrees(clades_info)
    clade_order: list[int] = []
    for _, c in rows:
        if c not in clade_order:
            clade_order.append(c)
    if clades_to_train is not None:
        clade_order = list(clades_to_train)
    log.info(f"Number of Classes: {len(clade_order)}")

    mesh = mesh or make_mesh()
    test_ids = set(read_test_ids(test_ids_path))
    saved: list[str] = []

    # available sample names: from the feature file listing
    if use_fsw:
        avail = {}
        for f in feature_files:
            stem = _strip_npy_suffix(os.path.basename(f))
            if stem in avail:
                # genome_k7.npy and genome_k9.npy both strip to 'genome':
                # silently picking one would train the clade at the wrong k
                raise ValueError(
                    f"feature dir contains multiple .npy files for '{stem}' "
                    f"({os.path.basename(avail[stem])} and {os.path.basename(f)}); "
                    "keep one k per directory"
                )
            avail[stem] = f
    else:
        avail = {os.path.basename(f)[: -len(".kf")]: f for f in feature_files}

    for c in clade_order:
        log.info(f"\n==> Working on subtree {c}...\n")
        log.info("\n==> Preparing Data...\n")
        clade_set = {g for g, cl in rows if cl == c}
        backbone_names = [g for g in avail if g in clade_set]

        if use_fsw:
            mats = [np.load(avail[g]).astype(np.float32) for g in backbone_names]
            input_size = mats[0].shape[-1]
            feats = pad_point_sets(mats)
            # shared-vocab fast path: when the clade's point sets cover a
            # large fraction of the canonical vocab (full genomes at k<=9),
            # train on (n, V) vocab-aligned weights — one shared sort per
            # batch instead of B per-genome sorts (models/fsw.py). Export
            # keeps the per-genome `feats` (bit-exact same embeddings).
            from ..models.fsw import make_fsw_shared_apply, shared_vocab_applicable

            fsw_shared = shared_vocab_applicable(
                input_size - 1, feats.shape[1], batch_size
            )
            if fsw_shared:
                from ..ingest.kmers import point_sets_to_vocab_weights

                try:
                    train_feats = point_sets_to_vocab_weights(mats, input_size - 1)
                except ValueError:
                    # rows outside the canonical vocab (hand-made .npy inputs;
                    # get_kmers never emits these) — keep the per-genome path
                    fsw_shared = False
                    train_feats = feats
            else:
                train_feats = feats
        else:
            backbone_paths = [avail[g] for g in backbone_names]
            read_names, feats = load_kf_matrix(backbone_paths)
            assert read_names == backbone_names or set(read_names) == set(backbone_names)
            backbone_names = read_names
            feats = feats * F32(defaults.FEATURES_SCALER)
            input_size = feats.shape[1]
            train_feats = feats
            fsw_shared = False
        n_items = len(backbone_names)
        log.info(f"Dimensions of feature matrix rows: {n_items}, cols: {input_size}")

        dist = load_subtree_dist(true_dist_dir, c, backbone_names).astype(np.float32)
        log.info(
            f"Dimensions of true distance matrix rows: {dist.shape[0]}, cols: {dist.shape[1]}"
        )

        train_idx = [i for i, g in enumerate(backbone_names) if g not in test_ids]
        test_idx = [i for i, g in enumerate(backbone_names) if g in test_ids]
        log.info(f"Number of Train Samples: {len(train_idx)}")
        if test_idx:
            log.info(f"Number of Test Samples: {len(test_idx)}")

        log.info("\n==> Building model...\n")
        key = jax.random.PRNGKey(seed)
        if use_fsw:
            model_name = "NeuralNetFSW"
            k = input_size - 1
            params = init_fsw_dist_embed(key, k, base_dim, fswout_dim, hidden_size, embedding_size)
            specs = fsw_dist_embed_specs(MODEL_AXIS)
            apply_fn = make_fsw_shared_apply(k) if fsw_shared else fsw_dist_embed_apply
            if fsw_shared:
                log.info(
                    f"FSW shared-vocab path: V={train_feats.shape[1]} "
                    f"(one shared sort per batch)"
                )
            meta = {
                "model_input_size": input_size,
                "model_hidden_size_fc1": hidden_size,
                "model_embedding_size": embedding_size,
                "fsw_k": k,
                "fsw_base_dim": base_dim,
                "fsw_out_dim": fswout_dim,
            }
        else:
            model_name = "NeuralNet"
            params = init_dist_embed(key, input_size, hidden_size, embedding_size)
            specs = dist_embed_specs(MODEL_AXIS)
            apply_fn = dist_embed_apply
            meta = {
                "model_input_size": input_size,
                "model_hidden_size_fc1": hidden_size,
                "model_embedding_size": embedding_size,
            }
        params = shard_params(params, specs, mesh)
        opt = adam_init(params)
        log.info(f"Total parameters: {count_params(params)}")
        log.info(f"Trainable parameters: {count_params(params)}")

        # train on the train partition only: remap via index subset
        from .chunks import stage_replicated

        feats_dev = stage_replicated(train_feats, mesh)
        dist_dev = stage_replicated(dist, mesh)
        # lazy sort-refresh: AUTO by default (r3 verdict item 4 — quality is
        # pinned: refresh=1 == exact by test, <=0.3% median best-loss
        # deviation at R=128, demo placement parity). Explicit 0 forces the
        # exact per-step sort; explicit N > 0 sets the cadence.
        lazy_auto = fsw_lazy_refresh is None
        lazy_refresh = (
            defaults.FSW_LAZY_AUTO_REFRESH if lazy_auto else fsw_lazy_refresh
        )
        use_lazy = False
        if use_fsw and lazy_refresh > 0:
            from .fsw_lazy import (
                FSWLazyEpochRunner,
                FSWLazyPerGenomeRunner,
                lazy_applicable,
            )
            from .step import bucket_items

            # train_feats' minor length is V (shared-vocab weights) or N
            # (padded per-genome point sets) — the refresh transient scales
            # with it either way
            nb = bucket_items(max(len(train_idx), 1))
            use_lazy = lazy_applicable(
                nb, fswout_dim, train_feats.shape[1],
                n_model=int(mesh.shape[MODEL_AXIS]),
            )
            if not use_lazy:
                log.info(
                    "FSW lazy-refresh "
                    + ("auto-check: " if lazy_auto else "requested but ")
                    + "the refresh sort transients exceed the per-device "
                    "HBM budget for this clade; using the exact "
                    + ("shared" if fsw_shared else "per-genome")
                    + " path"
                )
        if use_lazy:
            log.info(
                "FSW lazy sort-refresh path"
                + ("" if fsw_shared else " (per-genome sort orders)")
                + f": refresh every {lazy_refresh} steps"
                + (
                    " (auto-enabled; pass -fsw_lazy_refresh 0 for the exact "
                    "per-step sort)"
                    if lazy_auto
                    else ""
                )
            )
            runner_cls = FSWLazyEpochRunner if fsw_shared else FSWLazyPerGenomeRunner
            runner = runner_cls(
                mesh, input_size - 1, specs, len(train_idx), batch_size,
                refresh_steps=lazy_refresh, donate=True,
            )
        else:
            runner = DistanceEpochRunner(
                mesh, apply_fn, specs, len(train_idx), batch_size, donate=True
            )

        hrs, m, s = hms(time.time() - since)
        log.info(f"Time: {hrs:02d}:{m:02d}:{s:02d}")
        log.info("\n==> Training model...\n")

        # the runner permutes [0, n_train); map through train_map inside the
        # gather by pre-subsetting features/dist for the train partition.
        # Rows/cols padded to the runner's compile bucket so XLA programs
        # depend on the bucket, not the exact clade size. Subset + pad happen
        # on HOST so staging is one multi-process-safe replicated put.
        ft = train_feats[train_idx] if len(train_idx) != n_items else train_feats
        dt = (
            dist[np.ix_(train_idx, train_idx)] if len(train_idx) != n_items else dist
        )
        nb = runner.n_bucket
        if nb > ft.shape[0]:
            pad_n = nb - ft.shape[0]
            ft = np.pad(ft, ((0, pad_n),) + ((0, 0),) * (ft.ndim - 1))
            dt = np.pad(dt, ((0, pad_n), (0, pad_n)))
        feats_train = stage_replicated(ft, mesh)
        dist_train = stage_replicated(dt, mesh)

        lowest = float("inf")
        best_epoch = -1
        best_params = params
        start_epoch = 0
        n_batches = runner.n_batches
        ckpt_path = os.path.join(model_filepath, f"model_subtree_{c}.ckpt")
        state_path = os.path.join(model_filepath, f"trainer_state_subtree_{c}.ckpt")
        if resume:
            from .resume import restore_trainer_state

            state = restore_trainer_state(state_path, params, log, mesh=mesh)
            if state is not None:
                start_epoch, params, opt, best_params, lowest, best_epoch, _ = state

        from ..utils.profiling import maybe_trace

        def maybe_autosave(epoch, params, opt, best_params, lowest, best_epoch):
            if autosave_every and (epoch + 1) % autosave_every == 0:
                from .resume import save_trainer_state

                save_trainer_state(
                    state_path, epoch, params, opt, best_params, lowest, best_epoch,
                    mesh=mesh,
                )

        def maybe_snapshot(epoch, params):
            if save_interval is not None and (
                epoch % save_interval == 0 or epoch == num_epochs - 1
            ):
                subdir = os.path.join(model_filepath, f"model_epoch_{epoch + 1}")
                os.makedirs(subdir, exist_ok=True)
                save_checkpoint(
                    os.path.join(subdir, f"model_subtree_{c}.ckpt"), model_name, meta, params
                )

        if test_idx:
            # per-epoch test-set evaluation: keep the epoch-granular loop
            for epoch in range(start_epoch, num_epochs):
                lr = step_lr(epoch, lr0, lr_min, lr_decay)
                trace_ctx = (
                    maybe_trace(f"train_model_clade_{c}") if epoch == start_epoch + 1
                    else contextlib.nullcontext()
                )
                with trace_ctx:
                    params, opt, loss = runner.run_epoch(
                        params, opt, feats_train, dist_train, jax.random.fold_in(key, epoch), lr
                    )
                loss = float(loss)
                if loss != loss:  # NaN watch (train_model_set_chunks.py:431-432)
                    log.info(f"Loss: {loss}")
                if loss < lowest:
                    lowest = loss
                    best_epoch = epoch
                    # deep copy: the live params buffers are donated to the
                    # next epoch's jitted call
                    best_params = jax.tree.map(jnp.copy, params)
                if (epoch + 1) % log_every == 0 or epoch == num_epochs - 1:
                    hrs, m, s = hms(time.time() - since)
                    log.info(
                        f"Epoch [{epoch + 1}/{num_epochs}], Step [{n_batches}/{n_batches}], "
                        f"Train loss: {loss:.20f}, Time: {hrs:02d}:{m:02d}:{s:02d}"
                    )
                    test_loss = runner.eval_loss(params, feats_dev, dist_dev, test_idx)
                    log.info(
                        f"Epoch [{epoch + 1}/{num_epochs}], Test loss: {test_loss:.20f}"
                    )
                    log.info(f"Epoch {epoch + 1}\t \x20\x20LR:{lr:.20f}")
                maybe_autosave(epoch, params, opt, best_params, lowest, best_epoch)
                maybe_snapshot(epoch, params)
        else:
            # multi-epoch device spans: LR schedule, permutations and
            # best-(loss, params, epoch) tracking run on device; one dispatch
            # + one loss fetch per span instead of a round trip per epoch.
            # Span boundaries align with autosave/snapshot epochs.
            lr_args = lr_schedule_args(lr0, lr_min, lr_decay)
            boundaries: set[int] = set()
            if autosave_every:
                boundaries.update(range(autosave_every, num_epochs, autosave_every))
            if save_interval is not None:
                boundaries.update(e + 1 for e in range(0, num_epochs, save_interval))
            best = (
                jax.tree.map(jnp.copy, best_params),
                jnp.float32(lowest),
                jnp.int32(best_epoch),
            )
            span_i = 0
            for epoch0, span in split_spans(start_epoch, num_epochs, sorted(boundaries)):
                # profile the SECOND span: the first is compile warmup, so a
                # trace of it would be dominated by compilation
                trace_ctx = (
                    maybe_trace(f"train_model_clade_{c}") if span_i == 1 else contextlib.nullcontext()
                )
                span_i += 1
                with trace_ctx:
                    params, opt, best, losses = runner.run_epoch_span(
                        params, opt, best, feats_train, dist_train, key, epoch0, span, lr_args
                    )
                loss_vals = np.asarray(jax.device_get(losses), dtype=np.float64)
                for i in range(span):
                    epoch = epoch0 + i
                    loss = float(loss_vals[i])
                    if loss != loss:  # NaN watch (train_model_set_chunks.py:431-432)
                        log.info(f"Loss: {loss}")
                    if (epoch + 1) % log_every == 0 or epoch == num_epochs - 1:
                        hrs, m, s = hms(time.time() - since)
                        log.info(
                            f"Epoch [{epoch + 1}/{num_epochs}], Step [{n_batches}/{n_batches}], "
                            f"Train loss: {loss:.20f}, Time: {hrs:02d}:{m:02d}:{s:02d}"
                        )
                        log.info(
                            f"Epoch {epoch + 1}\t \x20\x20LR:{step_lr(epoch, lr0, lr_min, lr_decay):.20f}"
                        )
                end_epoch = epoch0 + span - 1
                maybe_autosave(end_epoch, params, opt, best[0], float(best[1]), int(best[2]))
                maybe_snapshot(end_epoch, params)
            best_params, lowest, best_epoch = best[0], float(best[1]), int(best[2])

        log.info(
            f"Best Epoch [{best_epoch + 1}/{num_epochs}], Lowest loss: {lowest:.20f}"
        )
        save_checkpoint(
            ckpt_path, model_name, {**meta, "best_epoch": best_epoch, "lowest_loss": lowest},
            best_params,
        )
        saved.append(ckpt_path)

        # final export with the best params (train_model_set.py:602-643).
        # The export consumes the per-genome point sets even when training
        # used the shared-vocab path (params are interchangeable between
        # the two forwards; embeddings agree to float tolerance).
        export_fwd = fsw_dist_embed_apply if use_fsw else apply_fn
        # jit ONCE per clade: interval snapshots below reuse this compiled
        # forward instead of paying a fresh compile per snapshot
        export_apply = jax.jit(lambda p, x: export_fwd(p, x, model_axis=None))
        # collective gather to host on ALL processes (model-axis-sharded
        # params span hosts); writes stay coordinator-gated inside
        best_host = fetch_replicated(best_params, mesh)
        export_embeddings(export_apply, best_host, feats, backbone_names, model_filepath, c, log)

        # interval snapshots also get embeddings (train_model_set.py:646-683)
        if save_interval is not None:
            from .checkpoint import load_checkpoint

            for sub in sorted(os.listdir(model_filepath)):
                subdir = os.path.join(model_filepath, sub)
                if not (sub.startswith("model_epoch_") and os.path.isdir(subdir)):
                    continue
                snap = os.path.join(subdir, f"model_subtree_{c}.ckpt")
                if not os.path.exists(snap):
                    continue
                log.info(f"Computing embeddings for interval: {subdir}")
                _, _, snap_params = load_checkpoint(snap)
                export_embeddings(
                    export_apply, snap_params, feats, backbone_names, subdir, c, None
                )

        log.info(f"\n==> Training for subtree {c} completed!\n")
        hrs, m, s = hms(time.time() - since)
        log.info(f"Time: {hrs:02d}:{m:02d}:{s:02d}")

    log.info("\n==> Training Completed!\n")
    hrs, m, s = hms(time.time() - since)
    log.info(f"Time: {hrs:02d}:{m:02d}:{s:02d}")
    return saved


def clade_list_str(clades) -> str:
    return " ".join(str(c) for c in clades) if clades is not None else "all"


def _strip_npy_suffix(basename: str) -> str:
    """{name}_k{k}.npy -> name"""
    stem = basename[: -len(".npy")] if basename.endswith(".npy") else basename
    if "_k" in stem:
        head, _, tail = stem.rpartition("_k")
        if tail.isdigit():
            return head
    return stem
