"""Classifier training engine (reference: train_classifier_model.py).

Differences from the reference, by design (TPU-first):
- the whole backbone feature matrix is device-resident; an epoch is ONE
  jitted call (lax.scan over batches, batch sharded over the mesh 'data'
  axis) instead of a Python DataLoader loop,
- the best-loss parameters are kept as an immutable device pytree and
  written once at the end (plus the same classifier_model.ckpt artifact),
- Adam/LR-schedule/loss semantics match the reference exactly
  (train/schedule.py, ops/losses.py).
"""

from __future__ import annotations

import glob
import os
import time
from concurrent.futures import ThreadPoolExecutor

import jax
import jax.numpy as jnp
import numpy as np

from .. import defaults
from ..io.kf import float_repr, read_kf
from ..kmer.vocab import low_complexity_mask
from ..models.mlp import classifier_apply, classifier_specs, count_params, init_classifier
from ..parallel.mesh import MODEL_AXIS, make_mesh, shard_params
from ..utils.logging import close_logger, make_run_logger, timestamp
from ..utils.timing import hms
from .checkpoint import load_checkpoint, save_checkpoint
from .schedule import step_lr
from .step import ClassifierEpochRunner, adam_init, lr_schedule_args, split_spans

VOCAB_SIZES_TO_K = {32: 3, 136: 4, 512: 5, 2080: 6, 8192: 7, 32896: 8, 131072: 9}


def load_kf_matrix(paths: list[str], threads: int = 8) -> tuple[list[str], np.ndarray]:
    """Parallel .kf ingest (replaces mp.Pool(my_read_csv),
    train_classifier_model.py:144-147). Returns (names, float32 matrix)."""
    with ThreadPoolExecutor(max_workers=threads) as pool:
        results = list(pool.map(read_kf, paths))
    names: list[str] = []
    mats = []
    for n, m in results:
        names.extend(n)
        mats.append(m)
    return names, np.vstack(mats).astype(np.float32)


def read_clade_map(subtrees_path: str) -> dict[str, int]:
    from ..ingest.tree_ops import read_subtrees

    return dict(read_subtrees(subtrees_path))


def validate_class_labels(labels: np.ndarray) -> int:
    """Class ids must be exactly {0..C-1} and returns C.

    The class id IS the output column index everywhere downstream
    (classes.out probability columns, query's model_subtree_{c}.ckpt lookup,
    the secondary-class post-processor's argsort over columns), so a
    non-contiguous or negative id in a hand-made .subtrees file would
    silently mistrain (out-of-range NLL gathers clip under jit) and misroute
    queries. divide_tree always emits contiguous 0-based ids."""
    uniq = np.unique(labels)
    if uniq.size == 0 or uniq[0] != 0 or int(uniq[-1]) != uniq.size - 1:
        raise ValueError(
            "clade ids in the .subtrees file must be contiguous 0-based "
            f"integers (got {uniq[:10].tolist()}...); regenerate it with "
            "divide_tree"
        )
    return int(uniq.size)


def write_classes_table(
    path: str,
    genomes: list[str],
    probs: np.ndarray,
    class_count: int,
    true_class: np.ndarray | None = None,
) -> None:
    """classes.out / backbone_classes.out writer (TSV; top_class rendered as a
    float to match the reference's np.hstack of floats,
    train_classifier_model.py:496-506, classify.py:96-124). Multi-process:
    coordinator-only (concurrent identical writes race)."""
    from .resume import is_coordinator

    if not is_coordinator():
        return
    top_class = probs.argmax(axis=1)
    top_p = probs.max(axis=1)
    with open(path, "w") as f:
        cols = ["genome"]
        if true_class is not None:
            cols.append("true_class")
        cols += ["top_class", "top_p"] + [str(x) for x in range(class_count)]
        f.write("\t".join(cols) + "\n")
        for i, g in enumerate(genomes):
            row = [g]
            if true_class is not None:
                row.append(str(int(true_class[i])))
            row.append(float_repr(float(top_class[i])))
            row.append(float_repr(float(top_p[i])))
            row.extend(float_repr(float(p)) for p in probs[i])
            f.write("\t".join(row) + "\n")


def train_classifier_func(
    features_folder: str,
    feature_files: list[str],
    clades_info: str,
    num_epochs: int,
    hidden_size: int,
    batch_size: int,
    lr: float,
    lr_min: float,
    lr_decay: float,
    seed: int,
    custom_mask: bool,
    model_filepath: str,
    mesh=None,
    log_every: int = 1,
    resume: bool = False,
    autosave_every: int = 500,
):
    since = time.time()
    log = make_run_logger(model_filepath, f"train_classifier_{timestamp()}.log")
    try:
        return _train(
            log, since, features_folder, feature_files, clades_info, num_epochs,
            hidden_size, batch_size, lr, lr_min, lr_decay, seed, custom_mask,
            model_filepath, mesh, log_every, resume, autosave_every,
        )
    finally:
        close_logger(log)


def _train(
    log, since, features_folder, feature_files, clades_info, num_epochs,
    hidden_size, batch_size, lr0, lr_min, lr_decay, seed, custom_mask,
    model_filepath, mesh, log_every, resume, autosave_every,
):
    log.info("\n==> Input arguments...\n")
    log.info(f"Feature directory: {features_folder}")
    log.info(f"Clades information: {clades_info}")

    log.info("\n==> Parameters...\n")
    log.info(f"Backend: {jax.default_backend()} ({len(jax.devices())} devices)")
    log.info(f"Hidden Size fc1: {hidden_size}")
    log.info(f"Total Epochs: {num_epochs}")
    log.info(f"Batch Size: {batch_size}")
    log.info(f"Learning Rate: {lr0:g}")
    log.info(f"Learning Rate Min: {lr_min:g}")
    log.info(f"Learning Rate Decay: {lr_decay:g}")
    log.info(f"Random Seed: {seed}")
    log.info(f"Masking: {custom_mask}")

    log.info("\n==> Preparing Data...\n")
    if not feature_files:
        feature_files = sorted(glob.glob(os.path.join(features_folder, "*.kf")))
    names, feats = load_kf_matrix(feature_files)
    feats = feats * np.float32(defaults.FEATURES_SCALER)
    input_size = feats.shape[1]
    log.info(f"Dimensions of feature matrix rows: {feats.shape[0]}, cols: {input_size}")

    mask_k = None
    if custom_mask:
        mask_k = VOCAB_SIZES_TO_K.get(input_size)
        if mask_k is None:
            raise ValueError(f"cannot infer k from input size {input_size} for -mask")
        keep = low_complexity_mask(mask_k)
        feats = feats[:, keep]
        input_size = feats.shape[1]
        log.info(
            f"Dimensions of feature matrix after masking rows: {feats.shape[0]}, "
            f"cols: {input_size}"
        )

    clade_map = read_clade_map(clades_info)
    labels = np.array([clade_map[n] for n in names], dtype=np.int32)
    class_count = validate_class_labels(labels)
    n_items = len(names)
    log.info(f"Number of Train Samples: {n_items}")

    log.info("\n==> Building model...\n")
    log.info(f"Number of Classes: {class_count}")

    mesh = mesh or make_mesh()
    specs = classifier_specs(MODEL_AXIS)
    key = jax.random.PRNGKey(seed)
    params = shard_params(init_classifier(key, input_size, hidden_size, class_count), specs, mesh)
    opt = adam_init(params)
    log.info(f"Total parameters: {count_params(params)}")
    log.info(f"Trainable parameters: {count_params(params)}")

    runner = ClassifierEpochRunner(mesh, classifier_apply, specs, n_items, batch_size, donate=True)
    # rows padded (on host) to the runner's compile bucket: XLA programs then
    # depend on the bucket, not the exact backbone size; staging is
    # multi-process-safe (raw device_put under a global mesh pins to local
    # devices)
    from .chunks import stage_replicated

    nb = runner.n_bucket
    if nb > n_items:
        feats = np.pad(feats, ((0, nb - n_items), (0, 0)))
        labels_p = np.pad(labels, (0, nb - n_items))
    else:
        labels_p = labels
    feats_dev = stage_replicated(feats, mesh)
    labels_dev = stage_replicated(labels_p, mesh)

    hrs, m, s = hms(time.time() - since)
    log.info(f"Time: {hrs:02d}:{m:02d}:{s:02d}")
    log.info("\n==> Training model...\n")

    n_batches = runner.n_batches
    lr_args = lr_schedule_args(lr0, lr_min, lr_decay)
    # epochs run in multi-epoch device spans: LR schedule, permutations and
    # best-(loss, acc, params, epoch) tracking all on device; one dispatch +
    # one loss/acc fetch per span instead of one round trip per epoch
    start_epoch = 0
    lowest0, acc0, best_epoch0 = np.inf, -1.0, -1
    best_params0 = jax.tree.map(jnp.copy, params)
    state_path = os.path.join(model_filepath, "trainer_state_classifier.ckpt")
    if resume:
        from .resume import restore_trainer_state

        state = restore_trainer_state(state_path, params, log, mesh=mesh)
        if state is not None:
            start_epoch, params, opt, best_params0, lowest0, best_epoch0, extra = state
            acc0 = float(extra.get("highest_acc", -1.0))
    best = (
        best_params0,
        jnp.float32(lowest0),
        jnp.float32(acc0),
        jnp.int32(best_epoch0),
    )
    boundaries: set[int] = set()
    if autosave_every:
        boundaries.update(range(autosave_every, num_epochs, autosave_every))
    for epoch0, span in split_spans(start_epoch, num_epochs, sorted(boundaries)):
        params, opt, best, losses, accs = runner.run_epoch_span(
            params, opt, best, feats_dev, labels_dev, key, epoch0, span, lr_args
        )
        loss_vals = np.asarray(jax.device_get(losses), dtype=np.float64)
        acc_vals = np.asarray(jax.device_get(accs), dtype=np.float64)
        for i in range(span):
            epoch = epoch0 + i
            if (epoch + 1) % log_every == 0 or epoch == num_epochs - 1:
                hrs, m, s = hms(time.time() - since)
                log.info(
                    f"Epoch [{epoch + 1}/{num_epochs}], Step [{n_batches}/{n_batches}], "
                    f"Train loss: {loss_vals[i]:.20f}, {acc_vals[i]:.20f}, "
                    f"Time: {hrs:02d}:{m:02d}:{s:02d}"
                )
                log.info(f"Epoch {epoch + 1}\t \x20\x20LR:{step_lr(epoch, lr0, lr_min, lr_decay):.20f}")
        end_epoch = epoch0 + span - 1
        if autosave_every and (
            (end_epoch + 1) % autosave_every == 0 or end_epoch == num_epochs - 1
        ):
            from .resume import save_trainer_state

            save_trainer_state(
                state_path, end_epoch, params, opt, best[0],
                float(best[1]), int(best[3]), extra={"highest_acc": float(best[2])},
                mesh=mesh,
            )
    best_params, lowest_loss, highest_acc, best_epoch = (
        best[0],
        float(best[1]),
        float(best[2]),
        int(best[3]),
    )

    log.info(
        f"Best Epoch [{best_epoch + 1}/{num_epochs}], Lowest loss: {lowest_loss:.20f}, "
        f"Highest accuracy: {highest_acc:.20f}"
    )

    meta = {
        "model_input_size": input_size,
        "model_hidden_size_fc1": hidden_size,
        "model_class_count": class_count,
        "best_epoch": best_epoch,
        "lowest_loss": lowest_loss,
    }
    if mask_k is not None:
        # record the mask so classify can filter query features identically
        # (the reference cannot run classify on masked models at all:
        # classify.py never re-applies the mask and the widths mismatch)
        meta["low_complexity_mask_k"] = mask_k
    ckpt_path = os.path.join(model_filepath, "classifier_model.ckpt")
    save_checkpoint(ckpt_path, "NeuralNetClassifierOnly", meta, best_params)

    # full-backbone forward with the best params -> backbone_classes.out
    # (train_classifier_model.py:470-506); coordinator-only in multi-process
    # (non-coordinators never wrote — and must not race — the checkpoint)
    from .resume import is_coordinator

    if is_coordinator():
        model_name, meta2, loaded = load_checkpoint(ckpt_path)
        assert model_name == "NeuralNetClassifierOnly"
        log_probs = jax.jit(lambda p, x: classifier_apply(p, x))(loaded, feats[:n_items])
        probs = np.exp(np.asarray(log_probs))
        out = os.path.join(model_filepath, "backbone_classes.out")
        write_classes_table(out, names, probs, class_count, true_class=labels)
        log.info(f"Dimensions of class output rows:{len(names)} cols:{4 + class_count}")

    log.info("\n==> Training Completed!\n")
    hrs, m, s = hms(time.time() - since)
    log.info(f"Time: {hrs:02d}:{m:02d}:{s:02d}")
    return ckpt_path
