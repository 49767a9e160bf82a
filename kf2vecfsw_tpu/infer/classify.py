"""Query classification (reference: classify.py:57-129).

Loads the classifier checkpoint, streams query `.kf` files in blocks, runs a
jitted forward pass per block (rows padded to a geometric bucket so XLA
compiles a bounded set of programs under variable block shapes), and appends
rows to classes.out.
"""

from __future__ import annotations

import os
import time

import jax
import numpy as np

from .. import defaults
from ..io.kf import float_repr
from ..models.mlp import classifier_apply
from ..utils import phases
from ..utils.logging import close_logger, make_run_logger
from ..utils.timing import hms

# module-level jit so the executable cache survives across calls
_CLS_FORWARD = jax.jit(lambda p, x: classifier_apply(p, x))


def classify_func(
    features_folder: str,
    feature_files: list[str],
    model_dir: str,
    seed: int,
    output_dir: str,
    block_size: int = defaults.DEFAULT_BLOCK_SZ,
) -> str:
    since = time.time()
    log = make_run_logger(output_dir, "classification.log")
    try:
        log.info("\n==> Input arguments...\n")
        log.info(f"Feature directory: {features_folder}")
        log.info(f"Model: {model_dir}")
        log.info(f"Seed: {seed}")
        log.info("\n==> Building model...\n")

        from .cache import cached_checkpoint

        # device-resident LRU keyed by (path, mtime, size): the ~67 MB
        # classifier transfers once per process, not once per call
        with phases.phase("model_load"):
            model_name, meta, params = cached_checkpoint(
                os.path.join(model_dir, "classifier_model.ckpt")
            )
        if model_name != "NeuralNetClassifierOnly":
            raise ValueError(f"unexpected classifier model {model_name!r}")
        input_size = int(meta["model_input_size"])
        class_count = int(meta["model_class_count"])
        column_mask = None
        if meta.get("low_complexity_mask_k"):
            from ..kmer.vocab import low_complexity_mask

            column_mask = low_complexity_mask(int(meta["low_complexity_mask_k"]))

        forward = _CLS_FORWARD

        classes_path = os.path.join(output_dir, "classes.out")
        header = ["genome", "top_class", "top_p"] + [str(x) for x in range(class_count)]
        from ..train.step import bucket_items
        from .cache import cached_query_matrix
        from .query import _prefetch_blocks

        # shared device-resident feature matrix: the same rows the query pass
        # will gather per clade transfer ONCE for both passes (see
        # infer/cache.py). Falls back to per-block host parse+ship when the
        # set is over budget / not cacheable.
        qmat = cached_query_matrix(feature_files)

        def _dev_blocks(qmat):
            import jax.numpy as jnp

            all_names, _, dev = qmat
            if column_mask is not None and dev.shape[1] == column_mask.size:
                dev = jnp.take(
                    dev, jnp.asarray(np.nonzero(column_mask)[0], np.int32), axis=1
                )
            if dev.shape[1] != input_size:
                raise ValueError(
                    f"feature width {dev.shape[1]} != model input {input_size}"
                )
            # uniform ROW blocks (file blocks vary in rows): full blocks share
            # one compiled shape and the slice/pad ops run on device — no
            # feature bytes cross the link
            for z in range(0, len(all_names), block_size):
                n_rows = min(block_size, len(all_names) - z)
                x = jax.lax.dynamic_slice_in_dim(dev, z, n_rows, axis=0)
                n_pad = bucket_items(max(n_rows, 1), floor=64)
                if n_pad != n_rows:
                    x = jnp.pad(x, ((0, n_pad - n_rows), (0, 0)))
                yield all_names[z : z + n_rows], x, n_rows

        def _blocks():
            if qmat is not None:
                yield from _dev_blocks(qmat)
                return
            for z in range(0, len(feature_files), block_size):
                with phases.phase("parse"):
                    from .cache import read_kf_files_cached

                    chunk = feature_files[z : z + block_size]
                    names, mat = read_kf_files_cached(chunk, dtype=np.float32)
                    if column_mask is not None and mat.shape[1] == column_mask.size:
                        mat = mat[:, column_mask]
                    if mat.shape[1] != input_size:
                        raise ValueError(
                            f"feature width {mat.shape[1]} != model input {input_size}"
                        )
                    x = mat * np.float32(defaults.FEATURES_SCALER)
                    # rows pad to a geometric bucket so XLA compiles a bounded
                    # set of programs even when block row counts vary (chunked
                    # query files contribute variable rows per file)
                    n_rows = x.shape[0]
                    n_pad = bucket_items(max(n_rows, 1), floor=64)
                    if n_pad != n_rows:
                        x = np.pad(x, ((0, n_pad - n_rows), (0, 0)))
                yield names, x, n_rows

        def _write_out(f, pending):
            names, out_dev, n_rows = pending
            with phases.phase("fetch"):
                out = np.asarray(out_dev)[:n_rows]
            with phases.phase("format"):
                probs = np.exp(out)
                top = probs.argmax(axis=1)
                for i, name in enumerate(names):
                    row = [
                        name,
                        float_repr(float(top[i])),
                        float_repr(float(probs[i, top[i]])),
                    ] + [float_repr(float(p)) for p in probs[i]]
                    f.write("\t".join(row) + "\n")

        with open(classes_path, "w") as f:
            f.write("\t".join(header) + "\n")
            # same pipeline as query_func: parse block z+1 on a thread,
            # format block z-1 while the device runs block z
            pending = None
            for names, x, n_rows in _prefetch_blocks(_blocks()):
                with phases.phase("dispatch"):
                    out_dev = forward(params, x)
                phases.count("dispatches")
                if pending is not None:
                    _write_out(f, pending)
                pending = (names, out_dev, n_rows)
            if pending is not None:
                _write_out(f, pending)

        log.info("\n==> Classification Completed!\n")
        hrs, m, s = hms(time.time() - since)
        log.info(f"Time: {hrs:02d}:{m:02d}:{s:02d}")
        return classes_path
    finally:
        close_logger(log)


def read_classes_out(path: str) -> list[tuple[str, int]]:
    """classes.out -> [(genome, top_class)]."""
    out = []
    with open(path) as f:
        header = f.readline().rstrip("\n").split("\t")
        i_genome = header.index("genome")
        i_top = header.index("top_class")
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) <= max(i_genome, i_top):
                continue
            out.append((parts[i_genome], int(float(parts[i_top]))))
    return out
