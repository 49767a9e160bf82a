"""Training resume (crash recovery).

The reference has a `resume` flag that is commented out
(train_model_set.py:70) — a crash loses everything since the last best-loss
checkpoint, with no way to continue (SURVEY.md §5 "Failure detection").
Here trainers autosave full trainer state (params, Adam state, best-so-far
params, epoch, RNG-independent schedule position) every N epochs, and
`resume=True` continues from the last autosave.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np

from .checkpoint import _flatten, _unflatten, atomic_savez


def save_trainer_state(
    path: str,
    epoch: int,
    params,
    opt,
    best_params,
    lowest: float,
    best_epoch: int,
    extra: dict | None = None,
    mesh=None,
):
    """`extra` carries trainer-specific JSON-serializable scalars (e.g. the
    classifier's accuracy at the best epoch). Multi-process: only the
    coordinator writes (identical concurrent writes through the same
    path+'.tmp' race on os.replace) — but with a `mesh`, the host fetch
    itself runs on EVERY process first (model-axis-sharded trees span
    hosts; a bare device_get on the coordinator would crash, and the
    replicating gather is a collective all processes must join)."""
    if mesh is not None:
        from ..parallel.mesh import fetch_replicated

        params, opt, best_params = (
            fetch_replicated(t, mesh) for t in (params, opt, best_params)
        )
    if not is_coordinator():
        return
    arrays = {}
    for tag, tree in (("params", params), ("opt", opt), ("best", best_params)):
        tree = jax.device_get(tree)
        for k, v in _flatten(tree).items():
            arrays[f"{tag}::{k}"] = np.asarray(v)
    meta = {"epoch": epoch, "lowest": lowest, "best_epoch": best_epoch, **(extra or {})}
    atomic_savez(path, meta, arrays)


def load_trainer_state(path: str):
    """-> (epoch, params, opt, best_params, lowest, best_epoch, extra) or None."""
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        data = np.load(f, allow_pickle=False)
        meta = json.loads(str(data["__meta__"]))
        trees: dict[str, dict] = {"params": {}, "opt": {}, "best": {}}
        for key in data.files:
            if key == "__meta__":
                continue
            tag, _, rest = key.partition("::")
            trees[tag][rest] = data[key]
    extra = {k: v for k, v in meta.items() if k not in ("epoch", "lowest", "best_epoch")}
    return (
        int(meta["epoch"]),
        _unflatten(trees["params"]),
        _unflatten(trees["opt"]),
        _unflatten(trees["best"]),
        float(meta["lowest"]),
        int(meta["best_epoch"]),
        extra,
    )


def is_coordinator() -> bool:
    """True on the process that owns file writes (always true
    single-process). Multi-process trainers must not race identical
    checkpoint/autosave writes through the same path+'.tmp'."""
    try:
        return jax.process_index() == 0
    except Exception:
        return True


def restore_trainer_state(state_path: str, params, log=None, mesh=None):
    """Load an autosave, guard its parameter shapes against the freshly-built
    `params`, and return (start_epoch, params, opt, best_params, lowest,
    best_epoch, extra) as device trees — or None when no autosave exists.

    With a multi-process `mesh`, restored trees stage replicated via
    put_global (a bare jnp.asarray would pin them to one local device and
    clash with the global sharding inside the jitted spans).

    Raises SystemExit on an architecture mismatch: silently training resumed
    params of a different shape under lying checkpoint metadata is the one
    failure mode worse than losing the run.

    Multi-process: autosaves are written by the coordinator only, but every
    process reads the state file independently here, so a deployment without
    a shared filesystem would resume process 0 at epoch N while the others
    start fresh — divergent span/collective sequences that hang or corrupt
    the run. Guard: allgather (has_state, epoch) and fail loudly on any
    disagreement instead of training divergently."""
    import jax.numpy as jnp

    state = load_trainer_state(state_path)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        mine = np.array(
            [1 if state is not None else 0, state[0] if state is not None else -1],
            dtype=np.int64,
        )
        views = np.asarray(multihost_utils.process_allgather(mine))
        if not (views == views[0]).all():
            raise SystemExit(
                f"cannot -resume: processes disagree on the autosaved state at "
                f"{state_path} (per-process [has_state, epoch] = "
                f"{views.tolist()}). Autosaves are written by process 0 only; "
                f"multi-host resume requires the state path to live on a "
                f"filesystem shared by all processes (or be copied to each "
                f"host before resuming)."
            )
    if state is None:
        return None
    last_epoch, s_params, s_opt, s_best, lowest, best_epoch, extra = state
    # .shape is the GLOBAL shape on any jax.Array — no device_get needed
    # (and device_get would crash on model-axis-sharded multi-host trees)
    want = jax.tree.map(lambda a: tuple(np.shape(a)), params)
    got = jax.tree.map(lambda a: tuple(np.shape(a)), s_params)
    if want != got:
        raise SystemExit(
            f"cannot -resume: autosaved state in {state_path} has parameter "
            f"shapes {got} but the current flags build {want} — rerun with "
            f"the original size/model-family flags, or delete the state file"
        )
    if mesh is not None and jax.process_count() > 1:
        from ..parallel.mesh import put_global, replicated

        to_dev = lambda t: jax.tree.map(  # noqa: E731
            lambda a: put_global(a, replicated(mesh)), t
        )
    else:
        to_dev = lambda t: jax.tree.map(jnp.asarray, t)  # noqa: E731
    if log is not None:
        log.info(f"Resuming from epoch {last_epoch + 1} (autosaved state)")
    return (
        last_epoch + 1,
        to_dev(s_params),
        to_dev(s_opt),
        to_dev(s_best),
        lowest,
        best_epoch,
        extra,
    )
