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

from .checkpoint import _flatten, _unflatten


def save_trainer_state(path: str, epoch: int, params, opt, best_params, lowest: float, best_epoch: int):
    arrays = {}
    for tag, tree in (("params", params), ("opt", opt), ("best", best_params)):
        tree = jax.device_get(tree)
        for k, v in _flatten(tree).items():
            arrays[f"{tag}::{k}"] = np.asarray(v)
    meta = {"epoch": epoch, "lowest": lowest, "best_epoch": best_epoch}
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, __meta__=json.dumps(meta), **arrays)
    os.replace(tmp, path)


def load_trainer_state(path: str):
    """-> (epoch, params, opt, best_params, lowest, best_epoch) or None."""
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
    return (
        int(meta["epoch"]),
        _unflatten(trees["params"]),
        _unflatten(trees["opt"]),
        _unflatten(trees["best"]),
        float(meta["lowest"]),
        int(meta["best_epoch"]),
    )
