"""Measured FSW train step at the k=9 giant-set regime (VERDICT r2 item 8).

The k=9 `.npy` regime gives each genome a point set of up to V=131,072
canonical k-mers (reference: models.py:51-68 consuming get_kmers output,
train_model_set.py:281-283). On full genomes the shared-vocab path applies
(every set is the full canonical vocab with per-genome weights), so one
span step sorts (C_chunk, V)=... projections once per slice chunk with
B weight operands riding the permutation. The auto slice-chunk budget
(models/fsw.py:_auto_slice_chunk) must engage here — unchunked transients
would be ~17 GiB.

Prints steps/s for the exact shared-sort path and (if the plane fits) the
lazy refresh path, at B=16, C=512, H=2048, E=1024, V=131072, n_items=32
(a small clade of giant sets — the realistic k=9 shape).

Usage: python experiments/fsw_k9_step.py [n_items] [span_epochs]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from kf2vecfsw_tpu.models.fsw import (
    _auto_slice_chunk,
    fsw_dist_embed_specs,
    init_fsw_dist_embed,
    make_fsw_shared_apply,
)
from kf2vecfsw_tpu.parallel.mesh import MODEL_AXIS, make_mesh, shard_params
from kf2vecfsw_tpu.train.step import DistanceEpochRunner, adam_init

N_ITEMS = int(sys.argv[1]) if len(sys.argv) > 1 else 32
SPAN = int(sys.argv[2]) if len(sys.argv) > 2 else 4

k, base_dim, fswout, H, E, B = 9, 4, 512, 2048, 1024, 16
V = 4**k // 2  # 131072 canonical k-mers


def main():
    mesh = make_mesh(1, 1)
    key = jax.random.PRNGKey(0)
    print(
        f"k={k} V={V} n_items={N_ITEMS} B={B} C={fswout} "
        f"auto_slice_chunk={_auto_slice_chunk(B, V, fswout)}",
        flush=True,
    )
    specs = fsw_dist_embed_specs(MODEL_AXIS)
    params0 = shard_params(
        init_fsw_dist_embed(key, k, base_dim, fswout, H, E), specs, mesh
    )
    W = jax.random.uniform(key, (N_ITEMS, V), jnp.float32)
    W = W / W.sum(axis=1, keepdims=True)
    dist = jnp.abs(jax.random.normal(key, (N_ITEMS, N_ITEMS)))
    dist = dist + dist.T
    dist = dist.at[jnp.diag_indices(N_ITEMS)].set(0.0)
    lr_args = (1e-5, 3e-6, 2000.0, 0.1, 100)

    runner = DistanceEpochRunner(mesh, make_fsw_shared_apply(k), specs, N_ITEMS, B)
    params = jax.tree.map(jnp.copy, params0)
    opt = adam_init(params)
    best = (jax.tree.map(jnp.copy, params), jnp.float32(np.inf), jnp.int32(-1))
    Wp = runner.pad_items(W)
    dp = runner.pad_dist(dist)

    t0 = time.perf_counter()
    params, opt, best, losses = runner.run_epoch_span(
        params, opt, best, Wp, dp, key, 0, SPAN, lr_args
    )
    np.asarray(losses)
    print(f"compile+first span: {time.perf_counter() - t0:.1f}s", flush=True)

    dt = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        params, opt, best, losses = runner.run_epoch_span(
            params, opt, best, Wp, dp, key, SPAN * (1 + i), SPAN, lr_args
        )
        np.asarray(losses)
        dt = min(dt, time.perf_counter() - t0)
    steps = SPAN * runner.n_batches
    print(
        f"exact shared path: {steps / dt:.2f} steps/s "
        f"({1e3 * dt / steps:.1f} ms/step), span losses tail "
        f"{np.asarray(losses)[-3:]}",
        flush=True,
    )


main()
