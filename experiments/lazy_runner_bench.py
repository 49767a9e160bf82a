"""Measure FSWLazyEpochRunner span throughput at the flagship config."""
import sys, time
import jax, jax.numpy as jnp, numpy as np
from kf2vecfsw_tpu.models.fsw import fsw_dist_embed_specs, init_fsw_dist_embed
from kf2vecfsw_tpu.parallel.mesh import MODEL_AXIS, make_mesh, shard_params
from kf2vecfsw_tpu.train.fsw_lazy import FSWLazyEpochRunner
from kf2vecfsw_tpu.train.step import adam_init

R = int(sys.argv[1]) if len(sys.argv) > 1 else 64
mesh = make_mesh(1, 1)
key = jax.random.PRNGKey(0)
n_items, batch = 128, 16
k, fswout, H, E = 7, 512, 2048, 1024
V = 8192
specs = fsw_dist_embed_specs(MODEL_AXIS)
params = shard_params(init_fsw_dist_embed(key, k, 4, fswout, H, E), specs, mesh)
opt = adam_init(params)
W = jax.random.uniform(key, (n_items, V), jnp.float32)
dist = jnp.abs(jax.random.normal(key, (n_items, n_items))); dist = dist + dist.T
dist = dist.at[jnp.diag_indices(n_items)].set(0.0)
runner = FSWLazyEpochRunner(mesh, k, specs, n_items, batch, refresh_steps=R)
lr_args = (1e-5, 3e-6, 2000.0, 0.1, 100)
best = (jax.tree.map(jnp.copy, params), jnp.float32(np.inf), jnp.int32(-1))
W = runner.pad_items(W); dist = runner.pad_dist(dist)
t0 = time.perf_counter()
params, opt, best, losses = runner.run_epoch_span(params, opt, best, W, dist, key, 0, 16, lr_args)
np.asarray(losses)
print("compile+warm:", round(time.perf_counter() - t0, 1), "s", flush=True)
n_epochs = 64
dt = float("inf")
for rep in range(3):
    t0 = time.perf_counter()
    for i in range(n_epochs // 16):
        params, opt, best, losses = runner.run_epoch_span(params, opt, best, W, dist, key, 16 + i*16, 16, lr_args)
        np.asarray(losses)
    dt = min(dt, time.perf_counter() - t0)
steps = n_epochs * runner.n_batches
print(f"lazy R={R}: {steps/dt:.1f} steps/s ({dt/steps*1e3:.2f} ms/step)", flush=True)
print("finite:", bool(np.isfinite(np.asarray(losses)).all()), flush=True)
