"""Time the lazy runner's refresh and cond-free epoch programs separately."""
import time
import jax, jax.numpy as jnp, numpy as np
from kf2vecfsw_tpu.models.fsw import fsw_dist_embed_specs, init_fsw_dist_embed
from kf2vecfsw_tpu.parallel.mesh import MODEL_AXIS, make_mesh, shard_params
from kf2vecfsw_tpu.train.fsw_lazy import FSWLazyEpochRunner
from kf2vecfsw_tpu.train.step import adam_init, _packed_perm, _batch_index_plan_dyn

mesh = make_mesh(1, 1)
key = jax.random.PRNGKey(0)
n_items, batch = 128, 16
k, fswout, H, E = 7, 512, 2048, 1024
V = 8192
specs = fsw_dist_embed_specs(MODEL_AXIS)
params = shard_params(init_fsw_dist_embed(key, k, 4, fswout, H, E), specs, mesh)
opt = adam_init(params)
W0 = jax.random.uniform(key, (n_items, V), jnp.float32)
dist0 = jnp.abs(jax.random.normal(key, (n_items, n_items))); dist0 = dist0 + dist0.T
runner = FSWLazyEpochRunner(mesh, k, specs, n_items, batch, refresh_steps=64)
W = runner.pad_items(W0); dist = runner.pad_dist(dist0)
print("n_bucket:", runner.n_bucket, "n_batches:", runner.n_batches, flush=True)

refresh = jax.jit(runner._refresh_sharded)
t0=time.perf_counter(); d, gd = refresh(params, W); np.asarray(d.ravel()[:2])
print("refresh compile:", round(time.perf_counter()-t0,1), "s", flush=True)
best=float("inf")
for _ in range(6):
    t0=time.perf_counter(); d2, gd2 = refresh(params, W); np.asarray(d2.ravel()[:2])
    best=min(best, time.perf_counter()-t0)
print(f"refresh: {best*1e3:.1f} ms (incl ~24ms RTT)", flush=True)

perm = _packed_perm(key, runner.n_bucket, runner.n_items)
idx, mask = _batch_index_plan_dyn(runner.n_bucket, runner.batch, runner.batch_pad, runner.n_batches, perm, jnp.int32(runner.n_items))
epoch = jax.jit(runner._lazy_epoch_norefresh)
t0=time.perf_counter()
out = epoch(params, opt, W, dist, idx, mask, jnp.float32(1e-5), d, gd)
np.asarray(out[2])
print("epoch compile:", round(time.perf_counter()-t0,1), "s", flush=True)
best=float("inf")
for _ in range(6):
    t0=time.perf_counter()
    out = epoch(params, opt, W, dist, idx, mask, jnp.float32(1e-5), d, gd)
    np.asarray(out[2])
    best=min(best, time.perf_counter()-t0)
print(f"epoch ({runner.n_batches} steps): {best*1e3:.1f} ms -> {best*1e3/runner.n_batches:.2f} ms/step (incl RTT/epoch)", flush=True)
