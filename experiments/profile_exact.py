import glob, os
import jax, jax.numpy as jnp, numpy as np
from kf2vecfsw_tpu.models.fsw import fsw_dist_embed_specs, init_fsw_dist_embed, make_fsw_shared_apply
from kf2vecfsw_tpu.parallel.mesh import MODEL_AXIS, make_mesh, shard_params
from kf2vecfsw_tpu.train.step import DistanceEpochRunner, adam_init, _packed_perm, _batch_index_plan_dyn

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
runner = DistanceEpochRunner(mesh, make_fsw_shared_apply(k), specs, n_items, batch)
W = runner.pad_items(W0); dist = runner.pad_dist(dist0)
perm = _packed_perm(key, runner.n_bucket, runner.n_items)
idx, mask = _batch_index_plan_dyn(runner.n_bucket, runner.batch, runner.batch_pad, runner.n_batches, perm, jnp.int32(runner.n_items))
epoch = jax.jit(runner._epoch_sharded)
out = epoch(params, opt, W, dist, idx, mask, jnp.float32(1e-5)); np.asarray(out[2])
import time
best = float("inf")
for _ in range(4):
    t0=time.perf_counter(); out = epoch(params, opt, W, dist, idx, mask, jnp.float32(1e-5)); np.asarray(out[2])
    best = min(best, time.perf_counter()-t0)
print(f"exact epoch ({runner.n_batches} steps): {best*1e3:.1f} ms -> {best*1e3/runner.n_batches:.2f} ms/step", flush=True)
os.makedirs("/tmp/prof3", exist_ok=True)
with jax.profiler.trace("/tmp/prof3/exact"):
    out = epoch(params, opt, W, dist, idx, mask, jnp.float32(1e-5))
    np.asarray(out[2])
print(glob.glob("/tmp/prof3/exact/plugins/profile/*/*.trace.json.gz"), flush=True)
