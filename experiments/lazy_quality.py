"""Loss-quality comparison: exact shared FSW vs lazy R=128/R=512 over 512 epochs."""
import time
import jax, jax.numpy as jnp, numpy as np
from kf2vecfsw_tpu.models.fsw import fsw_dist_embed_specs, init_fsw_dist_embed, make_fsw_shared_apply
from kf2vecfsw_tpu.parallel.mesh import MODEL_AXIS, make_mesh, shard_params
from kf2vecfsw_tpu.train.fsw_lazy import FSWLazyEpochRunner
from kf2vecfsw_tpu.train.step import DistanceEpochRunner, adam_init

mesh = make_mesh(1, 1)
key = jax.random.PRNGKey(0)
n_items, batch = 128, 16
k, fswout, H, E = 7, 512, 2048, 1024
V = 8192
specs = fsw_dist_embed_specs(MODEL_AXIS)
params0 = shard_params(init_fsw_dist_embed(key, k, 4, fswout, H, E), specs, mesh)
# realistic-ish: weights from a dirichlet-ish draw, distances from a latent embedding
rng = np.random.default_rng(1)
W = jnp.asarray(rng.gamma(0.5, size=(n_items, V)).astype(np.float32))
Z = rng.normal(size=(n_items, 32))
D = np.sqrt(((Z[:, None] - Z[None]) ** 2).sum(-1)).astype(np.float32)
dist = jnp.asarray(D)
lr_args = (1e-5, 3e-6, 2000.0, 0.1, 100)

def train(runner, tag, n_epochs=512):
    params = jax.tree.map(jnp.copy, params0)
    opt = adam_init(params)
    best = (jax.tree.map(jnp.copy, params), jnp.float32(np.inf), jnp.int32(-1))
    Wp = runner.pad_items(W); dp = runner.pad_dist(dist)
    all_losses = []
    t0 = time.perf_counter()
    for i in range(n_epochs // 64):
        params, opt, best, losses = runner.run_epoch_span(params, opt, best, Wp, dp, key, i*64, 64, lr_args)
        all_losses.append(np.asarray(losses))
    dt = time.perf_counter() - t0
    L = np.concatenate(all_losses)
    print(f"{tag}: first={L[0]:.6f} e64={L[63]:.6f} e256={L[255]:.6f} final={L[-1]:.6f} "
          f"best={float(best[1]):.6f} wall={dt:.0f}s", flush=True)
    return L

exact = DistanceEpochRunner(mesh, make_fsw_shared_apply(k), specs, n_items, batch)
Le = train(exact, "exact")
for R in (128, 512):
    lazy = FSWLazyEpochRunner(mesh, k, specs, n_items, batch, refresh_steps=R)
    Ll = train(lazy, f"lazy-R{R}")
    rel = np.abs(Ll - Le) / np.maximum(Le, 1e-9)
    print(f"R={R} per-epoch |lazy-exact|/exact: median={np.median(rel):.4f} max={rel.max():.4f}", flush=True)
