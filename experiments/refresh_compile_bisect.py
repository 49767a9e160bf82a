import sys, time
import jax, jax.numpy as jnp, numpy as np
from kf2vecfsw_tpu.models.fsw import fsw_lazy_refresh, init_fsw_dist_embed, _vocab_digits_dev

group = int(sys.argv[1]); n = int(sys.argv[2]); use_matmul_cumsum = sys.argv[3] == "mm"
if not use_matmul_cumsum:
    import kf2vecfsw_tpu.models.fsw as F
    F._cumsum_minor_matmul = lambda x, block=256: jnp.cumsum(x, axis=-1)
k, fswout = 7, 512
V = 8192
params = init_fsw_dist_embed(jax.random.PRNGKey(0), k, 4, fswout, 2048, 1024)
digits = _vocab_digits_dev(k)
W = jax.random.uniform(jax.random.PRNGKey(1), (n, V), jnp.float32)
points = params["lookup"][digits].reshape(V, -1)
fn = jax.jit(lambda fp, W: fsw_lazy_refresh(fp, points, digits, W, group=group))
t0 = time.perf_counter()
d, gd = fn(params["fsw"], W)
np.asarray(d.ravel()[:2])
print(f"group={group} n={n} mm={use_matmul_cumsum} compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
best = float("inf")
for _ in range(5):
    t0 = time.perf_counter(); d, gd = fn(params["fsw"], W); np.asarray(d.ravel()[:2])
    best = min(best, time.perf_counter()-t0)
print(f"refresh: {best*1e3:.1f} ms", flush=True)
