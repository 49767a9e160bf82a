import glob, os
import jax, jax.numpy as jnp, numpy as np
from kf2vecfsw_tpu.models.fsw import fsw_lazy_refresh, init_fsw_dist_embed, _vocab_digits_dev

k, fswout, V, n = 7, 512, 8192, 152
params = init_fsw_dist_embed(jax.random.PRNGKey(0), k, 4, fswout, 2048, 1024)
digits = _vocab_digits_dev(k)
W = jax.random.uniform(jax.random.PRNGKey(1), (n, V), jnp.float32)
points = params["lookup"][digits].reshape(V, -1)
fn = jax.jit(lambda fp, W: fsw_lazy_refresh(fp, points, digits, W, group=8))
d, gd = fn(params["fsw"], W); np.asarray(d.ravel()[:2])
os.makedirs("/tmp/prof2", exist_ok=True)
with jax.profiler.trace("/tmp/prof2/refresh"):
    d, gd = fn(params["fsw"], W)
    np.asarray(d.ravel()[:2])
print(glob.glob("/tmp/prof2/refresh/plugins/profile/*/*.trace.json.gz"), flush=True)
