import sys, time
import jax, jax.numpy as jnp, numpy as np
from kf2vecfsw_tpu.models.fsw import init_fsw_dist_embed, _vocab_digits_dev
from kf2vecfsw_tpu.train.step import adam_init, adam_update

key = jax.random.PRNGKey(0)
n_items, B = 128, 16
k, fswout, H, E = 7, 512, 2048, 1024
V, C = 8192, 512
params = init_fsw_dist_embed(key, k, 4, fswout, H, E)
opt = adam_init(params)
delta = jax.random.normal(key, (n_items, C, V), jnp.float32)
gdelta = jax.random.normal(jax.random.PRNGKey(1), (n_items, C, V), jnp.float32)
digits = _vocab_digits_dev(k)
idxs = jnp.stack([(jnp.arange(B)*7 + i) % n_items for i in range(128)])

def run_amortized(step_fn, args, K=64):
    @jax.jit
    def loop(params, opt):
        def body(c, ib):
            params, opt = c
            params, opt, lv = step_fn(params, opt, ib)
            return (params, opt), lv
        (params, opt), ls = jax.lax.scan(body, (params, opt), idxs[:K])
        return params, opt, ls
    p2, o2, ls = loop(*args); np.asarray(ls)
    best=float("inf")
    for _ in range(3):
        t0=time.perf_counter(); p2, o2, ls = loop(p2, o2); np.asarray(ls); best=min(best,time.perf_counter()-t0)
    return best*1e3/K

def make_step(mode):
    def step(params, opt, ib):
        db = delta[ib]
        def loss(p):
            pts = p["lookup"][digits].reshape(V, -1)
            proj = p["fsw"]["slices"] @ pts.T
            if mode in ("delta_only", "contract_only"):
                eff = db
            else:
                gb = gdelta[ib]
                fr = p["fsw"]["freqs"]
                eff = db + (fr - jax.lax.stop_gradient(fr))[None, :, None] * gb
            Eb = jnp.einsum("cv,bcv->bc", proj, eff)
            if mode == "contract_only":
                return jnp.sum(Eb**2) * 1e-6
            h = jax.nn.relu(Eb @ p["fc1"]["w"] + p["fc1"]["b"])
            out = h @ p["fc2"]["w"] + p["fc2"]["b"]
            return jnp.sum(out**2) * 1e-6
        lv, g = jax.value_and_grad(loss)(params)
        params, opt = adam_update(params, g, opt, jnp.float32(1e-5))
        return params, opt, lv
    return step

def step_fwdonly(params, opt, ib):
    db = delta[ib]
    pts = params["lookup"][digits].reshape(V, -1)
    proj = params["fsw"]["slices"] @ pts.T
    Eb = jnp.einsum("cv,bcv->bc", proj, db)
    return params, opt, jnp.sum(Eb)*1e-6

for mode in sys.argv[1:]:
    if mode == "fwdonly":
        print(f"{mode:14s}: {run_amortized(step_fwdonly, (params, opt)):7.2f} ms/step", flush=True)
    else:
        print(f"{mode:14s}: {run_amortized(make_step(mode), (params, opt)):7.2f} ms/step", flush=True)
