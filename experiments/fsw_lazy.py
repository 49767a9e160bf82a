"""Prototype: lazy-permutation FSW step.

Exact shared-vocab FSW needs one multi-operand sort per step because the
projections p = slices @ points.T move with the parameters. But everything
the sort PRODUCES besides the permutation — sorted weights, their cumsum
midpoints cbar, and thus the whole per-point coefficient

    delta[b,c,i] = sqrt2 * w_(i) * cos(pi xi_c cbar_i) * sinc(xi_c w_(i)/2)

is a function of DATA (the per-genome weights) and the permutation only.
Freeze the permutation for R steps and delta is constant; scatter it back
to original vocab order once (delta_orig) and the per-step embedding is

    E[b,c] = sum_v p[c,v] * delta_orig[b,c,v]

a pure HBM-bound contraction — no sort, no gather, MXU projections only.
At a refresh step the permutation is fresh, so E and its gradient equal
the exact FSW values (the exact path's custom VJP also treats the
permutation as locally constant). Between refreshes the objective is the
exact FSW of a slightly stale ordering.

Measures: refresh cost, lazy step cost, exact step cost, and the
numerical agreement of lazy (fresh perm) vs exact.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

B, C, V, D_IN = 16, 512, 8192, 28
H, E = 2048, 1024
_SQRT2 = float(np.sqrt(2.0))


def fetch(x):
    return np.asarray(jax.tree.leaves(x)[0].ravel()[:4])


def bench(fn, *args, reps=8):
    fetch(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fetch(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def f2i(p):
    i = jax.lax.bitcast_convert_type(p, jnp.int32)
    return jnp.where(i < 0, i ^ jnp.int32(0x7FFFFFFF), i)


def main():
    key = jax.random.PRNGKey(0)
    slices = jax.random.normal(key, (C, D_IN), jnp.float32) / np.sqrt(D_IN)
    points = jax.random.normal(jax.random.PRNGKey(1), (V, D_IN), jnp.float32)
    wn_raw = jax.random.uniform(jax.random.PRNGKey(2), (B, V), jnp.float32)
    wn = wn_raw / wn_raw.sum(axis=-1, keepdims=True)
    xi = jnp.arange(C, dtype=jnp.float32)

    @jax.jit
    def refresh(slices, points, wn):
        """One sort + delta precompute + unscatter. Returns delta_orig (B,C,V)."""
        p = slices @ points.T  # (C, V)
        k = f2i(p)
        ops = (k,) + tuple(jnp.broadcast_to(wn[b][None, :], p.shape) for b in range(B))
        iota = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1)
        res = jax.lax.sort(ops + (iota,), dimension=-1, is_stable=False, num_keys=1)
        wsb = jnp.stack(res[1:-1])  # (B, C, V) sorted weights
        perm = res[-1]
        cs = jnp.cumsum(wsb, axis=-1)
        cbar = cs - wsb / 2.0
        x = xi[None, :, None]
        delta = _SQRT2 * wsb * jnp.cos(jnp.pi * x * cbar) * jnp.sinc(x * wsb / 2.0)
        # unscatter to original vocab order: sort (perm, delta...) by perm
        res2 = jax.lax.sort(
            (perm,) + tuple(delta[b] for b in range(B)),
            dimension=-1,
            is_stable=False,
            num_keys=1,
        )
        return jnp.stack(res2[1:])  # (B, C, V) in original vocab order

    def lazy_embed(slices, points, delta_orig):
        p = slices @ points.T  # (C, V)
        return jnp.einsum("cv,bcv->bc", p, delta_orig)  # (B, C)

    # exact shared path for comparison (as shipped)
    def exact_embed(slices, points, wn):
        p = slices @ points.T
        ops = (p,) + tuple(jnp.broadcast_to(wn[b][None, :], p.shape) for b in range(B))
        res = jax.lax.sort(ops, dimension=-1, is_stable=False, num_keys=1)
        ps, wsb = res[0], jnp.stack(res[1:])
        cs = jnp.cumsum(wsb, axis=-1)
        cbar = cs - wsb / 2.0
        x = xi[None, :, None]
        delta = _SQRT2 * wsb * jnp.cos(jnp.pi * x * cbar) * jnp.sinc(x * wsb / 2.0)
        return jnp.sum(ps[None] * delta, axis=-1)

    # full train-ish step: embed -> pairwise l2 -> mse to random target
    td = jnp.abs(jax.random.normal(jax.random.PRNGKey(3), (B, B)))
    td = td + td.T
    fc1 = jax.random.normal(jax.random.PRNGKey(4), (C, H), jnp.float32) * 0.02
    fc2 = jax.random.normal(jax.random.PRNGKey(5), (H, E), jnp.float32) * 0.02

    def head(emb, fc1, fc2):
        h = jax.nn.relu(emb @ fc1)
        out = h @ fc2
        d = jnp.sqrt(
            jnp.maximum(
                jnp.sum((out[:, None] - out[None]) ** 2, axis=-1), 1e-12
            )
        )
        return jnp.mean((d - td) ** 2)

    @jax.jit
    def lazy_step(slices, fc1, fc2, points, delta_orig):
        def loss(args):
            s, f1, f2 = args
            return head(lazy_embed(s, points, delta_orig), f1, f2)

        lv, g = jax.value_and_grad(loss)((slices, fc1, fc2))
        s, f1, f2 = jax.tree.map(lambda a, b: a - 1e-4 * b, (slices, fc1, fc2), g)
        return s, f1, f2, lv

    @jax.jit
    def exact_step(slices, fc1, fc2, points, wn):
        def loss(args):
            s, f1, f2 = args
            return head(exact_embed(s, points, wn), f1, f2)

        lv, g = jax.value_and_grad(loss)((slices, fc1, fc2))
        s, f1, f2 = jax.tree.map(lambda a, b: a - 1e-4 * b, (slices, fc1, fc2), g)
        return s, f1, f2, lv

    delta_orig = refresh(slices, points, wn)
    print(f"refresh:     {bench(refresh, slices, points, wn):8.2f} ms", flush=True)
    print(f"lazy step:   {bench(lazy_step, slices, fc1, fc2, points, delta_orig):8.2f} ms", flush=True)
    print(f"exact step:  {bench(exact_step, slices, fc1, fc2, points, wn):8.2f} ms", flush=True)

    # agreement at fresh perm: lazy embed == exact embed
    e_lazy = np.asarray(jax.jit(lazy_embed)(slices, points, delta_orig))
    e_exact = np.asarray(jax.jit(lambda s, p, w: exact_embed(s, p, w))(slices, points, wn))
    err = np.abs(e_lazy - e_exact).max() / (np.abs(e_exact).max() + 1e-30)
    print(f"fresh-perm lazy vs exact rel err: {err:.2e}", flush=True)

    # gradient agreement at fresh perm
    gl = jax.jit(jax.grad(lambda s: head(lazy_embed(s, points, delta_orig), fc1, fc2)))(slices)
    ge = jax.jit(jax.grad(lambda s: head(exact_embed(s, points, wn), fc1, fc2)))(slices)
    gerr = np.abs(np.asarray(gl) - np.asarray(ge)).max() / (np.abs(np.asarray(ge)).max() + 1e-30)
    print(f"fresh-perm grad rel err:          {gerr:.2e}", flush=True)


if __name__ == "__main__":
    main()
