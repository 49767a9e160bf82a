"""Experiment: replace the shared-vocab FSW (B+2)-operand sort with a
2-operand argsort + weight gather.

The shipped _sort_shared (models/fsw.py) sorts (B+2)=18 operands at
(C=512, V=8192): XLA's sorting network moves ALL operands through every
compare-exchange pass, so the B weight operands cost ~B/2 extra sorts of
traffic even though they never participate in a comparison. If a plain
gather `wn[:, perm]` (source (B,V) is only 512 KB — VMEM-resident) runs
near HBM speed, argsort+gather should beat the multi-operand sort by ~5x.

Run on the real chip: python experiments/fsw_gather_sort.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

B, C, V = 16, 512, 8192


def fetch(x):
    # axon tunnel: block_until_ready doesn't sync; a real fetch does
    return np.asarray(jax.tree.leaves(x)[0].ravel()[:4])


def bench(fn, *args, reps=8):
    out = fn(*args)
    fetch(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fetch(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main():
    key = jax.random.PRNGKey(0)
    p = jax.random.normal(key, (C, V), jnp.float32)
    wn = jax.random.uniform(jax.random.PRNGKey(1), (B, V), jnp.float32)

    @jax.jit
    def sort_multi(p, wn):
        ops = (p,) + tuple(jnp.broadcast_to(wn[b][None, :], p.shape) for b in range(B))
        iota = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1)
        res = jax.lax.sort(ops + (iota,), dimension=-1, is_stable=False, num_keys=1)
        return res[0], jnp.stack(res[1:-1]), res[-1]

    @jax.jit
    def argsort2(p):
        iota = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1)
        ps, perm = jax.lax.sort((p, iota), dimension=-1, is_stable=False, num_keys=1)
        return ps, perm

    @jax.jit
    def gather_take(wn, perm):
        # (B, C, V) <- wn[b, perm[c, v]]
        return jnp.take(wn, perm, axis=1)

    @jax.jit
    def gather_onehot(wn, perm):
        # permutation as one-hot matmul on the MXU, blocked over C
        def row(pr):  # pr: (V,) int32
            oh = jax.nn.one_hot(pr, V, dtype=jnp.bfloat16)  # (V, V)
            return (wn.astype(jnp.bfloat16) @ oh.T).astype(jnp.float32)

        return jax.lax.map(row, perm, batch_size=64)  # (C, B, V)

    @jax.jit
    def argsort_gather(p, wn):
        ps, perm = argsort2(p)
        return ps, gather_take(wn, perm)

    print(f"multi-operand sort ({B + 2} ops): {bench(sort_multi, p, wn):8.2f} ms")
    print(f"2-operand argsort:               {bench(argsort2, p):8.2f} ms")
    print(f"gather take (B,C,V):             {bench(gather_take, wn, jnp.argsort(p, axis=-1)):8.2f} ms")
    print(f"argsort+gather fused:            {bench(argsort_gather, p, wn):8.2f} ms")
    try:
        print(f"gather one-hot MXU:              {bench(gather_onehot, wn, jnp.argsort(p, axis=-1)):8.2f} ms")
    except Exception as e:  # remote compiler may reject the big map
        print("one-hot failed:", e)


if __name__ == "__main__":
    main()
