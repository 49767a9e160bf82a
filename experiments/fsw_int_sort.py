"""Experiment: is XLA's TPU sort faster on int32 keys than f32 keys?

f32 comparators carry NaN/-0.0 totality logic; the standard monotone
bijection f32 -> int32 (flip magnitude bits of negatives) lets the sort
run integer comparators instead. If the int-keyed sort is much faster,
both the shared-vocab FSW forward (18-operand sort) and the exact
backward unsort get it for free.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

B, C, V = 16, 512, 8192


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


def i2f(k):
    i = jnp.where(k < 0, k ^ jnp.int32(0x7FFFFFFF), k)
    return jax.lax.bitcast_convert_type(i, jnp.float32)


def main():
    key = jax.random.PRNGKey(0)
    p = jax.random.normal(key, (C, V), jnp.float32)
    wn = jax.random.uniform(jax.random.PRNGKey(1), (B, V), jnp.float32)
    perm = jnp.argsort(p, axis=-1).astype(jnp.int32)

    @jax.jit
    def sort2_f32(p):
        iota = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1)
        return jax.lax.sort((p, iota), dimension=-1, is_stable=False, num_keys=1)

    @jax.jit
    def sort2_i32(p):
        k = f2i(p)
        iota = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1)
        ks, pe = jax.lax.sort((k, iota), dimension=-1, is_stable=False, num_keys=1)
        return i2f(ks), pe

    @jax.jit
    def sort2_u32(p):
        # alternative: unsigned map (add 0x80000000 after flip)
        i = jax.lax.bitcast_convert_type(p, jnp.uint32)
        k = jnp.where(i >> 31 != 0, ~i, i | jnp.uint32(0x80000000))
        iota = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1)
        return jax.lax.sort((k, iota), dimension=-1, is_stable=False, num_keys=1)

    @jax.jit
    def sort18_f32(p, wn):
        ops = (p,) + tuple(jnp.broadcast_to(wn[b][None, :], p.shape) for b in range(B))
        iota = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1)
        res = jax.lax.sort(ops + (iota,), dimension=-1, is_stable=False, num_keys=1)
        return res[0], jnp.stack(res[1:-1]), res[-1]

    @jax.jit
    def sort18_i32(p, wn):
        k = f2i(p)
        ops = (k,) + tuple(jnp.broadcast_to(wn[b][None, :], p.shape) for b in range(B))
        iota = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1)
        res = jax.lax.sort(ops + (iota,), dimension=-1, is_stable=False, num_keys=1)
        return i2f(res[0]), jnp.stack(res[1:-1]), res[-1]

    @jax.jit
    def unsort_i32(perm, dps):
        return jax.lax.sort((perm, dps), dimension=-1, is_stable=False, num_keys=1)

    dps = jax.random.normal(jax.random.PRNGKey(2), (C, V), jnp.float32)

    print(f"2-op sort  f32 keys: {bench(sort2_f32, p):8.2f} ms")
    print(f"2-op sort  i32 keys: {bench(sort2_i32, p):8.2f} ms")
    print(f"2-op sort  u32 keys: {bench(sort2_u32, p):8.2f} ms")
    print(f"18-op sort f32 keys: {bench(sort18_f32, p, wn):8.2f} ms")
    print(f"18-op sort i32 keys: {bench(sort18_i32, p, wn):8.2f} ms")
    print(f"unsort (i32 keys, f32 payload): {bench(unsort_i32, perm, dps):8.2f} ms")

    # correctness of the bijection
    ps_ref = np.sort(np.asarray(p), axis=-1)
    ps_i = np.asarray(sort2_i32(p)[0])
    print("i32 bijection exact:", bool((ps_ref == ps_i).all()))


if __name__ == "__main__":
    main()
