import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax
jax.devices()  # raises if tunnel down
import kf2vecfsw_tpu.kernels.histogram as H
rng = np.random.default_rng(0)
codes = rng.integers(0, 4, size=5_000_000).astype(np.uint8)
mb = codes.size / 1e6
packed, inv, _ = H.pack_2bit(codes)
pd, iv = jax.device_put(packed), jax.device_put(inv)
np.asarray(pd[:8])
for kk in (9, 10, 11, 12, 13):
    fold, tab = H._kfree_fold(kk, codes.size)
    np.asarray(H._count_kfree_jit(pd, iv, tab, kk, fold)[:4])
    dts = float("inf"); reps = 4
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [H._count_kfree_jit(pd, iv, tab, kk, fold) for _ in range(reps)]
        for o in outs: np.asarray(o[:4])
        dts = min(dts, (time.perf_counter()-t0)/reps)
    print(f"chip k={kk} fold={'rank' if fold else 'vocab'}: {mb/dts:.1f} MB/s ({dts*1e3:.1f} ms)", flush=True)
