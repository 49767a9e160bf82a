"""Multi-process (multi-host) training check.

The scale-out contract (SURVEY.md §2.3/§7) is that the SAME mesh program
runs from 1 chip to N hosts via jax.distributed.initialize. Real multi-host
hardware cannot be assumed in CI, so this module runs the shipped
DistanceEpochRunner training path over a REAL multi-process JAX runtime on
CPU (2+ processes x 4 virtual devices each, gloo collectives) and verifies
the losses match a single-process run of the same seed bit-for-bit.

Run one worker per process:

    python -m kf2vecfsw_tpu.parallel.mp_check <process_id> <num_processes> \
        <coordinator addr:port> <out.json>

Parent must set JAX_PLATFORMS=cpu and
XLA_FLAGS=--xla_force_host_platform_device_count=<local devices>.
All data staging goes through parallel.mesh.put_global /
make_array_from_callback — a raw device_put with a non-fully-addressable
sharding (the round-1 defect, train/chunks.py:539) would throw here.
"""

from __future__ import annotations

import json
import os
import sys


def run_worker(process_id: int, num_processes: int, coordinator: str, out_path: str | None):
    import jax

    jax.config.update("jax_platforms", "cpu")
    if num_processes > 1:
        jax.distributed.initialize(
            coordinator, num_processes=num_processes, process_id=process_id
        )

    import jax.numpy as jnp
    import numpy as np

    from ..models.mlp import dist_embed_apply, dist_embed_specs, init_dist_embed
    from ..train.step import DistanceEpochRunner, adam_init, lr_schedule_args
    from .mesh import MODEL_AXIS, make_mesh, put_global, replicated, shard_params

    key = jax.random.PRNGKey(0)
    n_items, v, h, e, batch, span = 8, 64, 32, 16, 4, 6
    mesh = make_mesh()  # all GLOBAL devices, data axis only

    specs = dist_embed_specs(MODEL_AXIS)
    # init on host so every process shards identical values
    host_params = jax.tree.map(np.asarray, jax.device_get(init_dist_embed(key, v, h, e)))
    params = shard_params(host_params, specs, mesh)
    opt = adam_init(params)

    rng = np.random.default_rng(0)
    feats = rng.normal(size=(n_items, v)).astype(np.float32)
    dist = np.abs(rng.normal(size=(n_items, n_items))).astype(np.float32)
    dist = dist + dist.T
    np.fill_diagonal(dist, 0.0)

    runner = DistanceEpochRunner(mesh, dist_embed_apply, specs, n_items, batch, donate=True)
    nb = runner.n_bucket
    feats_p = put_global(np.pad(feats, ((0, nb - n_items), (0, 0))), replicated(mesh))
    dist_p = put_global(
        np.pad(dist, ((0, nb - n_items), (0, nb - n_items))), replicated(mesh)
    )
    best = (jax.tree.map(jnp.copy, params), jnp.float32(np.inf), jnp.int32(-1))
    params, opt, best, losses = runner.run_epoch_span(
        params, opt, best, feats_p, dist_p, key, 0, span,
        lr_schedule_args(1e-2, 3e-6, 2000.0),
    )
    lv = [float(x) for x in np.asarray(jax.device_get(losses))]
    result = {
        "process_id": process_id,
        "num_processes": num_processes,
        "global_devices": len(jax.devices()),
        "losses": lv,
        "best_epoch": int(best[2]),
    }
    if out_path and process_id == 0:
        with open(out_path, "w") as f:
            json.dump(result, f)
    return result


def run_worker_chunks(
    process_id: int, num_processes: int, coordinator: str, fixture_dir: str, out_dir: str
):
    """Chunked distance trainer over a multi-process mesh, exercising the
    per-process sliced ingest + process-sharded prefix store path."""
    import glob

    import jax

    jax.config.update("jax_platforms", "cpu")
    if num_processes > 1:
        jax.distributed.initialize(
            coordinator, num_processes=num_processes, process_id=process_id
        )
    from ..train.chunks import train_model_set_chunks_func
    from .mesh import make_mesh

    files = sorted(glob.glob(os.path.join(fixture_dir, "chunks", "*.kf")))
    train_model_set_chunks_func(
        os.path.join(fixture_dir, "chunks"),
        os.path.join(fixture_dir, "full"),
        files,
        os.path.join(fixture_dir, "t.subtrees"),
        fixture_dir,
        6, 16, 8, 4, 1e-3, 3e-6, 2000, None, 28, False,
        out_dir,
        mesh=make_mesh(),
        log_every=10,
        autosave_every=0,
    )


def run_worker_chunks_classifier(
    process_id: int, num_processes: int, coordinator: str, fixture_dir: str, out_dir: str
):
    """Chunked CLASSIFIER trainer over a multi-process mesh (per-process
    sliced ingest + process-sharded prefix store)."""
    import glob

    import jax

    jax.config.update("jax_platforms", "cpu")
    if num_processes > 1:
        jax.distributed.initialize(
            coordinator, num_processes=num_processes, process_id=process_id
        )
    from ..train.chunks import train_classifier_chunks_func
    from .mesh import make_mesh

    files = sorted(glob.glob(os.path.join(fixture_dir, "chunks", "*.kf")))
    train_classifier_chunks_func(
        os.path.join(fixture_dir, "chunks"),
        os.path.join(fixture_dir, "full"),
        files,
        os.path.join(fixture_dir, "t.subtrees"),
        8, 16, 4, 1e-3, 3e-6, 2000, 28, False, False,
        out_dir,
        mesh=make_mesh(),
        log_every=10,
        autosave_every=0,
    )


def run_worker_distance(
    process_id: int, num_processes: int, coordinator: str, fixture_dir: str, out_dir: str
):
    """The flagship DENSE distance trainer (train_model_set.py:96 equivalent,
    train_model_set_func itself) over a multi-process mesh."""
    import glob

    import jax

    jax.config.update("jax_platforms", "cpu")
    if num_processes > 1:
        jax.distributed.initialize(
            coordinator, num_processes=num_processes, process_id=process_id
        )
    from ..train.distance import train_model_set_func
    from .mesh import make_mesh

    files = sorted(glob.glob(os.path.join(fixture_dir, "kf", "*.kf")))
    train_model_set_func(
        os.path.join(fixture_dir, "kf"),
        files,
        os.path.join(fixture_dir, "t.subtrees"),
        fixture_dir,
        8, 16, 8, 4, 1e-3, 3e-6, 2000, None, 28,
        out_dir,
        use_fsw=False,
        mesh=make_mesh(),
        log_every=10,
        autosave_every=0,
    )


def run_worker_fsw(
    process_id: int, num_processes: int, coordinator: str, fixture_dir: str, out_dir: str,
    lazy: bool = False,
):
    """The FSW (NeuralNetFSW) distance trainer over a multi-process mesh:
    the batched minor-axis sort + slice shards run under real cross-process
    collectives. lazy=True opts into the lazy sort-refresh runner
    (train/fsw_lazy.py) — requires a canonical full-vocab fixture so the
    shared-vocab path engages."""
    import glob

    import jax

    jax.config.update("jax_platforms", "cpu")
    if num_processes > 1:
        jax.distributed.initialize(
            coordinator, num_processes=num_processes, process_id=process_id
        )
    from ..train.distance import train_model_set_func
    from .mesh import make_mesh

    files = sorted(glob.glob(os.path.join(fixture_dir, "npy", "*.npy")))
    train_model_set_func(
        os.path.join(fixture_dir, "npy"),
        files,
        os.path.join(fixture_dir, "t.subtrees"),
        fixture_dir,
        8, 16, 8, 4, 1e-3, 3e-6, 2000, None, 28,
        out_dir,
        use_fsw=True,
        base_dim=2,
        fswout_dim=16,
        mesh=make_mesh(),
        log_every=10,
        autosave_every=0,
        fsw_lazy_refresh=2 if lazy else 0,
    )


def run_worker_resume(
    process_id: int, num_processes: int, coordinator: str, fixture_dir: str, out_dir: str
):
    """Kill-mid-run + -resume under a REAL multi-process mesh: train the
    dense classifier 8 epochs with autosaves ("crash" = the first call
    returning), then resume to 12. Exercises coordinator-only state writes
    plus the cross-process restored-epoch agreement guard
    (train/resume.py)."""
    import glob

    import jax

    jax.config.update("jax_platforms", "cpu")
    if num_processes > 1:
        jax.distributed.initialize(
            coordinator, num_processes=num_processes, process_id=process_id
        )
    from ..train.classifier import train_classifier_func
    from .mesh import make_mesh

    mesh = make_mesh()
    files = sorted(glob.glob(os.path.join(fixture_dir, "kf", "*.kf")))
    args = (
        os.path.join(fixture_dir, "kf"), files,
        os.path.join(fixture_dir, "t.subtrees"),
    )
    kw = dict(mesh=mesh, log_every=10, autosave_every=4)
    train_classifier_func(*args, 8, 16, 4, 1e-3, 3e-6, 2000, 28, False, out_dir, **kw)
    assert os.path.exists(os.path.join(out_dir, "trainer_state_classifier.ckpt"))
    train_classifier_func(
        *args, 12, 16, 4, 1e-3, 3e-6, 2000, 28, False, out_dir, resume=True, **kw
    )


def run_worker_counting(
    process_id: int, num_processes: int, coordinator: str, fixture_dir: str, out_dir: str
):
    """Sharded canonical counting over a multi-process mesh: per-device
    partial histograms + psum across processes, vs the numpy ground truth."""
    import json as _json

    import jax

    jax.config.update("jax_platforms", "cpu")
    if num_processes > 1:
        jax.distributed.initialize(
            coordinator, num_processes=num_processes, process_id=process_id
        )
    import numpy as np

    from ..kmer.counter import count_canonical_numpy
    from .counting import count_canonical_sharded
    from .mesh import make_mesh

    rng = np.random.default_rng(21)
    codes = rng.integers(0, 5, size=400_003).astype(np.uint8)
    k = 7
    got = count_canonical_sharded(codes, k, make_mesh())
    ref = count_canonical_numpy(codes, k)
    ok = bool(np.array_equal(got, ref))
    if process_id == 0:
        with open(os.path.join(out_dir, "counting.json"), "w") as f:
            _json.dump({"ok": ok, "total": int(got.sum())}, f)
    assert ok, "sharded multi-process counting diverged from numpy"


def run_worker_classifier(
    process_id: int, num_processes: int, coordinator: str, fixture_dir: str, out_dir: str
):
    """Dense classifier trainer over a multi-process mesh (replicated
    feature staging + coordinator-only writes)."""
    import glob

    import jax

    jax.config.update("jax_platforms", "cpu")
    if num_processes > 1:
        jax.distributed.initialize(
            coordinator, num_processes=num_processes, process_id=process_id
        )
    from ..train.classifier import train_classifier_func
    from .mesh import make_mesh

    files = sorted(glob.glob(os.path.join(fixture_dir, "kf", "*.kf")))
    train_classifier_func(
        os.path.join(fixture_dir, "kf"),
        files,
        os.path.join(fixture_dir, "t.subtrees"),
        10, 16, 4, 1e-3, 3e-6, 2000, 28, False,
        out_dir,
        mesh=make_mesh(),
        log_every=10,
        autosave_every=0,
    )


def launch_chunks(
    num_processes: int, fixture_dir: str, out_dir: str, local_devices: int = 4,
    timeout_s: float = 600.0, mode: str = "chunks",
):
    """Spawn chunked- (or dense-classifier-) trainer workers; the checkpoint
    lands in out_dir."""
    import socket
    import subprocess

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={local_devices}"
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "kf2vecfsw_tpu.parallel.mp_check", mode,
             str(p), str(num_processes), coord, fixture_dir, out_dir],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for p in range(num_processes)
    ]
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=timeout_s)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        if p.returncode != 0:
            raise RuntimeError(
                f"mp_check {mode} worker failed:\n{stdout.decode(errors='replace')[-3000:]}"
            )


def launch(num_processes: int, local_devices: int = 4, timeout_s: float = 300.0) -> dict:
    """Spawn num_processes workers (each with local_devices virtual CPU
    devices) and return process 0's result dict."""
    import socket
    import subprocess
    import tempfile

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    out = tempfile.mktemp(suffix=".json")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={local_devices}"
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "kf2vecfsw_tpu.parallel.mp_check",
             str(p), str(num_processes), coord, out],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for p in range(num_processes)
    ]
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=timeout_s)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout.decode(errors="replace"))
    for p, text in zip(procs, logs):
        if p.returncode != 0:
            raise RuntimeError(f"mp_check worker failed:\n{text[-2000:]}")
    with open(out) as f:
        return json.load(f)


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if argv and argv[0] == "chunks":
        run_worker_chunks(int(argv[1]), int(argv[2]), argv[3], argv[4], argv[5])
        return
    if argv and argv[0] == "classifier":
        run_worker_classifier(int(argv[1]), int(argv[2]), argv[3], argv[4], argv[5])
        return
    if argv and argv[0] == "counting":
        run_worker_counting(int(argv[1]), int(argv[2]), argv[3], argv[4], argv[5])
        return
    if argv and argv[0] == "chunks_classifier":
        run_worker_chunks_classifier(int(argv[1]), int(argv[2]), argv[3], argv[4], argv[5])
        return
    if argv and argv[0] == "distance":
        run_worker_distance(int(argv[1]), int(argv[2]), argv[3], argv[4], argv[5])
        return
    if argv and argv[0] == "fsw":
        run_worker_fsw(int(argv[1]), int(argv[2]), argv[3], argv[4], argv[5])
        return
    if argv and argv[0] == "fsw_lazy":
        run_worker_fsw(int(argv[1]), int(argv[2]), argv[3], argv[4], argv[5], lazy=True)
        return
    if argv and argv[0] == "resume":
        run_worker_resume(int(argv[1]), int(argv[2]), argv[3], argv[4], argv[5])
        return
    pid, nproc, coord = int(argv[0]), int(argv[1]), argv[2]
    out = argv[3] if len(argv) > 3 else None
    run_worker(pid, nproc, coord, out)


if __name__ == "__main__":
    main()
