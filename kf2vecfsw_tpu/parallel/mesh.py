"""Device mesh and sharding helpers.

The scale-out model (SURVEY.md §2.3): a 2-D mesh ('data', 'model') over all
chips/hosts. Batches are sharded over 'data' (the reference's
torch.nn.DataParallel, train_model_set.py:377, generalized to multi-host via
ICI/DCN collectives); the MLP hidden dimension can additionally be sharded
over 'model' (tensor parallel — unnecessary at the reference's sizes but free
with the same code path). Gradients are psum'd over 'data' inside the jitted
step; there is no separate communication backend to configure
(`jax.distributed.initialize` extends the same program to multi-host).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data: int | None = None, n_model: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = n // n_model
    assert n_data * n_model <= n, f"mesh {n_data}x{n_model} exceeds {n} devices"
    dev_array = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def _cluster_detectable() -> bool:
    """Multi-process launch detectable without explicit JAX env vars: SLURM
    / OpenMPI task counts > 1, or a multi-worker Cloud TPU pod slice (JAX's
    cluster plugins auto-fill coordinator/process params in these envs)."""
    import os

    env = os.environ
    try:
        if env.get("SLURM_JOB_ID") and int(env.get("SLURM_NTASKS") or 1) > 1:
            return True
        if int(env.get("OMPI_COMM_WORLD_SIZE") or 1) > 1:
            return True
    except ValueError:
        pass
    if env.get("MEGASCALE_COORDINATOR_ADDRESS"):
        return True
    if (env.get("TPU_WORKER_HOSTNAMES") or "").count(",") >= 1:
        return True
    return False


def initialize_distributed() -> bool:
    """Multi-host bring-up: when the standard JAX cluster env vars are set
    (JAX_COORDINATOR_ADDRESS / COORDINATOR_ADDRESS), or a multi-process
    cluster launch is auto-detectable (SLURM/MPI/TPU-pod — environments
    where JAX's cluster plugins fill in the coordinator), initialize the
    distributed runtime so jax.devices() spans all hosts and the same mesh
    code runs across DCN. Without this, each host would silently train an
    independent copy on its local chips. Returns True if initialization
    happened."""
    import os

    if jax.distributed.is_initialized():
        # idempotent: one process may dispatch several CLI stages (the
        # build_library wrapper, bench.py's staged pipeline, the serve
        # daemon) and jax.distributed.initialize() raises on a second call
        return True
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    ):
        jax.distributed.initialize()
        return True
    if _cluster_detectable():
        # plugin auto-detection: let a failure surface loudly rather than
        # proceed as N independent single-host jobs racing the output dir
        jax.distributed.initialize()
        return True
    return False


def put_global(arr, sharding: NamedSharding):
    """Place a host array under a global-mesh sharding, multi-process-safe.

    Single-process: plain device_put. Multi-process: every process holds the
    FULL array (replicated ingest — params, dense feature matrices) and
    materializes only its addressable shards via make_array_from_callback;
    a raw device_put with a non-fully-addressable sharding would throw."""
    import numpy as np

    arr = np.asarray(arr)
    if jax.process_count() == 1:
        return jax.device_put(arr, sharding)
    return jax.make_array_from_callback(arr.shape, sharding, lambda idx: arr[idx])


def put_global_rows(local_rows, n_global_rows: int, sharding: NamedSharding):
    """Assemble a leading-axis-sharded global array from this process's OWN
    rows (each host stages only its slice — the multi-host batch/ingest
    path). local_rows must be exactly this process's addressable rows in
    device order; see jax.make_array_from_process_local_data."""
    import numpy as np

    local_rows = np.asarray(local_rows)
    if jax.process_count() == 1:
        return jax.device_put(local_rows, sharding)
    global_shape = (n_global_rows,) + local_rows.shape[1:]
    return jax.make_array_from_process_local_data(sharding, local_rows, global_shape)


def process_row_slice(n_rows: int, mesh: Mesh, axis: str = DATA_AXIS) -> slice:
    """The contiguous [lo, hi) slice of a leading-axis-sharded (P(axis))
    array that THIS process's devices own. Mesh axes are laid out with
    process-local device blocks contiguous (make_mesh uses jax.devices()
    order), so each process owns one contiguous row range."""
    n_proc = jax.process_count()
    if n_proc == 1:
        return slice(0, n_rows)
    per, rem = divmod(n_rows, n_proc)
    if rem:
        # a remainder-to-last split would MISMATCH JAX's ceil-based shard
        # layout and corrupt make_array_from_process_local_data placement;
        # every current caller pads to a device multiple first — fail loudly
        # rather than hand back wrong rows
        raise ValueError(
            f"process_row_slice: {n_rows} rows not divisible by "
            f"{n_proc} processes — pad the leading axis first"
        )
    p = jax.process_index()
    return slice(p * per, (p + 1) * per)


def shard_params(params, specs, mesh: Mesh):
    """Place a parameter pytree according to per-leaf PartitionSpecs
    (multi-process-safe: every process passes identical host values)."""
    return jax.tree.map(
        lambda p, s: put_global(p, NamedSharding(mesh, s)), params, specs
    )


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def fetch_replicated(tree, mesh: Mesh):
    """Device tree -> host numpy tree, correct for ANY sharding.

    Model-axis-sharded leaves (e.g. FSW slices under P('model', None)) are
    first re-laid-out as fully replicated — a jitted identity with
    replicated out_shardings, i.e. an all-gather over the mesh — so the
    subsequent device_get never touches non-addressable shards on
    multi-host meshes. EVERY process must call this (the gather is a
    collective); gate any file writes on is_coordinator afterwards."""
    rep = NamedSharding(mesh, P())
    leaves = jax.tree.leaves(tree)
    if all(
        getattr(x, "sharding", None) is None or x.sharding.is_fully_replicated
        for x in leaves
    ):
        return jax.device_get(tree)
    gathered = jax.jit(
        lambda t: t,
        out_shardings=jax.tree.map(lambda _: rep, tree),
    )(tree)
    return jax.device_get(gathered)
