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


def initialize_distributed() -> bool:
    """Multi-host bring-up: when the standard JAX cluster env vars are set
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, or a
    supported cluster environment), initialize the distributed runtime so
    jax.devices() spans all hosts and the same mesh code runs across DCN.
    Returns True if initialization happened."""
    import os

    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    ):
        jax.distributed.initialize()
        return True
    return False


def shard_params(params, specs, mesh: Mesh):
    """Place a parameter pytree according to per-leaf PartitionSpecs."""
    return jax.tree.map(
        lambda p, s: jax.device_put(p, NamedSharding(mesh, s)), params, specs
    )


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())
