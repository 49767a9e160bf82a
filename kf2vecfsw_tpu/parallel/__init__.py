from .mesh import make_mesh, shard_params, DATA_AXIS, MODEL_AXIS
