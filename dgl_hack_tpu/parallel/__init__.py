from .spmd import (  # noqa: F401
    make_mesh, make_spmd_train_step, replicate, shard_graph, shard_params,
    shard_rows,
)
