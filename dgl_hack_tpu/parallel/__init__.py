from .spmd import (  # noqa: F401
    make_mesh, make_spmd_train_step, replicate, shard_graph, shard_params,
    shard_rows,
)
from .halo import (  # noqa: F401
    SpatialPlan, build_spatial_plan, shard_features, unshard_rows,
    make_halo_gspmm, make_spatial_gcn, spatial_train_step,
)
