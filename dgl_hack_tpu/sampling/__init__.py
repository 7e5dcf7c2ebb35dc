from .neighbor import (  # noqa: F401
    sample_neighbors, MultiLayerNeighborSampler, NodeDataLoader,
    GraphDataLoader, select_topk, sample_layer_neighbors,
    EdgeSampler,
)
from .randomwalk import (  # noqa: F401
    random_walk, node2vec_random_walk, random_walk_with_restart,
)
from .negative import (  # noqa: F401
    uniform_negative_edges, ChunkedNegativeSampler,
)
from .randomwalk import metapath_random_walk, pack_traces  # noqa: F401
from .pinsage import RandomWalkNeighborSampler, PinSAGESampler  # noqa: F401
