"""NN layer zoo (counterpart of python/dgl/nn/pytorch/)."""
from .conv import (  # noqa: F401
    GraphConv, GATConv, SAGEConv, RelGraphConv, GINConv, SGConv, APPNPConv,
    TAGConv, ChebConv, AGNNConv, EdgeConv, GatedGraphConv, NNConv,
    DenseGraphConv,
)
from .glob import (  # noqa: F401
    SumPooling, AvgPooling, MaxPooling, SortPooling,
    GlobalAttentionPooling, Set2Set, SetTransformerEncoder,
    SetTransformerDecoder, WeightAndSum,
)
from .conv_extra import (  # noqa: F401
    GMMConv, DenseSAGEConv, DenseChebConv, KNNGraph, SegmentedKNNGraph,
    AtomicConv, WeaveLayer, WeaveGNN, WLN,
)
from .hetero import HeteroGraphConv  # noqa: F401
from ..ops.edge_softmax import edge_softmax  # noqa: F401
from .utils import Sequential, WeightBasis, Identity  # noqa: F401
