"""Model zoo (counterpart of the reference's examples/pytorch/*)."""
from .gnn_models import GCN, GAT, GraphSAGE, RGCN, GIN, MLPPredictor  # noqa: F401
