"""Model zoo (counterpart of the reference's examples/pytorch/*)."""
from .gnn_models import GCN, GAT, GraphSAGE, RGCN, GIN, MLPPredictor  # noqa: F401
from . import chem  # noqa: F401
from .chem import (  # noqa: F401
    SchNet, MGCN, MPNN, AttentiveFP, GCNClassifier, GATClassifier, ACNN,
    WeavePredictor, WLNPredictor,
)
from .dgmg import DGMG, build_action_trace  # noqa: F401
