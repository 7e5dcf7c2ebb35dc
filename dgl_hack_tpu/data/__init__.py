"""Datasets (counterpart of python/dgl/data/)."""
from .citation import (  # noqa: F401
    CoraGraphDataset, CiteseerGraphDataset, PubmedGraphDataset,
    RedditDataset,
)
from .io import (  # noqa: F401
    save_graphs, load_graphs, save_heterograph, load_heterograph,
)
from .karate import KarateClubDataset  # noqa: F401
from .rdf import AIFBDataset, MUTAGDataset, BGSDataset, AMDataset, load_rdf_dataset  # noqa: F401
from .kg import load_kg_dataset, KGDataset, synthetic_kg  # noqa: F401
from .graph_classification import (  # noqa: F401
    GraphClassificationDataset, sbm_mixture, TUDatasetSynthetic,
)
from .extra import (  # noqa: F401
    PPIDataset, load_ppi, TUDataset, GINDataset,
    AmazonCoBuyComputerDataset, AmazonCoBuyPhotoDataset,
    CoauthorCSDataset, CoauthorPhysicsDataset, CoraFullDataset,
    BitcoinOTCDataset, load_bitcoinotc, QM7bDataset, load_qm7b,
    TemporalKGDataset, GDELTDataset, ICEWS18Dataset,
)
from .synthetic import (  # noqa: F401
    NodeClassificationDataset, planted_partition, synthetic_cora,
    synthetic_reddit, random_power_law_graph,
)
from .chem import (  # noqa: F401
    MoleculeCSVDataset, Tox21, PubChemBioAssayAromaticity,
    TencentAlchemyDataset, atom_featurizer, bond_featurizer,
)
