"""Dataset zoo (reference: gammagl/datasets/__init__.py -- 32 exports)."""

from gammagl_tpu.datasets.planetoid import Planetoid
from gammagl_tpu.datasets.real_structure import (load_real_structure,
                                                 real_structure_available)
from gammagl_tpu.datasets.npz_datasets import (Amazon, Coauthor,
                                               FacebookPagePage,
                                               DeezerEurope, GitHub)
from gammagl_tpu.datasets.tu_dataset import TUDataset
from gammagl_tpu.datasets.reddit import Reddit
from gammagl_tpu.datasets.ppi import PPI
from gammagl_tpu.datasets.wikics import WikiCS
from gammagl_tpu.datasets.geom_gcn import WebKB, WikipediaNetwork, Actor
from gammagl_tpu.datasets.synthetic import (StochasticBlockModelDataset,
                                            synthetic_community_graph)
from gammagl_tpu.datasets.hetero_datasets import IMDB, DBLP, HGBDataset
from gammagl_tpu.datasets.saint_datasets import Flickr, Yelp
from gammagl_tpu.datasets.misc_datasets import (PolBlogs, BlogCatalog,
                                                CAGrQc, Airports, Entities,
                                                ZINC)
from gammagl_tpu.datasets.wave3_datasets import (ACM4HeCo, Bail, Credit,
                                                 AMiner, MoleculeNet,
                                                 MovieLens, CustomDataset)

from gammagl_tpu.datasets.ogb import OgbNodeDataset
from gammagl_tpu.datasets.wave4_datasets import (ModelNet40, ShapeNet, NGSIM_US_101, ACM4DHN, ACM4Rohe, ADDataset, AliRCD)

__all__ = [
    "Planetoid",
    "load_real_structure",
    "real_structure_available",
    "Amazon",
    "Coauthor",
    "FacebookPagePage",
    "DeezerEurope",
    "GitHub",
    "TUDataset",
    "Reddit",
    "PPI",
    "WikiCS",
    "WebKB",
    "WikipediaNetwork",
    "Actor",
    "StochasticBlockModelDataset",
    "synthetic_community_graph",
    "IMDB",
    "DBLP",
    "HGBDataset",
    "Flickr",
    "Yelp",
    "PolBlogs",
    "BlogCatalog",
    "CAGrQc",
    "CA_GrQc",
    "Airports",
    "Entities",
    "ZINC",
    "ACM4HeCo",
    "Bail",
    "Credit",
    "AMiner",
    "MoleculeNet",
    "MovieLens",
    "CustomDataset",
    "ModelNet40",
    "ShapeNet",
    "NGSIM_US_101",
    "ACM4DHN",
    "ACM4Rohe",
    "ADDataset",
    "AliRCD",
    "OgbNodeDataset",
]

# reference spelling (gammagl/datasets/__init__.py exports CA_GrQc)
CA_GrQc = CAGrQc
