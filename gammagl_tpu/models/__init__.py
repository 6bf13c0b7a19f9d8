"""Model zoo (reference: gammagl/models/__init__.py:75-159)."""

from gammagl_tpu.models.gcn import GCNModel
from gammagl_tpu.models.gat import GATModel, GATV2Model
from gammagl_tpu.models.graphsage import (GraphSAGEModel,
                                          GraphSAGESampleModel)
from gammagl_tpu.models.simple_models import (
    SGCModel, GINModel, APPNPModel, GCNIIModel, JKNet, MLP, ChebNetModel,
    MixHopModel, GPRGNNModel, FAGCNModel)
from gammagl_tpu.models.hetero import (RGCNModel, HANModel, HGTModel,
                                       SimpleHGNModel)
from gammagl_tpu.models.embedding import DeepWalk, Node2Vec, MetaPath2Vec
from gammagl_tpu.models.ssl import (DGIModel, GraceModel, MVGRLModel,
                                    InfoGraph, GGDModel, grace_loss,
                                    corrupt_features,
                                    drop_edge_and_feature)
from gammagl_tpu.models.autoencoder import (GAEModel, VGAEModel,
                                            inner_product_decoder,
                                            recon_loss)
from gammagl_tpu.models.graphormer import GraphormerModel
from gammagl_tpu.models.wave2_models import (PNAModel, CompGCNModel,
                                             DGCNNModel, GaANModel)
from gammagl_tpu.models.wave3_models import (SGFormerModel, GNNLFHFModel,
                                             HiDNetModel, CAGCNModel,
                                             HPNModel, ieHGCNModel,
                                             RoheHANModel, MERITModel,
                                             GRADEModel, tadw)
from gammagl_tpu.models.spectral import (SpecformerModel, laplacian_eigh,
                                         MGNNIModel)
from gammagl_tpu.models.heco import HeCoModel, heco_contrast_loss
from gammagl_tpu.models.gan_distill import (GraphGAN, herec, distill_loss,
                                            GLNNStudent)
from gammagl_tpu.models.wave5_models import (SIGNModel, GCNUniFews,
                                             HardGATConv, HardGATModel,
                                             AdaGADModel, Sp2GCLModel)
from gammagl_tpu.models.defog import (DeFoGModel, XEyTransformerLayer,
                                      timestep_embedding, flow_interpolate,
                                      euler_sample_step)
from gammagl_tpu.models.graph_llm import (GraphTextCLIP, GraphLlamaAdapter,
                                          LLaGAEncoder,
                                          splice_graph_embeddings)

__all__ = [
    "GCNModel",
    "GATModel",
    "GATV2Model",
    "GraphSAGEModel",
    "GraphSAGESampleModel",
    "SGCModel",
    "GINModel",
    "APPNPModel",
    "GCNIIModel",
    "JKNet",
    "MLP",
    "ChebNetModel",
    "MixHopModel",
    "GPRGNNModel",
    "FAGCNModel",
    "RGCNModel",
    "HANModel",
    "HGTModel",
    "SimpleHGNModel",
    "DeepWalk",
    "Node2Vec",
    "MetaPath2Vec",
    "DGIModel",
    "GraceModel",
    "MVGRLModel",
    "InfoGraph",
    "GGDModel",
    "grace_loss",
    "corrupt_features",
    "drop_edge_and_feature",
    "GAEModel",
    "VGAEModel",
    "inner_product_decoder",
    "recon_loss",
    "GraphormerModel",
    "PNAModel",
    "CompGCNModel",
    "DGCNNModel",
    "GaANModel",
    "SGFormerModel",
    "GNNLFHFModel",
    "HiDNetModel",
    "CAGCNModel",
    "HPNModel",
    "ieHGCNModel",
    "RoheHANModel",
    "MERITModel",
    "GRADEModel",
    "tadw",
    "SpecformerModel",
    "laplacian_eigh",
    "MGNNIModel",
    "HeCoModel",
    "heco_contrast_loss",
    "GraphGAN",
    "herec",
    "distill_loss",
    "GLNNStudent",
    "SIGNModel",
    "GCNUniFews",
    "HardGATConv",
    "HardGATModel",
    "AdaGADModel",
    "Sp2GCLModel",
    "DeFoGModel",
    "XEyTransformerLayer",
    "timestep_embedding",
    "flow_interpolate",
    "euler_sample_step",
    "GraphTextCLIP",
    "GraphLlamaAdapter",
    "LLaGAEncoder",
    "splice_graph_embeddings",
]
