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
]
