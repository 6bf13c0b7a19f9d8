"""Conv zoo (reference: gammagl/layers/conv/__init__.py:40-80)."""

from gammagl_tpu.layers.conv.message_passing import MessagePassing
from gammagl_tpu.layers.conv.gcn_conv import GCNConv
from gammagl_tpu.layers.conv.gat_conv import GATConv, GATV2Conv
from gammagl_tpu.layers.conv.sage_conv import SAGEConv
from gammagl_tpu.layers.conv.simple_convs import (
    SGConv, GINConv, APPNPConv, GCNIIConv, ChebConv, AGNNConv, FAGCNConv,
    GPRConv, MixHopConv, JumpingKnowledge)
from gammagl_tpu.layers.conv.rgcn_conv import RGCNConv
from gammagl_tpu.layers.conv.hetero_conv import (HeteroConv, HANConv,
                                                 HGTConv, SimpleHGNConv)
from gammagl_tpu.layers.conv.wave2_convs import (PNAConv, FILMConv,
                                                 EdgeConv, GMMConv,
                                                 CompConv, GaANConv,
                                                 DNAConv, HypergraphConv)
from gammagl_tpu.layers.conv.hetero_wave2 import (HPNConv, ieHGCNConv,
                                                  HidConv, RoheHANConv)
from gammagl_tpu.layers.conv.wave7_convs import (DHNConv, HEATConv,
                                                 CoEDConv)

from gammagl_tpu.layers.conv.rgt_layers import (ConstCurveLinear, ConstCurveAgg, EuclideanEncoder, ManifoldEncoder)
from gammagl_tpu.layers.conv.rgt_vq import VectorQuantizeE, VectorQuantizeR
from gammagl_tpu.layers.conv.compat_convs import (FusedGATConv, MAGCLConv,
                                                  MGNNI_m_iter)

# reference spellings (gammagl/layers/conv/__init__.py)
HEATlayer = HEATConv
Hid_conv = HidConv


def __getattr__(name):
    # HardGATConv's canonical home is models.wave5_models (it is built on
    # this package, so a top-level import here would be circular); resolve
    # the reference spelling lazily.
    if name == "HardGATConv":
        from gammagl_tpu.models.wave5_models import HardGATConv
        return HardGATConv
    raise AttributeError(name)


__all__ = [
    "FusedGATConv",
    "MAGCLConv",
    "MGNNI_m_iter",
    "HEATlayer",
    "Hid_conv",
    "HardGATConv",
    "MessagePassing",
    "GCNConv",
    "GATConv",
    "GATV2Conv",
    "SAGEConv",
    "SGConv",
    "GINConv",
    "APPNPConv",
    "GCNIIConv",
    "ChebConv",
    "AGNNConv",
    "FAGCNConv",
    "GPRConv",
    "MixHopConv",
    "JumpingKnowledge",
    "RGCNConv",
    "HeteroConv",
    "HANConv",
    "HGTConv",
    "SimpleHGNConv",
    "PNAConv",
    "FILMConv",
    "EdgeConv",
    "GMMConv",
    "CompConv",
    "GaANConv",
    "DNAConv",
    "HypergraphConv",
    "HPNConv",
    "ieHGCNConv",
    "HidConv",
    "RoheHANConv",
    "DHNConv",
    "HEATConv",
    "CoEDConv",
    "ConstCurveLinear",
    "ConstCurveAgg",
    "EuclideanEncoder",
    "ManifoldEncoder",
    "VectorQuantizeE",
    "VectorQuantizeR",
]
