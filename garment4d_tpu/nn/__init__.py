"""NN building blocks (reference L2 layer, SURVEY.md 2.2)."""

from garment4d_tpu.nn.layers import MLP, ConvBNRelu, GraphConvolution, SharedMLP
from garment4d_tpu.nn.pointnet import FPModule, SAModule, SAModuleMSG

__all__ = [
    "MLP",
    "ConvBNRelu",
    "GraphConvolution",
    "SharedMLP",
    "FPModule",
    "SAModule",
    "SAModuleMSG",
]
