from rgcn_tpu.nn.layers import DistMult, RGCNConv, TorchLinear

__all__ = ["RGCNConv", "DistMult", "TorchLinear"]
