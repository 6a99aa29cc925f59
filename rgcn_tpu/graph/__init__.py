from rgcn_tpu.graph.augment import (
    augment_triples,
    inverse_triples,
    self_loop_triples,
)
from rgcn_tpu.graph.structure import EdgeSet, build_edge_set, edge_normalization
from rgcn_tpu.graph.dynamic import (
    build_edge_set_dynamic,
    padded_size,
    self_loop_keep_mask,
)

__all__ = [
    "augment_triples",
    "inverse_triples",
    "self_loop_triples",
    "EdgeSet",
    "build_edge_set",
    "edge_normalization",
    "build_edge_set_dynamic",
    "padded_size",
    "self_loop_keep_mask",
]
