"""Model family: rgcn / e-rgcn (node classification), rgcn / c-rgcn (link
prediction) — the capability set of the reference
(``/root/reference/torch_rgcn/models.py``)."""

from rgcn_tpu.models.node_classification import (
    EmbeddingNodeClassifier,
    NodeClassifier,
)
from rgcn_tpu.models.link_prediction import (
    CompressionRelationPredictor,
    LinkPredictor,
)

__all__ = [
    "NodeClassifier",
    "EmbeddingNodeClassifier",
    "LinkPredictor",
    "CompressionRelationPredictor",
]
