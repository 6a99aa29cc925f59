from rgcn_tpu.data.loaders import (
    LinkPredictionData,
    NodeClassificationData,
    load_link_prediction,
    load_node_classification,
)

__all__ = [
    "NodeClassificationData",
    "LinkPredictionData",
    "load_node_classification",
    "load_link_prediction",
]
