"""Typed experiment configuration with the reference's YAML schema.

The reference injects raw YAML dicts through sacred and unpacks them with
``cfg["k"] if "k" in cfg else default`` idioms scattered across the runners
(``/root/reference/experiments/classify_nodes.py:29-38``,
``predict_links.py:35-47``) and model constructors. Here the same section/key
names (``dataset`` / ``training`` / ``rgcn`` / ``encoder`` / ``decoder`` /
``evaluation``) parse into frozen dataclasses with the same defaults, so the
reference's 12 config files map 1:1.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, Optional

import yaml

__all__ = [
    "DatasetConfig",
    "OptimiserConfig",
    "NegativeSamplingConfig",
    "TrainingConfig",
    "DecompositionConfig",
    "EdgeDropoutConfig",
    "RGCNConfig",
    "EncoderConfig",
    "DecoderConfig",
    "EvaluationConfig",
    "NodeClassificationExperiment",
    "LinkPredictionExperiment",
    "load_experiment",
]


@dataclass(frozen=True)
class DatasetConfig:
    name: str
    prune: bool = False


@dataclass(frozen=True)
class OptimiserConfig:
    algorithm: str = "adam"
    weight_decay: float = 0.0
    learn_rate: float = 0.01


@dataclass(frozen=True)
class NegativeSamplingConfig:
    sampling_rate: int = 10
    head_prob: float = 0.5


@dataclass(frozen=True)
class TrainingConfig:
    epochs: int = 50
    optimiser: OptimiserConfig = OptimiserConfig()
    use_cuda: bool = False  # accepted for config compat; device is JAX's
    graph_batch_size: Optional[int] = None
    sampling_method: str = "uniform"
    negative_sampling: Optional[NegativeSamplingConfig] = None


@dataclass(frozen=True)
class DecompositionConfig:
    type: str  # 'basis' | 'block'
    num_bases: int = 0
    num_blocks: int = 0


@dataclass(frozen=True)
class EdgeDropoutConfig:
    general: float = 0.0
    self_loop: float = 0.0
    self_loop_type: str = "none"  # 'schlichtkrull-dropout' | anything else


@dataclass(frozen=True)
class RGCNConfig:
    """``rgcn:`` section of node-classification configs."""

    model: str = "rgcn"  # 'rgcn' | 'e-rgcn'
    num_layers: int = 2
    hidden_size: int = 16
    node_embeddings: int = 10  # e-rgcn embedding width (classify_nodes.py:36)
    decomposition: Optional[DecompositionConfig] = None
    edge_dropout: Optional[EdgeDropoutConfig] = None
    layer1_l2_penalty: float = 0.0
    node_embedding_l2_penalty: float = 0.0


@dataclass(frozen=True)
class EncoderConfig:
    """``encoder:`` section of link-prediction configs."""

    model: str = "rgcn"  # 'rgcn' | 'c-rgcn'
    num_layers: int = 2  # reference default (models.py:28)
    node_embedding: Optional[int] = None
    hidden1_size: Optional[int] = None
    hidden2_size: Optional[int] = None
    decomposition: Optional[DecompositionConfig] = None
    edge_dropout: Optional[EdgeDropoutConfig] = None
    weight_init: str = "glorot-normal"
    include_gain: bool = False
    bias_init: Optional[str] = None
    node_embedding_l2_penalty: float = 0.0


@dataclass(frozen=True)
class DecoderConfig:
    model: str = "distmult"
    l2_penalty_type: Optional[str] = None
    l2_penalty: float = 0.0
    weight_init: str = "standard-normal"
    include_gain: bool = False
    bias_init: Optional[str] = None
    # 'bfloat16' narrows the structured scorer's BACKWARD (gather table +
    # residual reads; f32 accumulation). Forward scores are bit-identical;
    # gradients lose mantissa — measured step speedup, opt-in until real-
    # dataset metric neutrality is provable (no datasets in this image).
    # Applies only to the HOST-LAYOUT structured path; the fully in-jit
    # layout-free path has no sorted aggregation to narrow (a set value
    # warns and is ignored there — see ops/pallas_distmult.py).
    bwd_dtype: Optional[str] = None


@dataclass(frozen=True)
class EvaluationConfig:
    final_run: bool = False
    filtered: bool = False
    check_every: int = 2000
    batch_size: int = 16
    verbose: bool = False


@dataclass(frozen=True)
class NodeClassificationExperiment:
    dataset: DatasetConfig
    training: TrainingConfig
    rgcn: RGCNConfig
    evaluation: EvaluationConfig
    repeats: int = 1


@dataclass(frozen=True)
class LinkPredictionExperiment:
    dataset: DatasetConfig
    training: TrainingConfig
    encoder: EncoderConfig
    decoder: DecoderConfig
    evaluation: EvaluationConfig

    def structured_decoder_ok(self, pallas: bool) -> bool:
        """Is the structured-negatives production decoder (3P+Ns query
        gathers, sorted scatter-free backward — ops/pallas_distmult.py)
        applicable? ONE predicate shared by the single-device trainer and
        the sharded driver, so the two dispatch sites cannot diverge:
        bias-free scoring with a schlichtkrull-or-off L2, on the Pallas
        backend."""
        return (
            pallas
            and self.decoder.bias_init is None
            and (
                self.decoder.l2_penalty == 0.0
                or self.decoder.l2_penalty_type == "schlichtkrull-l2"
            )
        )


def _build(cls, raw: Optional[Dict[str, Any]]):
    """Construct a (possibly nested) config dataclass from a raw dict,
    ignoring unknown keys (the reference tolerates extras the same way)."""
    raw = dict(raw or {})
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in raw:
            continue
        v = raw.pop(f.name)
        if f.name == "optimiser":
            v = _build(OptimiserConfig, v)
        elif f.name == "negative_sampling":
            v = _build(NegativeSamplingConfig, v) if v is not None else None
        elif f.name == "decomposition":
            v = _build(DecompositionConfig, v) if v is not None else None
        elif f.name == "edge_dropout":
            v = _build(EdgeDropoutConfig, v) if v is not None else None
        kwargs[f.name] = v
    return cls(**kwargs)


def load_experiment(path_or_dict):
    """Load a YAML config file (or raw dict) into the right experiment type.

    NC configs have an ``rgcn`` section, LP configs ``encoder``/``decoder``
    (see ``/root/reference/configs``).
    """
    if isinstance(path_or_dict, dict):
        raw = path_or_dict
    else:
        with open(path_or_dict, "r") as f:
            raw = yaml.safe_load(f)

    dataset = _build(DatasetConfig, raw.get("dataset"))
    training = _build(TrainingConfig, raw.get("training"))
    evaluation = _build(EvaluationConfig, raw.get("evaluation"))

    if "rgcn" in raw:
        return NodeClassificationExperiment(
            dataset=dataset,
            training=training,
            rgcn=_build(RGCNConfig, raw.get("rgcn")),
            evaluation=evaluation,
            repeats=int(raw.get("repeats", 1)),
        )
    if "encoder" in raw:
        return LinkPredictionExperiment(
            dataset=dataset,
            training=training,
            encoder=_build(EncoderConfig, raw.get("encoder")),
            decoder=_build(DecoderConfig, raw.get("decoder")),
            evaluation=evaluation,
        )
    raise ValueError(
        "config must contain an 'rgcn' (node classification) or 'encoder' "
        "(link prediction) section"
    )
