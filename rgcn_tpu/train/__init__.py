from rgcn_tpu.train.optim import make_optimizer
from rgcn_tpu.train.samplers import edge_neighborhood, select_sampler, uniform_sampling
from rgcn_tpu.train.negative import corrupt_batch, negative_sampling
from rgcn_tpu.train.evaluate import (
    RankingFilters,
    accuracy,
    build_filters,
    evaluate_ranking,
    ranking_metrics,
    ranks_from_scores,
)

__all__ = [
    "make_optimizer",
    "uniform_sampling",
    "edge_neighborhood",
    "select_sampler",
    "negative_sampling",
    "corrupt_batch",
    "RankingFilters",
    "build_filters",
    "ranks_from_scores",
    "evaluate_ranking",
    "ranking_metrics",
    "accuracy",
]
