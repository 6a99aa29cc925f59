from rgcn_tpu.ops.spmm import (
    aggregate_messages,
    rel_spmm,
    rel_spmm_block,
    rel_spmm_diag,
    rel_spmm_featureless,
)
from rgcn_tpu.ops.distmult import (
    distmult_score,
    score_head_candidates,
    score_tail_candidates,
)

__all__ = [
    "aggregate_messages",
    "rel_spmm",
    "rel_spmm_block",
    "rel_spmm_diag",
    "rel_spmm_featureless",
    "distmult_score",
    "score_head_candidates",
    "score_tail_candidates",
]
