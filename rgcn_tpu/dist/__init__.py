from rgcn_tpu.dist.mesh import EDGE_AXIS, make_mesh, shard_edge_set
from rgcn_tpu.dist.train import (
    make_sharded_lp_step,
    make_sharded_nc_step,
    pad_to_multiple,
)

__all__ = [
    "EDGE_AXIS",
    "make_mesh",
    "shard_edge_set",
    "make_sharded_nc_step",
    "make_sharded_lp_step",
    "pad_to_multiple",
]
