"""Multi-host (multi-process) distribution: 2-D meshes and process setup.

Scaling model (new capability — the reference is strictly single-device,
``/root/reference/experiments/classify_nodes.py:46-47``): a 2-D device mesh

    (``replica`` — data parallel, rides DCN) × (``edge`` — graph parallel,
    rides ICI)

Within a host/slice, the per-layer ``psum`` of edge-partial node aggregates
is the heavy collective (O(N·d) per layer), so the ``edge`` axis must map to
ICI — :func:`make_mesh_2d` puts it on the *minor* (fastest-varying) mesh
dimension, which on TPU pods corresponds to intra-slice links when device
order is the default. Across hosts only the scoring batch is split: the
per-step DCN traffic is one scalar loss reduction plus the replicated
gradient reduction (O(P) once per step), which tolerates DCN latency.

Process setup is one call to :func:`initialize_distributed` (a thin wrapper
over ``jax.distributed.initialize`` with env-var defaults), after which
``jax.devices()`` spans every process and the meshes/steps in
:mod:`rgcn_tpu.dist` work unchanged — ``jax.jit`` handles cross-process
arrays transparently. See ``benchmarks/multiprocess_dryrun.py`` for a
self-contained two-process CPU proof.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

from rgcn_tpu.dist.mesh import EDGE_AXIS

__all__ = [
    "REPLICA_AXIS",
    "initialize_distributed",
    "make_mesh_2d",
    "collective_bytes_per_step",
]

REPLICA_AXIS = "replica"


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[list] = None,
) -> None:
    """Join a multi-process JAX job.

    Arguments default to the standard environment variables
    (``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID``); on TPU pods with the cloud metadata available,
    ``jax.distributed.initialize()`` auto-discovers everything and all
    arguments may stay ``None``.
    """
    kwargs = {}
    ca = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if ca:
        kwargs["coordinator_address"] = ca
    np_ = num_processes if num_processes is not None else os.environ.get(
        "JAX_NUM_PROCESSES"
    )
    if np_ is not None:
        kwargs["num_processes"] = int(np_)
    pid = process_id if process_id is not None else os.environ.get(
        "JAX_PROCESS_ID"
    )
    if pid is not None:
        kwargs["process_id"] = int(pid)
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)


def make_mesh_2d(
    num_replicas: Optional[int] = None,
    edge_size: Optional[int] = None,
    devices=None,
    replica_axis: str = REPLICA_AXIS,
    edge_axis: str = EDGE_AXIS,
) -> Mesh:
    """(replica × edge) mesh over all devices.

    Defaults: one replica per process (``num_replicas = process_count``) so
    the edge axis — which carries the per-layer O(N·d) psum — stays within
    each process's devices (ICI), and the replica axis spans processes
    (DCN). Explicit sizes override (their product must equal the device
    count).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if num_replicas is None:
        num_replicas = max(getattr(jax, "process_count", lambda: 1)(), 1)
        if n % num_replicas:
            num_replicas = 1
    if edge_size is None:
        edge_size = n // num_replicas
    if num_replicas * edge_size != n:
        raise ValueError(
            f"mesh {num_replicas}x{edge_size} != {n} devices"
        )
    dev = np.asarray(devices).reshape(num_replicas, edge_size)
    return Mesh(dev, (replica_axis, edge_axis))


def collective_bytes_per_step(
    num_nodes: int,
    hidden_sizes,
    num_params: int,
    edge_size: int,
    num_replicas: int,
    dtype_bytes: int = 4,
) -> dict:
    """Analytic per-step collective traffic (ring all-reduce model:
    ``2 (K-1)/K × payload`` per reduction) so real-pod efficiency can be
    predicted before hardware is available. Returns bytes per device per
    step, split by the axis the collective rides."""

    def ring(payload, k):
        return 0 if k <= 1 else int(2 * (k - 1) / k * payload)

    ici = sum(
        ring(num_nodes * h * dtype_bytes, edge_size) for h in hidden_sizes
    )
    # gradient fanout reductions span the whole mesh: model them as a ring
    # over K_total for the parameter payload, plus the scalar loss
    k_total = edge_size * num_replicas
    grads = ring(num_params * dtype_bytes, k_total)
    return {
        "ici_bytes_per_step": ici,
        "grad_reduce_bytes_per_step": grads,
        "dcn_bytes_per_step": ring(num_params * dtype_bytes, num_replicas),
    }
