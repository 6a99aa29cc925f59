"""rgcn_tpu: a TPU-native relational message-passing framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
thiviyanT/torch-rgcn (R-GCN, e-RGCN, c-RGCN for node classification and
link prediction on knowledge graphs), built TPU-first:

* Static-shape graph preprocessing into relation-sorted, tile-padded COO
  (the reference rebuilds a sparse adjacency inside every ``forward``,
  ``torch_rgcn/layers.py:255-279``; we hoist it out entirely).
* One fused message-passing primitive (``rgcn_tpu.ops.rel_spmm``) instead of
  the reference's four codepaths (``torch_rgcn/layers.py:286-301``): every
  augmented edge ``(s, p, o)`` contributes ``X[o] @ W[p] / deg_p(s)`` to node
  ``s``, where ``deg_p(s)`` counts edges with subject ``s`` and relation ``p``.
* Decompositions (basis / block-diagonal / diagonal) are weight *producers*
  feeding that one primitive, not layer forks.
* DistMult scoring as a dense candidate-sweep matmul (SDDMM) with
  encode-once evaluation.
* Multi-chip scaling via ``jax.sharding`` edge partitioning (``rgcn_tpu.dist``),
  not a hand-rolled communication layer.
"""

__version__ = "0.1.0"
