"""Layer-output parity against the live reference implementation.

The north-star target is per-layer activations allclose vs the reference
PyTorch layers. These tests import the reference package from
``/root/reference`` (read-only) at test time, copy its initialized weights
into our parameter trees, and assert elementwise agreement of forward
outputs on random graphs. No reference code is vendored.

The reference LP *training*-mode paths involve RNG (self-loop dropout) and
its model-level forward is unrunnable (``models.py:132``), so parity is
asserted at layer level in eval mode — the deterministic contract both
implementations share.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

# Appended (not prepended) so the reference's own ``tests``/``utils``
# packages never shadow this repo's.
if "/root/reference" not in sys.path:
    sys.path.append("/root/reference")

import warnings

with warnings.catch_warnings():
    warnings.simplefilter("ignore")
    from torch_rgcn.layers import (  # noqa: E402
        DistMult as RefDistMult,
        RelationalGraphConvolutionLP as RefLP,
        RelationalGraphConvolutionNC as RefNC,
    )
    from torch_rgcn.utils import add_inverse_and_self  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from rgcn_tpu.graph.structure import build_edge_set  # noqa: E402
from rgcn_tpu.nn.layers import DistMult, RGCNConv  # noqa: E402
from tests.conftest import make_random_triples  # noqa: E402


def _random_graph(seed, n=12, r=3, e=40):
    rng = np.random.default_rng(seed)
    triples = make_random_triples(rng, n, r, e)
    return rng, triples


def _ref_nc_layer(triples, n, r, **kw):
    tp = add_inverse_and_self(torch.tensor(triples, dtype=torch.long), n, r)
    layer = RefNC(
        triples=tp, num_nodes=n, num_relations=2 * r + 1, **kw
    )
    layer.eval()
    return layer


def _apply_ours(layer_module, params, es, x=None):
    out = layer_module.apply({"params": params}, es, None if x is None else jnp.asarray(x))
    return np.asarray(out)


@pytest.mark.parametrize("vertical", [True, False])
def test_nc_dense_parity(vertical):
    rng, triples = _random_graph(10)
    n, r, din, dout = 12, 3, 5, 4
    ref = _ref_nc_layer(
        triples, n, r, in_features=din, out_features=dout,
        vertical_stacking=vertical,
    )
    x = rng.normal(size=(n, din)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x)).numpy()

    es = build_edge_set(triples, n, r, tile_size=8)
    ours = RGCNConv(
        num_nodes=n, num_relations=2 * r + 1,
        in_features=din, out_features=dout,
    )
    params = {
        "weights": jnp.asarray(ref.weights.detach().numpy()),
        "bias": jnp.asarray(ref.bias.detach().numpy()),
    }
    got = _apply_ours(ours, params, es, x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_nc_featureless_parity():
    _, triples = _random_graph(11)
    n, r, dout = 12, 3, 4
    ref = _ref_nc_layer(triples, n, r, in_features=None, out_features=dout)
    with torch.no_grad():
        want = ref().numpy()

    es = build_edge_set(triples, n, r, tile_size=8)
    ours = RGCNConv(
        num_nodes=n, num_relations=2 * r + 1,
        in_features=None, out_features=dout,
    )
    params = {
        "weights": jnp.asarray(ref.weights.detach().numpy()),
        "bias": jnp.asarray(ref.bias.detach().numpy()),
    }
    got = _apply_ours(ours, params, es)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_nc_basis_parity():
    rng, triples = _random_graph(12)
    n, r, din, dout, nb = 12, 3, 5, 4, 2
    ref = _ref_nc_layer(
        triples, n, r, in_features=din, out_features=dout,
        decomposition={"type": "basis", "num_bases": nb},
    )
    x = rng.normal(size=(n, din)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x)).numpy()

    es = build_edge_set(triples, n, r, tile_size=8)
    ours = RGCNConv(
        num_nodes=n, num_relations=2 * r + 1,
        in_features=din, out_features=dout,
        decomposition="basis", num_bases=nb,
    )
    params = {
        "bases": jnp.asarray(ref.bases.detach().numpy()),
        "comps": jnp.asarray(ref.comps.detach().numpy()),
        "bias": jnp.asarray(ref.bias.detach().numpy()),
    }
    got = _apply_ours(ours, params, es, x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_nc_block_parity():
    rng, triples = _random_graph(13)
    n, r = 12, 3
    nblk, din, dout = 2, 6, 4
    ref = _ref_nc_layer(
        triples, n, r, in_features=din, out_features=dout,
        decomposition={"type": "block", "num_blocks": nblk},
    )
    x = rng.normal(size=(n, din)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x)).numpy()

    es = build_edge_set(triples, n, r, tile_size=8)
    ours = RGCNConv(
        num_nodes=n, num_relations=2 * r + 1,
        in_features=din, out_features=dout,
        decomposition="block", num_blocks=nblk,
    )
    params = {
        "blocks": jnp.asarray(ref.blocks.detach().numpy()),
        "bias": jnp.asarray(ref.bias.detach().numpy()),
    }
    got = _apply_ours(ours, params, es, x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_nc_diag_parity():
    """e-RGCN first layer: per-relation diagonal weights."""
    rng, triples = _random_graph(14)
    n, r, d = 12, 3, 5
    ref = _ref_nc_layer(
        triples, n, r, in_features=d, out_features=d, diag_weight_matrix=True,
    )
    x = rng.normal(size=(n, d)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x)).numpy()

    es = build_edge_set(triples, n, r, tile_size=8)
    ours = RGCNConv(
        num_nodes=n, num_relations=2 * r + 1,
        in_features=d, out_features=d, diag=True,
    )
    params = {"weights": jnp.asarray(ref.weights.detach().numpy())}
    got = _apply_ours(ours, params, es, x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.fixture
def clean_lp_self_loops(monkeypatch):
    """Neutralize a reference LP defect for parity comparison.

    ``generate_self_loops`` returns ``cat([triples, self_loops])``
    (``torch_rgcn/utils.py:124``) and the LP forward then concatenates
    ``[triples, inverses, generate_self_loops(...)]``
    (``torch_rgcn/layers.py:485-487``) — duplicating every original triple
    with inconsistent normalization (the duplicate block is *not* covered by
    the horizontal reorder at ``layers.py:505-509``, so the two copies of an
    edge get different divisors). This path never ran in the reference (the
    LP model dies at ``models.py:132``), and the paper semantics
    (arXiv:1703.06103 eq. 2) have no duplication. We patch the reference —
    in memory only — to return just the self-loops, which restores the
    intended graph ``[triples, inverses, self_loops]``, and assert parity
    against that.
    """
    import torch_rgcn.layers as ref_layers

    def only_self_loops(triples, num_nodes, num_rels, keep_prob, device="cpu"):
        v = torch.arange(num_nodes, dtype=torch.long)[:, None]
        p = torch.full((num_nodes, 1), 2 * num_rels, dtype=torch.long)
        loops = torch.cat([v, p, v], dim=1)
        keep = torch.bernoulli(
            torch.full((num_nodes,), float(keep_prob))
        ).bool()
        return loops[keep]

    monkeypatch.setattr(ref_layers, "generate_self_loops", only_self_loops)
    yield


def test_lp_layer_parity_plain(clean_lp_self_loops):
    """LP layer in eval mode (self-loop keep prob 1): plain weights."""
    rng, triples = _random_graph(15)
    n, r, din, dout = 12, 3, 5, 5
    ref = RefLP(
        num_nodes=n, num_relations=2 * r + 1,
        in_features=din, out_features=dout,
        edge_dropout={"general": 0.0, "self_loop": 0.0, "self_loop_type": "none"},
        w_init="glorot-normal", b_init="zeros",
    )
    ref.eval()
    x = rng.normal(size=(n, din)).astype(np.float32)
    t = torch.tensor(triples, dtype=torch.long)
    with torch.no_grad():
        want = ref(t, torch.tensor(x)).numpy()

    es = build_edge_set(triples, n, r, tile_size=8)
    ours = RGCNConv(
        num_nodes=n, num_relations=2 * r + 1,
        in_features=din, out_features=dout,
        bias_init="zeros",
    )
    params = {
        "weights": jnp.asarray(ref.weights.detach().numpy()),
        "bias": jnp.asarray(ref.bias.detach().numpy()),
    }
    got = _apply_ours(ours, params, es, x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_lp_layer_parity_block(clean_lp_self_loops):
    """LP block layer: separate dense self-loop matrix."""
    rng, triples = _random_graph(16)
    n, r = 12, 3
    nblk, d = 2, 6
    ref = RefLP(
        num_nodes=n, num_relations=2 * r + 1,
        in_features=d, out_features=d,
        decomposition={"type": "block", "num_blocks": nblk},
        edge_dropout={"general": 0.0, "self_loop": 0.0, "self_loop_type": "none"},
        w_init="schlichtkrull-normal", b_init="zeros",
    )
    ref.eval()
    x = rng.normal(size=(n, d)).astype(np.float32)
    t = torch.tensor(triples, dtype=torch.long)
    with torch.no_grad():
        want = ref(t, torch.tensor(x)).numpy()

    es = build_edge_set(triples, n, r, tile_size=8)
    ours = RGCNConv(
        num_nodes=n, num_relations=2 * r + 1,
        in_features=d, out_features=d,
        decomposition="block", num_blocks=nblk,
        separate_self_weight=True,
        weight_init="schlichtkrull-normal", bias_init="zeros",
    )
    params = {
        "blocks": jnp.asarray(ref.blocks.detach().numpy()),
        "self_weight": jnp.asarray(ref.blocks_self.detach().numpy()),
        "bias": jnp.asarray(ref.bias.detach().numpy()),
    }
    got = _apply_ours(ours, params, es, x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_distmult_parity():
    rng = np.random.default_rng(17)
    n, r, d, b = 10, 4, 6, 20
    ref = RefDistMult(indim=r, outdim=d, num_nodes=n, num_rel=r)
    nodes = rng.normal(size=(n, d)).astype(np.float32)
    triples = np.stack(
        [
            rng.integers(0, n, b),
            rng.integers(0, r, b),
            rng.integers(0, n, b),
        ],
        axis=1,
    )
    with torch.no_grad():
        want = ref(
            torch.tensor(triples, dtype=torch.long), torch.tensor(nodes)
        ).numpy()
        want_pen = ref.s_penalty(
            torch.tensor(triples, dtype=torch.long), torch.tensor(nodes)
        ).numpy()

    ours = DistMult(num_nodes=n, num_relations=r, emb_dim=d)
    params = {"relations": jnp.asarray(ref.relations.detach().numpy())}
    got = np.asarray(
        ours.apply({"params": params}, jnp.asarray(triples), jnp.asarray(nodes))
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    got_pen = np.asarray(
        ours.apply(
            {"params": params},
            jnp.asarray(triples),
            jnp.asarray(nodes),
            method=DistMult.s_penalty,
        )
    )
    np.testing.assert_allclose(got_pen, want_pen, rtol=1e-5)
