"""End-to-end TRAINING parity against the live reference (LP path).

`tests/test_training_parity.py` proved trainer-vs-trainer parity for node
classification. The LP side was assumed unprovable because the reference's
`LinkPredictor.forward` ships a live debug `exit()`
(`/root/reference/torch_rgcn/models.py:126-132`) that kills the process on
the first forward. But that call resolves through module globals, so the
reference trainer becomes runnable by shadowing `exit`/`print` in the
reference module's namespace — no reference code is modified on disk.

These tests drive the LIVE reference LinkPredictor / c-RGCN through an
exact replica of the reference training loop
(`/root/reference/experiments/predict_links.py:117-157`: full-graph
positives, `negative_sampling` from the reference's own `utils/misc.py`,
BCE-with-logits + decoder schlichtkrull-L2, torch Adam) and score it with
the reference's own `evaluate` (`utils/misc.py:60-110`, filtered MRR) —
versus `train_link_predictor` on the same fabricated learnable data with
matched hyperparameters. RNG streams differ, so the comparison is
multi-seed mean filtered MRR above a learning floor and within a
seed-spread tolerance. This validates negative-sampling label assembly,
BCE loss + penalty assembly, optimizer semantics, and the filtered-ranking
protocol end-to-end — none of which forward-parity can.

Two reference defects are neutralized in memory, identically to
`tests/test_lp_model_parity.py` (both documented in SURVEY.md §7.8):

* the `exit()` debug block (`models.py:126-132`);
* `generate_self_loops` returning `[triples ; loops]` so `forward`'s
  `cat([triples, inverses, self_loop_triples])` duplicates every base
  edge (`torch_rgcn/utils.py:110-124` + `layers.py:481-487`) — replaced
  by a loops-only generator, the semantics our framework implements.

The reference's `utils/misc.py` imports sacred (absent in this image)
only for `create_experiment`; a stub module satisfies the import so the
real `evaluate` / `negative_sampling` code runs.
"""

import sys
import types
import warnings

import numpy as np
import pytest

torch = pytest.importorskip("torch")

if "/root/reference" not in sys.path:
    sys.path.append("/root/reference")

if "sacred" not in sys.modules:
    _sacred = types.ModuleType("sacred")
    _sacred.Experiment = object
    _observers = types.ModuleType("sacred.observers")
    _observers.MongoObserver = object
    _sacred.observers = _observers
    sys.modules["sacred"] = _sacred
    sys.modules["sacred.observers"] = _observers

with warnings.catch_warnings():
    warnings.simplefilter("ignore")
    import torch_rgcn.layers as ref_layers
    import torch_rgcn.models as ref_models
    from utils.misc import (  # noqa: E402  (reference package)
        evaluate as ref_evaluate,
        generate_true_dict,
        negative_sampling,
    )

from rgcn_tpu.config import load_experiment  # noqa: E402
from rgcn_tpu.data.loaders import LinkPredictionData  # noqa: E402
from rgcn_tpu.train.link_prediction import train_link_predictor  # noqa: E402
from rgcn_tpu.utils.logging import ScalarLogger  # noqa: E402

SEEDS = (0, 1, 2)
EPOCHS = 80
LR = 0.01
NEG = 4
L2 = 0.01
# filtered-MRR learning floor: random ranking over N=60 candidates gives
# MRR ≈ H_60/60 ≈ 0.078 — same floor rationale as benchmarks/parity.py
FLOOR = 0.15


@pytest.fixture
def runnable_reference(monkeypatch):
    """Make the shipped reference LP stack executable (see module doc)."""

    def only_self_loops(triples, num_nodes, num_rels, keep_prob, device="cpu"):
        v = torch.arange(num_nodes, dtype=torch.long)[:, None]
        p = torch.full((num_nodes, 1), 2 * num_rels, dtype=torch.long)
        loops = torch.cat([v, p, v], dim=1)
        keep = torch.bernoulli(
            torch.full((num_nodes,), float(keep_prob))
        ).bool()
        return loops[keep]

    monkeypatch.setattr(ref_layers, "generate_self_loops", only_self_loops)
    # `exit`/`print` in models.py resolve module globals before builtins
    monkeypatch.setattr(ref_models, "exit", lambda *a, **k: None,
                        raising=False)
    monkeypatch.setattr(ref_models, "print", lambda *a, **k: None,
                        raising=False)
    yield


def clique_lp_data(seed=3, n_ent=60, n_grp=4, n_noise_rel=4, n_noise=80):
    """Learnable-by-construction LP graph: relation 0 is a within-group
    clique over ``n_grp`` entity groups (plus noise relations), so DistMult
    separates the groups in embedding space and filtered test MRR must
    clear the random baseline. Same construction as
    ``benchmarks/parity.py::fabricate_datasets``, in memory."""
    rng = np.random.default_rng(seed)
    pairs = [
        (s, o)
        for s in range(n_ent)
        for o in range(n_ent)
        if s != o and s % n_grp == o % n_grp
    ]
    rng.shuffle(pairs)
    clique = np.array([(s, 0, o) for s, o in pairs], dtype=np.int64)
    noise = np.stack(
        [
            rng.integers(0, n_ent, n_noise),
            1 + rng.integers(0, n_noise_rel, n_noise),
            rng.integers(0, n_ent, n_noise),
        ],
        axis=1,
    ).astype(np.int64)
    train = np.concatenate([clique[:300], noise], axis=0)
    test = clique[340:380]
    allt = {
        (int(a), int(b), int(c))
        for a, b, c in np.concatenate([clique[:380], noise], axis=0)
    }
    i2n = [f"e{i}" for i in range(n_ent)]
    i2r = [f"r{i}" for i in range(1 + n_noise_rel)]
    return LinkPredictionData(
        train=train, test=test, all_triples=allt,
        n2i={n: i for i, n in enumerate(i2n)}, i2n=i2n,
        r2i={r: i for i, r in enumerate(i2r)}, i2r=i2r,
    )


# glorot-normal avoids the reference's broken schlichtkrull init call path
# (layers.py:385-447 passes tensors where shapes are expected); both sides
# use the same distribution so initialization statistics match.
ENC = {
    "node_embedding": 16,
    "hidden1_size": 16,
    "num_layers": 1,
    "edge_dropout": {"general": 0.0, "self_loop": 0.0,
                     "self_loop_type": "none"},
    "weight_init": "glorot-normal",
    "include_gain": False,
    "bias_init": "zeros",
}
DEC = {
    "l2_penalty_type": "schlichtkrull-l2",
    "l2_penalty": L2,
    "weight_init": "standard-normal",
    "include_gain": False,
}


def _reference_lp_train(model_cls, data, seed):
    """Replica of the reference epoch loop (predict_links.py:117-157) with
    graph_batch_size=None (full graph) and edge_dropout=0, driving the
    LIVE reference model; final eval = the reference's own `evaluate`."""
    torch.manual_seed(seed)
    model = model_cls(
        nnodes=data.num_nodes, nrel=data.num_relations,
        encoder_config=ENC, decoder_config=DEC,
    )
    optimiser = torch.optim.Adam(model.parameters(), lr=LR, weight_decay=0.0)
    train_t = torch.tensor(np.asarray(data.train), dtype=torch.long)
    n = len(data.train)
    true_triples = generate_true_dict(data.all_triples)
    for _ in range(EPOCHS):
        optimiser.zero_grad()
        model.train()
        with torch.no_grad():
            positives = train_t
            negatives = (
                positives.clone()[:, None, :].expand(n, NEG, 3).contiguous()
            )
            negatives = negative_sampling(negatives, data.num_nodes, 0.5)
            batch_idx = torch.cat([positives, negatives], dim=0)
            labels = torch.cat(
                [torch.ones(n), torch.zeros(n * NEG)], dim=0
            )
        preds, penalty = model(positives, batch_idx)
        loss = torch.nn.functional.binary_cross_entropy_with_logits(
            preds, labels
        )
        loss = loss + L2 * penalty
        loss.backward()
        optimiser.step()

    model.eval()
    with torch.no_grad():
        mrr, _, _ = ref_evaluate(
            model=model, graph=train_t,
            test_set=torch.tensor(np.asarray(data.test), dtype=torch.long),
            true_triples=true_triples, num_nodes=data.num_nodes,
            batch_size=16, filter_candidates=True, verbose=False,
        )
    return float(mrr)


def _our_lp_train(model_name, data, seed):
    cfg = load_experiment(
        {
            "dataset": {"name": "synthetic"},
            "training": {
                "epochs": EPOCHS,
                "negative_sampling": {"sampling_rate": NEG,
                                      "head_prob": 0.5},
                "optimiser": {"algorithm": "adam", "learn_rate": LR,
                              "weight_decay": 0.0},
            },
            "encoder": {
                "model": model_name, "num_layers": 1,
                "node_embedding": 16, "hidden1_size": 16,
                "weight_init": "glorot-normal",
            },
            "decoder": {"model": "distmult", "l2_penalty": L2,
                        "l2_penalty_type": "schlichtkrull-l2"},
            "evaluation": {"final_run": True, "filtered": True,
                           "check_every": 1000, "batch_size": 16},
        }
    )
    quiet = ScalarLogger(verbose=False)
    mrr, _, _, _ = train_link_predictor(
        cfg, data, seed=seed, logger=quiet, tile_size=16
    )
    return float(mrr)


def _compare(ref_mrrs, our_mrrs):
    ref_mean = float(np.mean(ref_mrrs))
    our_mean = float(np.mean(our_mrrs))
    spread = max(float(np.std(ref_mrrs)), float(np.std(our_mrrs)), 0.02)
    detail = (
        f"reference {[round(m, 4) for m in ref_mrrs]} (mean {ref_mean:.4f})"
        f" vs ours {[round(m, 4) for m in our_mrrs]} (mean {our_mean:.4f})"
    )
    assert ref_mean >= FLOOR, f"reference did not learn: {detail}"
    assert our_mean >= FLOOR, f"ours did not learn: {detail}"
    # means agree within the larger of 0.08 MRR or 3 seed-spread sigmas
    assert abs(ref_mean - our_mean) <= max(0.08, 3.0 * spread), detail


def test_lp_training_parity(runnable_reference):
    """FB-toy-style hyperparameters (no decomposition, schlichtkrull-L2
    decoder penalty): full trainer-vs-trainer filtered-MRR parity.
    Probe run: reference 0.340/0.281/0.299 vs ours 0.353/0.311/0.336."""
    data = clique_lp_data()
    ref = [
        _reference_lp_train(ref_models.LinkPredictor, data, s) for s in SEEDS
    ]
    ours = [_our_lp_train("rgcn", data, s) for s in SEEDS]
    _compare(ref, ours)


def test_crgcn_training_parity(runnable_reference):
    """c-RGCN (bottleneck + residual, models.py:208-245): executable in
    the reference only when node_embedding == hidden1_size (its encoder
    feeds `encoding_layer(x)` of width nhid into an rgc1 built for width
    nemb) — which ENC satisfies."""
    data = clique_lp_data(seed=5)
    ref = [
        _reference_lp_train(
            ref_models.CompressionRelationPredictor, data, s
        )
        for s in SEEDS
    ]
    ours = [_our_lp_train("c-rgcn", data, s) for s in SEEDS]
    _compare(ref, ours)
