"""Executable pinning cache (rgcn_tpu/utils/exe_cache.py).

bench.py persists its winning compiled executable across processes so the
official headline re-measures the best-known compile draw instead of
re-rolling XLA's scheduling dice (draws spread ~0.89-1.03 ms long-chain on
the target backend). These tests cover the cache mechanics on CPU; the
on-hardware roundtrip (checksum + timing parity) is exercised by bench.py
itself on every official run.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgcn_tpu.utils import exe_cache


def _compiled():
    def f(a, b):
        return a @ b + 1.0

    a = jnp.ones((16, 16), jnp.float32)
    b = jnp.full((16, 16), 2.0, jnp.float32)
    return jax.jit(f).lower(a, b).compile(), a, b


def test_workload_key_stable_and_field_sensitive():
    k1 = exe_cache.workload_key(metric="m", n=10, d=4)
    k2 = exe_cache.workload_key(metric="m", n=10, d=4)
    k3 = exe_cache.workload_key(metric="m", n=11, d=4)
    assert k1 == k2
    assert k1 != k3
    assert len(k1) == 20


def test_save_load_roundtrip(tmp_path):
    compiled, a, b = _compiled()
    want = np.asarray(compiled(a, b))
    key = exe_cache.workload_key(metric="test-roundtrip")
    path = exe_cache.save_executable(
        str(tmp_path), key, compiled, {"tag": "t1", "dt": 0.5}
    )
    if path is None:
        pytest.skip("backend does not support executable serialization")
    got = exe_cache.load_executable(str(tmp_path), key)
    assert got is not None
    loaded, meta = got
    assert meta == {"tag": "t1", "dt": 0.5}
    np.testing.assert_array_equal(np.asarray(loaded(a, b)), want)


def test_load_missing_returns_none(tmp_path):
    assert exe_cache.load_executable(str(tmp_path), "nokey") is None


def test_corrupt_entry_removed(tmp_path):
    key = exe_cache.workload_key(metric="test-corrupt")
    p = os.path.join(str(tmp_path), f"exe_{key}.pkl")
    with open(p, "wb") as f:
        f.write(b"not a pickle")
    assert exe_cache.load_executable(str(tmp_path), key) is None
    assert not os.path.exists(p)  # bad entry deleted so runs don't re-trip


def test_nc_trainer_exe_pinning(tmp_path):
    """train_node_classifier(exe_cache_dir=...) pins its step/predict
    executables: a second run populates nothing new (HLO-hash hit) and
    reproduces the first run's accuracy exactly."""
    import os

    from rgcn_tpu.config import load_experiment
    from rgcn_tpu.data.synthetic import synthetic_node_classification
    from rgcn_tpu.train.node_classification import train_node_classifier
    from rgcn_tpu.utils.logging import ScalarLogger

    data = synthetic_node_classification(
        num_nodes=60, num_rels=4, num_edges=300, num_classes=3, seed=3
    )
    cfg = load_experiment({
        "dataset": {"name": "synthetic"},
        "training": {"epochs": 4,
                     "optimiser": {"algorithm": "adam",
                                   "learn_rate": 0.01,
                                   "weight_decay": 0.0}},
        "rgcn": {"model": "rgcn", "num_layers": 2, "hidden_size": 8},
        "evaluation": {"final_run": True},
    })
    quiet = ScalarLogger(verbose=False)
    d = str(tmp_path / "exe")
    acc1 = train_node_classifier(
        cfg, data, seed=1, logger=quiet, tile_size=16, exe_cache_dir=d
    )
    entries = sorted(os.listdir(d))
    assert entries, "no executables pinned"
    acc2 = train_node_classifier(
        cfg, data, seed=1, logger=quiet, tile_size=16, exe_cache_dir=d
    )
    assert acc1 == acc2
    assert sorted(os.listdir(d)) == entries  # pure hits, nothing new


def test_lp_trainer_exe_pinning(tmp_path):
    """train_link_predictor(exe_cache_dir=...) pins the donated-buffer
    train step; a second run hits the cache and reproduces the MRR."""
    import os

    from rgcn_tpu.config import load_experiment
    from rgcn_tpu.data.synthetic import synthetic_link_prediction
    from rgcn_tpu.train.link_prediction import train_link_predictor
    from rgcn_tpu.utils.logging import ScalarLogger

    data = synthetic_link_prediction(num_nodes=40, num_rels=3,
                                     num_edges=200)
    cfg = load_experiment({
        "dataset": {"name": "synthetic"},
        "training": {
            "epochs": 3, "graph_batch_size": 32,
            "negative_sampling": {"sampling_rate": 2, "head_prob": 0.5},
            "optimiser": {"algorithm": "adam", "learn_rate": 0.01,
                          "weight_decay": 0.0},
        },
        "encoder": {"model": "rgcn", "num_layers": 1,
                    "node_embedding": 8, "hidden1_size": 8},
        "decoder": {"model": "distmult", "l2_penalty": 0.01,
                    "l2_penalty_type": "schlichtkrull-l2"},
        "evaluation": {"final_run": True, "filtered": True,
                       "check_every": 100, "batch_size": 16},
    })
    quiet = ScalarLogger(verbose=False)
    d = str(tmp_path / "exe")
    mrr1, _, _, _ = train_link_predictor(
        cfg, data, seed=2, logger=quiet, tile_size=8, exe_cache_dir=d
    )
    # jax-CPU can flakily refuse to serialize sort-containing executables
    # once any sorted program has executed in the process (see the search
    # test below); skip the pin assertions in that case — save failures
    # are tolerated by design (best-effort, never fatal)
    if not (os.path.isdir(d) and os.listdir(d)):
        import pytest

        pytest.skip("executable did not serialize in this process")
    entries = sorted(os.listdir(d))
    # the eval programs (encode + two scanned rank sweeps, sort-free)
    # pin too — a resumed run / make-parity process skips their compiles
    import pickle as _pickle

    tags = set()
    for f in entries:
        with open(os.path.join(d, f), "rb") as fh:
            tags.add(_pickle.load(fh)["meta"].get("tag"))
    assert {"lp_eval_encode", "lp_eval_rank_h", "lp_eval_rank_t"} <= tags
    mrr2, _, _, _ = train_link_predictor(
        cfg, data, seed=2, logger=quiet, tile_size=8, exe_cache_dir=d
    )
    assert mrr1 == mrr2
    assert sorted(os.listdir(d)) == entries


def test_nc_trainer_draw_search(tmp_path, capfd):
    """exe_search=N compiles N draws on a miss, measures each with the
    chained runner, and pins the fastest (meta carries its ms)."""
    import os
    import pickle

    from rgcn_tpu.config import load_experiment
    from rgcn_tpu.data.synthetic import synthetic_node_classification
    from rgcn_tpu.train.node_classification import train_node_classifier
    from rgcn_tpu.utils.logging import ScalarLogger

    data = synthetic_node_classification(
        num_nodes=50, num_rels=3, num_edges=200, num_classes=3, seed=5
    )
    cfg = load_experiment({
        "dataset": {"name": "synthetic"},
        "training": {"epochs": 3,
                     "optimiser": {"algorithm": "adam",
                                   "learn_rate": 0.01,
                                   "weight_decay": 0.0}},
        "rgcn": {"model": "rgcn", "num_layers": 2, "hidden_size": 8},
        "evaluation": {"final_run": True},
    })
    quiet = ScalarLogger(verbose=False)
    d = str(tmp_path / "exe")
    train_node_classifier(
        cfg, data, seed=1, logger=quiet, tile_size=16,
        exe_cache_dir=d, exe_search=2,
    )
    err = capfd.readouterr().err
    assert "nc_step draw 0" in err and "nc_step draw 1" in err
    metas = []
    for f in os.listdir(d):
        with open(os.path.join(d, f), "rb") as fh:
            metas.append(pickle.load(fh)["meta"])
    step_meta = [m for m in metas if m.get("tag") == "nc_step"]
    assert step_meta and step_meta[0]["ms"] > 0


def test_lp_trainer_draw_search_donation_safe(tmp_path, capfd):
    """LP exe_search measures candidates on device COPIES (the step
    donates params/opt_state): the search must not invalidate the
    trainer's own buffers, and the winning draw is pinned with its ms."""
    import os
    import pickle

    from rgcn_tpu.config import load_experiment
    from rgcn_tpu.data.synthetic import synthetic_link_prediction
    from rgcn_tpu.train.link_prediction import train_link_predictor
    from rgcn_tpu.utils.logging import ScalarLogger

    data = synthetic_link_prediction(num_nodes=40, num_rels=3,
                                     num_edges=200)
    cfg = load_experiment({
        "dataset": {"name": "synthetic"},
        "training": {
            "epochs": 3, "graph_batch_size": 32,
            "negative_sampling": {"sampling_rate": 2, "head_prob": 0.5},
            "optimiser": {"algorithm": "adam", "learn_rate": 0.01,
                          "weight_decay": 0.0},
        },
        "encoder": {"model": "rgcn", "num_layers": 1,
                    "node_embedding": 8, "hidden1_size": 8},
        "decoder": {"model": "distmult", "l2_penalty": 0.01,
                    "l2_penalty_type": "schlichtkrull-l2"},
        "evaluation": {"final_run": True, "filtered": True,
                       "check_every": 100, "batch_size": 16},
    })
    quiet = ScalarLogger(verbose=False)
    d = str(tmp_path / "exe")
    mrr1, _, _, _ = train_link_predictor(
        cfg, data, seed=2, logger=quiet, tile_size=8,
        exe_cache_dir=d, exe_search=2,
    )
    err = capfd.readouterr().err
    assert "lp_step draw 0" in err and "lp_step draw 1" in err
    # jax-CPU quirk: once any sort-containing program has EXECUTED in the
    # process, serialization of such executables fails flakily
    # (UNIMPLEMENTED: LessThan) — the search measures those candidates
    # but cannot pin them. The donation-safety contract (the trainer's
    # own buffers survive the search: mrr1 computed fine above) holds
    # either way; the pin assertions apply only when a payload survived.
    if os.path.isdir(d) and os.listdir(d):
        metas = []
        for f in os.listdir(d):
            with open(os.path.join(d, f), "rb") as fh:
                metas.append(pickle.load(fh)["meta"])
        step_meta = [m for m in metas if m.get("tag") == "lp_step"]
        assert step_meta and step_meta[0]["ms"] > 0
        # pinned re-run reproduces
        mrr2, _, _, _ = train_link_predictor(
            cfg, data, seed=2, logger=quiet, tile_size=8, exe_cache_dir=d
        )
        assert mrr1 == mrr2
    else:
        assert "no candidate serialized" in err


def _mesh8():
    from rgcn_tpu.dist.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8)


def _pinned_tags(d):
    """tag → meta for every entry the cache dir holds (empty if none)."""
    import pickle

    out = {}
    if os.path.isdir(d):
        for f in os.listdir(d):
            with open(os.path.join(d, f), "rb") as fh:
                m = pickle.load(fh)["meta"]
            out[m.get("tag")] = m
    return out


def test_sharded_nc_driver_exe_pinning(tmp_path, capfd):
    """train_node_classifier_sharded(exe_cache_dir=...) pins the sharded
    step + predict executables (re-bound to the mesh's device order at
    load); a second run is pure cache hits and reproduces the accuracy.

    Like the LP pin tests, tolerate the documented jax-CPU quirk: once any
    sort-containing program has EXECUTED in the process, serialization of
    such executables fails flakily (``UNIMPLEMENTED: `LessThan` is not
    serializable``) — suite order determines which programs ran first, so
    each pin assertion is conditional on its own payload surviving, and a
    missing payload must instead have left the 'serialize failed' notice."""
    from rgcn_tpu.config import load_experiment
    from rgcn_tpu.data.synthetic import synthetic_node_classification
    from rgcn_tpu.dist.driver import train_node_classifier_sharded
    from rgcn_tpu.utils.logging import ScalarLogger

    mesh = _mesh8()
    data = synthetic_node_classification(
        num_nodes=64, num_rels=4, num_edges=320, num_classes=3, seed=5
    )
    cfg = load_experiment({
        "dataset": {"name": "synthetic"},
        "training": {"epochs": 3,
                     "optimiser": {"algorithm": "adam",
                                   "learn_rate": 0.01,
                                   "weight_decay": 0.0}},
        "rgcn": {"model": "rgcn", "num_layers": 2, "hidden_size": 8},
        "evaluation": {"final_run": True},
    })
    quiet = ScalarLogger(verbose=False)
    d = str(tmp_path / "exe")
    acc1 = train_node_classifier_sharded(
        cfg, data, mesh, seed=1, logger=quiet, tile_size=16,
        backend="xla", exe_cache_dir=d,
    )
    err1 = capfd.readouterr().err
    tags = _pinned_tags(d)
    if not tags:
        assert "serialize failed" in err1
        pytest.skip("no sharded executable serialized in this process")
    entries = sorted(os.listdir(d))
    acc2 = train_node_classifier_sharded(
        cfg, data, mesh, seed=1, logger=quiet, tile_size=16,
        backend="xla", exe_cache_dir=d,
    )
    err = capfd.readouterr().err
    if "sharded_nc_step" in tags:
        assert "pinned executable hit for sharded_nc_step" in err
    else:
        assert "serialize failed" in err1
    assert acc1 == acc2
    # pure hits for whatever pinned; re-save attempts of the refused
    # programs may add entries only if serialization recovered
    assert set(entries) <= set(sorted(os.listdir(d)))


def test_sharded_lp_driver_exe_pinning_and_search(tmp_path, capfd):
    """train_link_predictor_sharded(exe_cache_dir=..., exe_search=2)
    draw-searches the sharded step on the first miss and reproduces the
    MRR from the pinned executable on a re-run."""
    import dataclasses

    from rgcn_tpu.config import load_experiment
    from rgcn_tpu.data.synthetic import synthetic_link_prediction
    from rgcn_tpu.dist.driver import train_link_predictor_sharded
    from rgcn_tpu.utils.logging import ScalarLogger

    mesh = _mesh8()
    cfg = load_experiment("configs/rgcn/lp-FB-toy.yaml")
    cfg = dataclasses.replace(
        cfg,
        training=dataclasses.replace(cfg.training, graph_batch_size=128),
        evaluation=dataclasses.replace(cfg.evaluation, batch_size=16),
    )
    data = synthetic_link_prediction(
        num_nodes=120, num_rels=5, num_edges=600, seed=0
    )
    quiet = ScalarLogger(verbose=False)
    d = str(tmp_path / "exe")
    mrr1, _, _, _ = train_link_predictor_sharded(
        cfg, data, mesh, seed=2, logger=quiet, max_epochs=2, tile_size=16,
        exe_cache_dir=d, exe_search=2,
    )
    err = capfd.readouterr().err
    assert "sharded_lp_step draw 0" in err
    # jax-CPU sort-comparator serialization flakiness (see the LP pin test
    # above): under full-suite order, earlier tests execute sorted
    # programs and EACH program here then serializes-or-refuses
    # independently — the sorted step can refuse while the sort-free eval
    # programs pin (observed: dir non-empty without the step tag). Assert
    # per-tag: every expected program either pinned or left its refusal
    # notice; reproduction asserts apply to whatever actually pinned.
    tags = _pinned_tags(d)
    if "sharded_lp_step" not in tags:
        assert "no candidate serialized" in err or "serialize failed" in err
    else:
        assert tags["sharded_lp_step"]["ms"] > 0
    eval_tags = {"sharded_eval_encode", "sharded_rank_h", "sharded_rank_t"}
    if not eval_tags <= set(tags):
        assert "serialize failed" in err
    if tags:
        # a re-run loads whatever pinned (recompiling the rest) and must
        # reproduce the metric bit-for-bit
        mrr2, _, _, _ = train_link_predictor_sharded(
            cfg, data, mesh, seed=2, logger=quiet, max_epochs=2,
            tile_size=16, exe_cache_dir=d,
        )
        err2 = capfd.readouterr().err
        for t in set(tags) & (eval_tags | {"sharded_lp_step"}):
            assert f"pinned executable hit for {t}" in err2
        assert mrr1 == mrr2
