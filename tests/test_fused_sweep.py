"""Fused one-dispatch sweeps vs the per-batch dispatch loop.

The fused path (engine._fused_dense_sweep / _fused_bi_scores) scans over the
stacked calibration batches inside ONE jit dispatch — same per-batch graphs,
same accumulation order — so gradients, BI scores, and therefore selected
indices must be BIT-identical to the loop (`GRASP_FUSED_SWEEP=0`). These
tests pin that equivalence; the motivation is the axon dispatch tax
(BENCH_7B.json r4: the loop spent ~0.49 s/batch against ~0.09 s of chip
time).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grasp_tpu.configs import GraspConfig, ModelConfig
from grasp_tpu.core.engine import GraspEngine, module_name
from grasp_tpu.models.llama import init_params

CFG = dict(
    vocab_size=256,
    hidden_size=64,
    intermediate_size=176,
    num_hidden_layers=4,
    num_attention_heads=4,
    num_key_value_heads=2,
)


@pytest.fixture(scope="module")
def model():
    config = ModelConfig.tiny(**CFG)
    params = init_params(jax.random.PRNGKey(11), config)
    return config, params


def _batches(config, n=3, batch=2, seq=16, mask=False, seed=5):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        s = rng.integers(1, config.vocab_size, (batch, seq + 1))
        b = {
            "input_ids": jnp.asarray(s[:, :-1], jnp.int32),
            "labels": jnp.asarray(s[:, 1:], jnp.int32),
        }
        if mask:
            b["attention_mask"] = jnp.ones((batch, seq), jnp.int32)
        out.append(b)
    return out


@pytest.mark.parametrize("mask", [False, True], ids=["nomask", "mask"])
def test_fused_grads_bitexact(model, monkeypatch, mask):
    config, params = model
    batches = _batches(config, mask=mask)
    names = [module_name(3, p) for p in ("gate_proj", "up_proj", "down_proj")]

    monkeypatch.setenv("GRASP_FUSED_SWEEP", "0")
    eng_loop = GraspEngine(jax.tree.map(jnp.array, params), config)
    g_loop = eng_loop.get_dense_gradients(names, batches)
    assert "grad_compile" not in eng_loop.stage_times  # loop path taken

    monkeypatch.setenv("GRASP_FUSED_SWEEP", "1")
    eng_fused = GraspEngine(jax.tree.map(jnp.array, params), config)
    g_fused = eng_fused.get_dense_gradients(names, batches)
    assert "grad_compile" in eng_fused.stage_times  # fused path taken

    for n in names:
        np.testing.assert_array_equal(
            np.asarray(g_loop[n]), np.asarray(g_fused[n]), err_msg=n)


def test_fused_bi_bitexact(model, monkeypatch):
    config, params = model
    batches = _batches(config, n=4)

    monkeypatch.setenv("GRASP_FUSED_SWEEP", "0")
    eng_loop = GraspEngine(jax.tree.map(jnp.array, params), config)
    imp_loop, red_loop = eng_loop.compute_bi(2, batches)

    monkeypatch.setenv("GRASP_FUSED_SWEEP", "1")
    eng_fused = GraspEngine(jax.tree.map(jnp.array, params), config)
    imp_fused, red_fused = eng_fused.compute_bi(2, batches)

    assert red_loop == red_fused
    np.testing.assert_array_equal(np.asarray(imp_loop), np.asarray(imp_fused))


@pytest.mark.parametrize("sweep", ["sequential", "parallel"])
def test_fused_run_same_indices(model, monkeypatch, sweep):
    """engine.run end-to-end: identical selected indices and ranks either way
    (this is what the golden suite pins against the torch reference — the
    fused path must preserve it through a full multi-round run)."""
    config, params = model
    batches = _batches(config, n=3)
    cfg = GraspConfig(num_prune_layers=2, compression_ratio=0.5,
                      metric="taylor", sweep=sweep, grad_mode="dense")

    monkeypatch.setenv("GRASP_FUSED_SWEEP", "0")
    eng_loop = GraspEngine(jax.tree.map(jnp.array, params), config)
    s_loop = eng_loop.run(batches, cfg)

    monkeypatch.setenv("GRASP_FUSED_SWEEP", "1")
    eng_fused = GraspEngine(jax.tree.map(jnp.array, params), config)
    s_fused = eng_fused.run(batches, cfg)

    assert s_loop["rank_dict"] == s_fused["rank_dict"]
    assert set(eng_loop.indices_log) == set(eng_fused.indices_log)
    for k in eng_loop.indices_log:
        np.testing.assert_array_equal(
            np.asarray(eng_loop.indices_log[k]),
            np.asarray(eng_fused.indices_log[k]), err_msg=k)


def test_fused_not_used_single_batch(model, monkeypatch):
    """One batch -> no stacking win; the loop path must be taken."""
    config, params = model
    monkeypatch.setenv("GRASP_FUSED_SWEEP", "1")
    eng = GraspEngine(jax.tree.map(jnp.array, params), config)
    names = [module_name(3, "gate_proj")]
    eng.get_dense_gradients(names, _batches(config, n=1))
    assert "grad_compile" not in eng.stage_times
