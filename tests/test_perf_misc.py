"""Perf harness, remove_layers, mix loader tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from grasp_tpu.configs import GraspConfig, ModelConfig
from grasp_tpu.core.engine import GraspEngine
from grasp_tpu.data.loader import get_mix_calibration_batches
from grasp_tpu.data.tokenizer import ByteTokenizer
from grasp_tpu.models.llama import forward, init_params
from grasp_tpu.perf import count_params, device_memory, estimate_forward_flops, generation_benchmark


@pytest.fixture(scope="module")
def tiny():
    config = ModelConfig.tiny(num_hidden_layers=4)
    params = init_params(jax.random.PRNGKey(0), config)
    return config, params


def test_count_params_and_flops(tiny):
    config, params = tiny
    n = count_params(params)
    assert n > 0
    est_dense = estimate_forward_flops(params, config, seq_len=16)
    assert est_dense["params"] == n
    assert est_dense["flops"] == 2 * est_dense["macs"] > 0

    # compression must lower both params and flops
    engine = GraspEngine(jax.tree.map(jnp.array, params), config)
    rng = np.random.default_rng(0)
    batches = [{"input_ids": jnp.asarray(rng.integers(0, 256, (2, 16))),
                "labels": jnp.asarray(rng.integers(0, 256, (2, 16)))}]
    engine.run(batches, GraspConfig(num_prune_layers=1, compression_ratio=0.5))
    est_lr = estimate_forward_flops(engine.params, engine.config, engine.plan, seq_len=16)
    assert est_lr["params"] < est_dense["params"]
    assert est_lr["flops"] < est_dense["flops"]


def test_generation_benchmark_runs(tiny):
    config, params = tiny
    res = generation_benchmark(params, config, prompt_len=16, gen_len=8, warmup=1, iters=1)
    assert res["decode_tokens_per_s"] > 0
    assert res["tokens_generated"] == 8


def test_device_memory_shape():
    mem = device_memory()
    assert set(mem) == {"bytes_in_use", "peak_bytes_in_use", "bytes_limit"}


def test_remove_layers(tiny, rng):
    config, params = tiny
    engine = GraspEngine(jax.tree.map(jnp.array, params), config)
    removed = engine.remove_layers(layers_to_remove=[1, 3])
    assert removed == [1, 3]
    assert engine.config.num_hidden_layers == 2
    assert len(engine.params["layers"]) == 2 and len(engine.plan) == 2
    ids = jnp.asarray(rng.integers(0, config.vocab_size, (1, 8)))
    out = forward(engine.params, ids, config=engine.config, plan=engine.plan)
    assert out["logits"].shape == (1, 8, config.vocab_size)


def test_remove_layers_from_bi(tiny, rng):
    config, params = tiny
    engine = GraspEngine(jax.tree.map(jnp.array, params), config)
    batches = [{"input_ids": jnp.asarray(rng.integers(0, 256, (1, 12))),
                "labels": jnp.asarray(rng.integers(0, 256, (1, 12)))}]
    engine.compute_bi(2, batches)
    removed = engine.remove_layers(num_prune_layers=2)
    assert len(removed) == 2 and engine.config.num_hidden_layers == 2


def test_mix_calibration_batches():
    tok = ByteTokenizer()
    batches = get_mix_calibration_batches(
        ["synthetic", "synthetic"], tok, num_samples=8, seq_len=32, batch_size=2
    )
    assert len(batches) >= 2
    for b in batches:
        assert b["input_ids"].shape[1] == 31


def test_decode_device_benchmark_slope(tiny):
    """Two-length slope decode timing: positive per-token time, non-negative
    dispatch overhead, sane reciprocal."""
    from grasp_tpu.perf import decode_device_benchmark

    config, params = tiny
    res = decode_device_benchmark(
        params, config, cache_len=64, prefill_len=16, k_small=4, k_large=12, reps=2
    )
    assert res["decode_ms_per_token_device"] > 0
    assert res["per_call_overhead_ms"] >= 0
    assert abs(res["decode_tokens_per_s_device"] * res["decode_ms_per_token_device"] - 1e3) < 1
