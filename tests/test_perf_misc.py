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


def test_live_device_bytes_counts_resident_arrays():
    """The axon fallback (live-array walk) must see a committed array."""
    from grasp_tpu.perf import _live_device_bytes

    dev = jax.devices()[0]
    x = jax.device_put(jnp.ones((128, 128), jnp.float32), dev)
    x.block_until_ready()
    assert _live_device_bytes(dev) >= x.nbytes
    del x


def test_device_memory_nonzero_and_peak_monotone():
    """bytes_in_use > 0 with a live array; peak never decreases across calls.

    On runtimes without allocator stats (axon TPU) this exercises the
    live-walk + high-water-mark fallback; with stats it checks them directly.
    """
    from grasp_tpu.perf import reset_hbm_peak

    reset_hbm_peak()
    big = jnp.ones((256, 256), jnp.float32)
    big.block_until_ready()
    m1 = device_memory()
    assert m1["bytes_in_use"] > 0
    assert m1["peak_bytes_in_use"] >= m1["bytes_in_use"] or m1["peak_bytes_in_use"] > 0
    del big
    m2 = device_memory()
    assert m2["peak_bytes_in_use"] >= m2["bytes_in_use"]


def test_executable_memory_analysis():
    """XLA memory analysis of a compiled fn reports a sane peak."""
    from grasp_tpu.perf import executable_memory

    @jax.jit
    def f(a, b):
        return (a @ b).sum()

    a = jnp.ones((64, 64), jnp.float32)
    compiled = f.lower(a, a).compile()
    mem = executable_memory(compiled)
    assert mem["peak_bytes"] >= mem["argument_bytes"] > 0
    assert mem["output_bytes"] > 0


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


def test_forward_device_benchmark_slope(tiny):
    """Chained-forward slope timing: positive per-forward time, non-negative
    dispatch overhead, and the labels epilogue compiles (the calibration
    sweep's real forward shape)."""
    import jax.numpy as jnp

    from grasp_tpu.perf import forward_device_benchmark

    config, params = tiny
    ids = jnp.ones((2, 16), jnp.int32)
    labels = jnp.ones((2, 16), jnp.int32)
    res = forward_device_benchmark(
        params, config, ids, labels=labels, k_small=1, k_large=4, reps=2
    )
    assert res["fwd_s_device"] > 0
    assert res["per_call_overhead_ms"] >= 0


def test_enable_compilation_cache(tmp_path, monkeypatch):
    """$GRASP_COMPILE_CACHE opt-in: configures jax's persistent cache dir;
    no-op without the env var."""
    import os

    import jax

    from grasp_tpu import enable_compilation_cache

    monkeypatch.delenv("GRASP_COMPILE_CACHE", raising=False)
    assert enable_compilation_cache() is False

    d = str(tmp_path / "xla_cache")
    monkeypatch.setenv("GRASP_COMPILE_CACHE", d)
    assert enable_compilation_cache() is True
    assert jax.config.jax_compilation_cache_dir == d
    assert os.path.isdir(d)
    jax.config.update("jax_compilation_cache_dir", None)  # don't leak state
