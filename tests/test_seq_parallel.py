"""Sequence-parallel forward (ring attention through the stack) tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from grasp_tpu.configs import GraspConfig, ModelConfig
from grasp_tpu.core.engine import GraspEngine
from grasp_tpu.models.llama import forward, init_params
from grasp_tpu.parallel.seq_parallel import seq_parallel_logits


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.asarray(jax.devices()).reshape(8), ("data",))


def test_seq_parallel_matches_forward(mesh, rng):
    config = ModelConfig.tiny(num_hidden_layers=3)
    params = init_params(jax.random.PRNGKey(0), config)
    ids = jnp.asarray(rng.integers(0, config.vocab_size, (2, 64)))  # 8 tokens/device
    ref = np.asarray(forward(params, ids, config=config)["logits"])
    got = np.asarray(seq_parallel_logits(params, ids, mesh, config))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


def test_seq_parallel_gqa_and_compressed(mesh, rng):
    """Rank-heterogeneous (compressed) plan + GQA through the ring path."""
    config = ModelConfig.tiny(num_hidden_layers=3)  # GQA: 4 heads, 2 kv heads
    engine = GraspEngine(init_params(jax.random.PRNGKey(0), config), config)
    batches = [{
        "input_ids": jnp.asarray(rng.integers(0, config.vocab_size, (1, 16))),
        "labels": jnp.asarray(rng.integers(0, config.vocab_size, (1, 16))),
    }]
    engine.run(batches, GraspConfig(num_prune_layers=1, compression_ratio=0.4))

    ids = jnp.asarray(rng.integers(0, config.vocab_size, (1, 32)))
    ref = np.asarray(forward(engine.params, ids, config=config, plan=engine.plan)["logits"])
    got = np.asarray(seq_parallel_logits(engine.params, ids, mesh, config, plan=engine.plan))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


def test_seq_parallel_under_jit(mesh, rng):
    config = ModelConfig.tiny(num_hidden_layers=2)
    params = init_params(jax.random.PRNGKey(0), config)
    ids = jnp.asarray(rng.integers(0, config.vocab_size, (1, 16)))
    f = jax.jit(lambda p, i: seq_parallel_logits(p, i, mesh, config))
    ref = np.asarray(forward(params, ids, config=config)["logits"])
    np.testing.assert_allclose(np.asarray(f(params, ids)), ref, rtol=2e-4, atol=2e-5)
