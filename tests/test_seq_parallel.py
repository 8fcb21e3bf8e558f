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


@pytest.mark.parametrize("remat", [False, True])
def test_seq_parallel_grads_match_single_device(mesh, rng, remat):
    """Long-context TRAINING: jax.grad through the ring (ppermute transpose +
    online-softmax scan backward) equals the regular forward's grads."""
    from grasp_tpu.models.llama import hf_causal_lm_loss
    from grasp_tpu.parallel.seq_parallel import seq_parallel_loss

    config = ModelConfig.tiny(num_hidden_layers=2)
    params = init_params(jax.random.PRNGKey(0), config)
    ids = jnp.asarray(rng.integers(0, config.vocab_size, (2, 32)))
    labels = jnp.asarray(rng.integers(0, config.vocab_size, (2, 32)))

    def ref_loss(p):
        return hf_causal_lm_loss(forward(p, ids, config=config)["logits"], labels)

    ref_l, ref_g = jax.value_and_grad(ref_loss)(params)
    # remat inside shard_map requires a jit around it (eager closed_call is
    # unsupported); the training step is always jitted anyway
    got_l, got_g = jax.jit(jax.value_and_grad(
        lambda p: seq_parallel_loss(p, ids, labels, mesh, config, remat=remat)
    ))(params)

    np.testing.assert_allclose(float(got_l), float(ref_l), rtol=1e-5)
    flat_ref, _ = jax.tree.flatten(ref_g)
    flat_got, treedef = jax.tree.flatten(got_g)
    assert len(flat_ref) == len(flat_got)
    for a, b in zip(flat_got, flat_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5)


def test_seq_parallel_train_step_reduces_loss(mesh, rng):
    import optax

    from grasp_tpu.models.llama import default_plan
    from grasp_tpu.parallel.seq_parallel import make_seq_parallel_train_step

    config = ModelConfig.tiny(num_hidden_layers=2)
    params = jax.tree.map(jnp.array, init_params(jax.random.PRNGKey(0), config))
    ids = jnp.asarray(rng.integers(0, config.vocab_size, (1, 32)))
    tx = optax.adam(5e-3)
    opt_state = tx.init(params)
    step = make_seq_parallel_train_step(config, default_plan(config), tx, mesh)
    losses = []
    for _ in range(8):
        params, opt_state, loss = step(params, opt_state, ids, ids)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_seq_parallel_gemma_matches_forward(mesh, rng):
    """Gemma variants (GeGLU, (1+w) norms, scaled embeddings, tied head)
    through the sequence-parallel block implementation."""
    config = ModelConfig.tiny(num_hidden_layers=2, hidden_act="gelu_pytorch_tanh",
                              norm_plus_one=True, scale_embeddings=True,
                              tie_word_embeddings=True)
    params = init_params(jax.random.PRNGKey(5), config)
    ids = jnp.asarray(rng.integers(0, config.vocab_size, (2, 64)))
    ref = np.asarray(forward(params, ids, config=config)["logits"])
    got = np.asarray(seq_parallel_logits(params, ids, mesh, config))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


def test_seq_parallel_gemma2_matches_forward(mesh, rng):
    """Gemma-2 variants through sequence parallelism: per-layer windows,
    softcapped ring-attention scores (pre-mask, HF order), sandwich norms
    via the shared layer body, qpas scale, capped final logits."""
    config = ModelConfig.tiny(
        num_hidden_layers=2, hidden_act="gelu_pytorch_tanh",
        norm_plus_one=True, scale_embeddings=True, tie_word_embeddings=True,
        sandwich_norms=True, sliding_window=6,
        layer_types=("sliding_attention", "full_attention"),
        attn_logit_softcapping=0.5, final_logit_softcapping=3.0,
        query_pre_attn_scalar=32.0)
    params = init_params(jax.random.PRNGKey(8), config)
    ids = jnp.asarray(rng.integers(0, config.vocab_size, (2, 64)))
    ref = np.asarray(forward(params, ids, config=config)["logits"])
    got = np.asarray(seq_parallel_logits(params, ids, mesh, config))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)
