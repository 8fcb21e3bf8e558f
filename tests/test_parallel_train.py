"""Mesh sharding + recovery-training tests on a virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from grasp_tpu.configs import GraspConfig, ModelConfig
from grasp_tpu.core.engine import GraspEngine
from grasp_tpu.models import default_plan, forward, init_params
from grasp_tpu.parallel import make_mesh, shard_batch, shard_params
from grasp_tpu.train import count_trainable, make_optimizer, make_train_step, trainable_mask


@pytest.fixture(scope="module")
def tiny():
    config = ModelConfig.tiny(num_hidden_layers=4, hidden_size=64, num_attention_heads=4,
                              num_key_value_heads=2, intermediate_size=128)
    params = init_params(jax.random.PRNGKey(0), config)
    return config, params


def test_mesh_creation():
    assert len(jax.devices()) == 8, "conftest should provide 8 virtual CPU devices"
    mesh = make_mesh((4, 2))
    assert mesh.axis_names == ("data", "model")
    with pytest.raises(ValueError):
        make_mesh((3, 2))


def test_sharded_forward_matches_single_device(tiny, rng):
    config, params = tiny
    ids = jnp.asarray(rng.integers(0, config.vocab_size, size=(8, 16)))
    ref = np.asarray(forward(params, ids, config=config)["logits"])

    mesh = make_mesh((4, 2))
    sp = shard_params(params, mesh, config)
    sb = shard_batch({"input_ids": ids}, mesh)
    got = np.asarray(forward(sp, sb["input_ids"], config=config)["logits"])
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_sharded_forward_on_compressed_model(tiny, rng):
    """TP-sharded dense layers + replicated low-rank modules coexist."""
    config, params = tiny
    engine = GraspEngine(jax.tree.map(jnp.asarray, params), config)
    batches = [
        {
            "input_ids": jnp.asarray(rng.integers(0, config.vocab_size, (2, 16))),
            "labels": jnp.asarray(rng.integers(0, config.vocab_size, (2, 16))),
        }
        for _ in range(2)
    ]
    engine.run(batches, GraspConfig(num_prune_layers=1, compression_ratio=0.4))

    ids = jnp.asarray(rng.integers(0, config.vocab_size, size=(8, 16)))
    ref = np.asarray(forward(engine.params, ids, config=config, plan=engine.plan)["logits"])

    mesh = make_mesh((4, 2))
    sp = shard_params(engine.params, mesh, config)
    got = np.asarray(forward(sp, ids, config=config, plan=engine.plan)["logits"])
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_trainable_mask_counts(tiny):
    config, params = tiny
    mask = trainable_mask(params, [1, 3])
    total, trainable = count_trainable(params, mask)
    per_layer = sum(x.size for x in jax.tree.leaves(params["layers"][1]))
    per_layer3 = sum(x.size for x in jax.tree.leaves(params["layers"][3]))
    assert trainable == per_layer + per_layer3
    assert total == sum(x.size for x in jax.tree.leaves(params))


def test_train_step_freezes_non_redundant(tiny, rng):
    config, params = tiny
    params = jax.tree.map(jnp.array, params)  # fresh copy: train_step donates its input
    plan = default_plan(config)
    mask = trainable_mask(params, [2])
    tx = make_optimizer(learning_rate=1e-2, total_steps=10, warmup_steps=0, mask=mask)
    opt_state = tx.init(params)
    step = make_train_step(config, plan, tx)

    ids = jnp.asarray(rng.integers(0, config.vocab_size, size=(2, 12)))
    labels = ids
    p0 = jax.tree.map(np.asarray, params)
    params2, opt_state, loss = step(params, opt_state, ids, labels, None)
    assert np.isfinite(float(loss))

    # layer 2 moved, layer 0 (and embeddings) frozen
    moved = np.abs(
        np.asarray(params2["layers"][2]["mlp"]["up_proj"]["kernel"]) - p0["layers"][2]["mlp"]["up_proj"]["kernel"]
    ).max()
    frozen = np.abs(
        np.asarray(params2["layers"][0]["mlp"]["up_proj"]["kernel"]) - p0["layers"][0]["mlp"]["up_proj"]["kernel"]
    ).max()
    emb_frozen = np.abs(
        np.asarray(params2["embed_tokens"]["weight"]) - p0["embed_tokens"]["weight"]
    ).max()
    assert moved > 0
    assert frozen == 0
    assert emb_frozen == 0


def test_training_reduces_loss_on_compressed_layers(tiny, rng):
    """Memorize a fixed batch by training only the compressed layer."""
    config, params = tiny
    # jnp.array (copy), not asarray (view): the train step donates its input
    engine = GraspEngine(jax.tree.map(jnp.array, params), config)
    batches = [
        {
            "input_ids": jnp.asarray(rng.integers(0, config.vocab_size, (2, 16))),
            "labels": jnp.asarray(rng.integers(0, config.vocab_size, (2, 16))),
        }
    ]
    engine.run(batches, GraspConfig(num_prune_layers=1, compression_ratio=0.3))

    mask = trainable_mask(engine.params, engine.redundant_layers)
    tx = make_optimizer(learning_rate=5e-3, total_steps=30, warmup_steps=0, mask=mask)
    opt_state = tx.init(engine.params)
    step = make_train_step(config, engine.plan, tx)

    ids = jnp.asarray(rng.integers(0, config.vocab_size, size=(2, 16)))
    p = engine.params
    losses = []
    for _ in range(15):
        p, opt_state, loss = step(p, opt_state, ids, ids, None)
        losses.append(float(loss))
    assert losses[-1] < losses[0], f"loss did not decrease: {losses[0]} -> {losses[-1]}"


def test_grad_accumulation_steps(tiny, rng):
    config, params = tiny
    params = jax.tree.map(jnp.array, params)  # fresh copy: train_step donates its input
    plan = default_plan(config)
    mask = trainable_mask(params, [0])
    tx = make_optimizer(learning_rate=1e-2, total_steps=4, warmup_steps=0, accum_steps=2, mask=mask)
    opt_state = tx.init(params)
    step = make_train_step(config, plan, tx)
    ids = jnp.asarray(rng.integers(0, config.vocab_size, size=(1, 8)))

    p0 = np.asarray(params["layers"][0]["mlp"]["up_proj"]["kernel"])
    params1, opt_state, _ = step(params, opt_state, ids, ids, None)
    # after 1 micro-step of 2, params must be unchanged
    np.testing.assert_array_equal(np.asarray(params1["layers"][0]["mlp"]["up_proj"]["kernel"]), p0)
    params2, opt_state, _ = step(params1, opt_state, ids, ids, None)
    assert np.abs(np.asarray(params2["layers"][0]["mlp"]["up_proj"]["kernel"]) - p0).max() > 0
