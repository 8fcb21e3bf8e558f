"""Quantized params through the mesh/perf paths (review findings regression)."""

import numpy as np

import jax
import jax.numpy as jnp

from grasp_tpu.configs import GraspConfig, ModelConfig
from grasp_tpu.core.engine import GraspEngine
from grasp_tpu.models.llama import forward, init_params
from grasp_tpu.ops.quant import quantize_model_weights
from grasp_tpu.parallel import make_mesh, shard_params
from grasp_tpu.perf import estimate_forward_flops


def test_shard_quantized_params(rng):
    config = ModelConfig.tiny(num_hidden_layers=2)
    params = quantize_model_weights(init_params(jax.random.PRNGKey(0), config))
    mesh = make_mesh((4, 2))
    sp = shard_params(params, mesh, config)

    # kernel_q must actually be tensor-parallel, not silently replicated
    q_sharding = sp["layers"][0]["mlp"]["up_proj"]["kernel_q"].sharding
    assert "model" in str(q_sharding.spec), f"kernel_q replicated: {q_sharding.spec}"

    ids = jnp.asarray(rng.integers(0, config.vocab_size, (4, 8)))
    y_sharded = np.asarray(forward(sp, ids, config=config)["logits"])
    y_local = np.asarray(forward(params, ids, config=config)["logits"])
    np.testing.assert_allclose(y_sharded, y_local, rtol=1e-4, atol=1e-5)


def test_flops_on_quantized_params(rng):
    config = ModelConfig.tiny(num_hidden_layers=2)
    params = init_params(jax.random.PRNGKey(0), config)
    engine = GraspEngine(jax.tree.map(jnp.array, params), config)
    batches = [{
        "input_ids": jnp.asarray(rng.integers(0, config.vocab_size, (1, 12))),
        "labels": jnp.asarray(rng.integers(0, config.vocab_size, (1, 12))),
    }]
    engine.run(batches, GraspConfig(num_prune_layers=1, compression_ratio=0.5))
    q = quantize_model_weights(engine.params)
    est_q = estimate_forward_flops(q, config, engine.plan)
    est_fp = estimate_forward_flops(engine.params, config, engine.plan)
    assert est_q["macs"] == est_fp["macs"], "quantization must not change MAC count"
