"""Int8 weight quantization tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from grasp_tpu.configs import GraspConfig, ModelConfig
from grasp_tpu.core.engine import GraspEngine
from grasp_tpu.models.llama import forward, init_params
from grasp_tpu.ops.quant import (
    dequantize,
    quant_matmul,
    quantize_int8,
    quantize_model_weights,
    quantized_size_bytes,
)


def test_quantize_roundtrip_error(rng):
    w = jnp.asarray(rng.standard_normal((64, 48)) * 0.02, jnp.float32)
    q, scale = quantize_int8(w)
    rec = dequantize(q, scale, jnp.float32)
    # absmax int8: max error = scale/2 per channel
    err = np.abs(np.asarray(rec) - np.asarray(w))
    assert err.max() <= float(scale.max()) * 0.5 + 1e-8
    assert q.dtype == jnp.int8 and scale.shape == (1, 48)


def test_quant_matmul_close_to_fp(rng):
    x = jnp.asarray(rng.standard_normal((8, 64)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((64, 48)) * 0.02, jnp.float32)
    q, scale = quantize_int8(w)
    y_q = np.asarray(quant_matmul(x, q, scale))
    y_fp = np.asarray(x @ w)
    rel = np.abs(y_q - y_fp).max() / (np.abs(y_fp).max() + 1e-9)
    assert rel < 0.02, f"int8 matmul rel error {rel}"


def test_quantized_model_forward(rng):
    """Compress then quantize: forward stays close; weights shrink ~4x (fp32->int8)."""
    config = ModelConfig.tiny(num_hidden_layers=3)
    params = init_params(jax.random.PRNGKey(0), config)
    engine = GraspEngine(jax.tree.map(jnp.array, params), config)
    batches = [{
        "input_ids": jnp.asarray(rng.integers(0, config.vocab_size, (2, 16))),
        "labels": jnp.asarray(rng.integers(0, config.vocab_size, (2, 16))),
    }]
    engine.run(batches, GraspConfig(num_prune_layers=1, compression_ratio=0.4))

    qparams = quantize_model_weights(engine.params)
    ids = jnp.asarray(rng.integers(0, config.vocab_size, (1, 12)))
    y_fp = np.asarray(forward(engine.params, ids, config=config, plan=engine.plan)["logits"])
    y_q = np.asarray(forward(qparams, ids, config=config, plan=engine.plan)["logits"])
    rel = np.abs(y_q - y_fp).max() / (np.abs(y_fp).max() + 1e-9)
    assert rel < 0.06, f"quantized forward rel error {rel}"

    assert quantized_size_bytes(qparams) < quantized_size_bytes(engine.params) * 0.65


def test_quantized_decode(rng):
    from grasp_tpu.eval.generate import Generator

    config = ModelConfig.tiny(num_hidden_layers=2)
    params = quantize_model_weights(init_params(jax.random.PRNGKey(0), config))
    gen = Generator(params, config)
    out = gen.greedy(rng.integers(0, config.vocab_size, size=(10,)), 6)
    assert len(out) == 6 and all(0 <= t < config.vocab_size for t in out)


@pytest.mark.skipif(
    not any(d.platform == "tpu" for d in jax.devices()), reason="needs a real TPU"
)
def test_pallas_stochastic_quantize_on_tpu(rng):
    from grasp_tpu.ops.quant import pallas_quantize_int8

    w = jnp.asarray(rng.standard_normal((256, 128)) * 0.02, jnp.float32)
    q, scale = pallas_quantize_int8(w, seed=0)
    rec = np.asarray(dequantize(q, scale, jnp.float32))
    err = np.abs(rec - np.asarray(w))
    assert err.max() <= float(np.asarray(scale).max()) * 1.0 + 1e-8  # stochastic: <= 1 ulp
