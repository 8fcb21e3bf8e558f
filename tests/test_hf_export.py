"""HF checkpoint EXPORT: param pytrees -> torch-ecosystem state dicts.

The reference lives in torch — its compiled checkpoints are pickled modules
whose state_dicts use SVDLinear InLinear/OutLinear naming
(modeling_grasp.py:40-59) and its merge mode writes stock dense HF weights
(:447-460). state_dict_from_params/save_hf_checkpoint are the exit ramp back:
merge=True produces a checkpoint AutoModelForCausalLM loads directly (proven
here by executing transformers on the export), merge=False round-trips the
compressed factors through our own importer under the reference naming.
"""

import json

import numpy as np
import pytest
import torch

torch.manual_seed(0)

import jax
import jax.numpy as jnp

from grasp_tpu.configs import GraspConfig, ModelConfig
from grasp_tpu.core.engine import GraspEngine
from grasp_tpu.models.hf_io import (
    config_from_dir,
    params_from_state_dict,
    save_hf_checkpoint,
    state_dict_from_params,
)
from grasp_tpu.models.llama import forward, init_params, plan_from_params


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


def _compressed_engine(config, rng):
    params = init_params(jax.random.PRNGKey(0), config)
    engine = GraspEngine(params, config)
    batches = [{
        "input_ids": jnp.asarray(rng.integers(0, config.vocab_size, (2, 16))),
        "labels": jnp.asarray(rng.integers(0, config.vocab_size, (2, 16))),
    }]
    engine.run(batches, GraspConfig(num_prune_layers=1, compression_ratio=0.4))
    return engine


def test_dense_roundtrip(rng):
    config = ModelConfig.tiny(num_hidden_layers=2)
    params = init_params(jax.random.PRNGKey(1), config)
    sd = state_dict_from_params(params, config)
    params2 = params_from_state_dict(sd, config)
    ids = jnp.asarray(rng.integers(0, config.vocab_size, (1, 8)))
    a = np.asarray(forward(params, ids, config=config)["logits"])
    b = np.asarray(forward(jax.tree.map(jnp.asarray, params2), ids, config=config)["logits"])
    np.testing.assert_array_equal(a, b)


def test_compressed_svdlinear_naming_roundtrip(rng):
    """merge=False keeps the reference's compiled-model naming and round-trips."""
    config = ModelConfig.tiny(num_hidden_layers=3)
    engine = _compressed_engine(config, rng)

    sd = state_dict_from_params(engine.params, config, merge=False)
    lowrank_keys = [k for k in sd if ".InLinear.weight" in k]
    assert lowrank_keys, "compression produced no low-rank modules?"
    for k in lowrank_keys:
        assert k.replace("InLinear", "OutLinear") in sd

    params2 = params_from_state_dict(sd, config)
    plan2 = plan_from_params(params2, config)
    assert plan2 == engine.plan

    ids = jnp.asarray(rng.integers(0, config.vocab_size, (1, 8)))
    a = np.asarray(forward(engine.params, ids, config=config, plan=engine.plan)["logits"])
    b = np.asarray(forward(jax.tree.map(jnp.asarray, params2), ids, config=config,
                           plan=plan2)["logits"])
    np.testing.assert_array_equal(a, b)


def test_merged_export_loads_in_transformers(tmp_path, rng):
    """merge=True writes a stock HF checkpoint; the executing transformers
    LlamaForCausalLM must produce our compressed model's logits from it."""
    from transformers import LlamaForCausalLM

    config = ModelConfig.tiny(num_hidden_layers=3)
    engine = _compressed_engine(config, rng)

    out = str(tmp_path / "export")
    save_hf_checkpoint(engine.params, config, out, merge=True)

    with open(f"{out}/config.json") as f:
        assert json.load(f)["architectures"] == ["LlamaForCausalLM"]
    assert config_from_dir(out) == config

    model = LlamaForCausalLM.from_pretrained(out).eval().float()
    ids_np = rng.integers(0, config.vocab_size, (2, 12))
    with torch.no_grad():
        ref = model(torch.tensor(ids_np)).logits.numpy()
    ours = np.asarray(
        forward(engine.params, jnp.asarray(ids_np), config=config, plan=engine.plan)["logits"]
    )
    np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=2e-5)


def test_attention_bias_roundtrip(rng):
    """Qwen2-style q/k/v bias survives export -> import."""
    config = ModelConfig.tiny(num_hidden_layers=2, attention_bias=True)
    params = init_params(jax.random.PRNGKey(2), config)
    sd = state_dict_from_params(params, config)
    assert "model.layers.0.self_attn.q_proj.bias" in sd
    params2 = params_from_state_dict(sd, config)
    ids = jnp.asarray(rng.integers(0, config.vocab_size, (1, 8)))
    a = np.asarray(forward(params, ids, config=config)["logits"])
    b = np.asarray(forward(jax.tree.map(jnp.asarray, params2), ids, config=config)["logits"])
    np.testing.assert_array_equal(a, b)


def test_quantized_export_rejected(rng):
    config = ModelConfig.tiny(num_hidden_layers=2)
    params = init_params(jax.random.PRNGKey(3), config)
    from grasp_tpu.ops.quant import quantize_model_weights

    qp = quantize_model_weights(params)
    with pytest.raises(ValueError, match="quantized"):
        state_dict_from_params(qp, config)
