"""LLaMA-3.1 rope scaling parity vs HF, and config hashability.

transformers computes llama3-scaled inverse frequencies in
_compute_llama3_parameters (low-frequency components divided by `factor`,
high-frequency kept, smooth interpolation between); rope_cos_sin replicates
it. ModelConfig normalizes the HF rope_scaling dict to tuple pairs so the
frozen config stays hashable (eval/ppl.py uses it as a jit static arg).
"""

import numpy as np
import pytest
import torch

torch.manual_seed(0)

import jax
import jax.numpy as jnp
from transformers import LlamaConfig, LlamaForCausalLM

from grasp_tpu.configs import ModelConfig
from grasp_tpu.models.hf_io import config_from_hf, params_from_state_dict
from grasp_tpu.models.llama import decode_step, default_plan, forward, init_kv_cache, prefill

HF_CFG = dict(
    vocab_size=128,
    hidden_size=64,
    intermediate_size=176,
    num_hidden_layers=3,
    num_attention_heads=4,
    num_key_value_heads=2,
    max_position_embeddings=64,
    rms_norm_eps=1e-5,
    rope_theta=10000.0,
    rope_scaling={
        "rope_type": "llama3",
        "factor": 2.0,
        "low_freq_factor": 1.0,
        "high_freq_factor": 4.0,
        "original_max_position_embeddings": 8,
    },
)


@pytest.fixture(scope="module")
def hf_model():
    return LlamaForCausalLM(LlamaConfig(**HF_CFG)).eval().float()


@pytest.fixture(scope="module")
def ours(hf_model):
    config = config_from_hf(hf_model.config)
    params = params_from_state_dict(hf_model.state_dict(), config)
    return config, jax.tree.map(jnp.asarray, params)


def test_scaling_imports_hashable(ours):
    config, _ = ours
    assert isinstance(config.rope_scaling, tuple)
    assert config.rope_scaling_dict["factor"] == 2.0
    hash(config)  # jit-static-arg requirement (eval/ppl.py)
    assert ModelConfig.from_json(config.to_json()) == config  # round trip


def test_scaling_is_material(ours, rng):
    """Dropping the scaling changes the logits — the test would not pass
    by ignoring rope_scaling."""
    config, params = ours
    ids = jnp.asarray(rng.integers(1, 120, (1, 20)))
    scaled = np.asarray(forward(params, ids, config=config)["logits"])
    plain = np.asarray(forward(
        params, ids,
        config=dataclasses_replace(config, rope_scaling=None))["logits"])
    assert np.abs(scaled - plain).max() > 1e-3


def dataclasses_replace(config, **kw):
    import dataclasses

    return dataclasses.replace(config, **kw)


def test_llama31_logits_match_hf(hf_model, ours, rng):
    config, params = ours
    ids = rng.integers(1, 120, (2, 20))
    with torch.no_grad():
        want = hf_model(torch.tensor(ids)).logits.numpy()
    got = np.asarray(forward(params, jnp.asarray(ids), config=config)["logits"])
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_llama31_kv_decode_matches_full_forward(ours, rng):
    config, params = ours
    ids = rng.integers(1, 120, (1, 14))
    full = np.asarray(forward(params, jnp.asarray(ids), config=config)["logits"])
    cache = init_kv_cache(config, batch=1, max_len=32)
    logits, cache = prefill(params, jnp.asarray(ids[:, :7]), cache, config=config,
                            plan=default_plan(config))
    np.testing.assert_allclose(np.asarray(logits), full[:, :7], atol=2e-4, rtol=2e-4)
    for i in range(7, 14):
        step, cache = decode_step(params, jnp.asarray(ids[:, i : i + 1]), cache, i,
                                  config=config, plan=default_plan(config))
        np.testing.assert_allclose(np.asarray(step[:, 0]), full[:, i], atol=3e-4, rtol=3e-4)


def test_linear_scaling_matches_hf(rng):
    cfg = dict(HF_CFG)
    cfg["rope_scaling"] = {"rope_type": "linear", "factor": 2.0}
    hf = LlamaForCausalLM(LlamaConfig(**cfg)).eval().float()
    config = config_from_hf(hf.config)
    params = jax.tree.map(jnp.asarray, params_from_state_dict(hf.state_dict(), config))
    ids = rng.integers(1, 120, (1, 16))
    with torch.no_grad():
        want = hf(torch.tensor(ids)).logits.numpy()
    got = np.asarray(forward(params, jnp.asarray(ids), config=config)["logits"])
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)
