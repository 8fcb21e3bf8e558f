"""Model parity tests: our functional-JAX LLaMA vs HF torch LlamaForCausalLM.

Tiny random-init models on CPU in fp32 — logits, hidden-state taps, loss and
KV-cache decode must match HF to fp32 tolerance. This is the substrate the
reference builds on (SURVEY.md §2 "Transformer fwd/bwd" primitive row).
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
from grasp_tpu.models.llama import (
    decode_step,
    default_plan,
    forward,
    hf_causal_lm_loss,
    init_kv_cache,
    init_params,
    prefill,
)

HF_CFG = dict(
    vocab_size=128,
    hidden_size=64,
    intermediate_size=176,
    num_hidden_layers=3,
    num_attention_heads=4,
    num_key_value_heads=2,  # GQA
    max_position_embeddings=128,
    rms_norm_eps=1e-5,
    rope_theta=10000.0,
    tie_word_embeddings=False,
    attention_bias=False,
    mlp_bias=False,
)


@pytest.fixture(scope="module")
def hf_model():
    cfg = LlamaConfig(**HF_CFG)
    model = LlamaForCausalLM(cfg).eval().float()
    return model


@pytest.fixture(scope="module")
def ours(hf_model):
    config = config_from_hf(hf_model.config)
    params = params_from_state_dict(hf_model.state_dict(), config)
    params = jax.tree.map(jnp.asarray, params)
    return config, params


def test_logits_match_hf(hf_model, ours, rng):
    config, params = ours
    ids = rng.integers(0, HF_CFG["vocab_size"], size=(2, 17))
    with torch.no_grad():
        ref = hf_model(torch.from_numpy(ids)).logits.numpy()
    got = np.asarray(forward(params, jnp.asarray(ids), config=config)["logits"])
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=2e-5)


def test_hidden_states_match_hf(hf_model, ours, rng):
    config, params = ours
    ids = rng.integers(0, HF_CFG["vocab_size"], size=(1, 9))
    with torch.no_grad():
        ref = hf_model(torch.from_numpy(ids), output_hidden_states=True).hidden_states
    got = forward(params, jnp.asarray(ids), config=config, output_hidden_states=True)["hidden_states"]
    assert len(got) == len(ref) == HF_CFG["num_hidden_layers"] + 1
    for i, (g, r) in enumerate(zip(got, ref)):
        np.testing.assert_allclose(np.asarray(g), r.numpy(), rtol=1e-4, atol=2e-5, err_msg=f"hidden {i}")


def test_loss_matches_hf(hf_model, ours, rng):
    config, params = ours
    ids = rng.integers(0, HF_CFG["vocab_size"], size=(2, 12))
    labels = rng.integers(0, HF_CFG["vocab_size"], size=(2, 12))
    with torch.no_grad():
        ref = hf_model(torch.from_numpy(ids), labels=torch.from_numpy(labels)).loss.item()
    logits = forward(params, jnp.asarray(ids), config=config)["logits"]
    got = float(hf_causal_lm_loss(logits, jnp.asarray(labels)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_padding_mask_matches_hf(hf_model, ours, rng):
    config, params = ours
    ids = rng.integers(0, HF_CFG["vocab_size"], size=(2, 10))
    mask = np.ones((2, 10), dtype=np.int64)
    mask[0, :3] = 0  # left padding
    with torch.no_grad():
        ref = hf_model(torch.from_numpy(ids), attention_mask=torch.from_numpy(mask)).logits.numpy()
    got = np.asarray(
        forward(params, jnp.asarray(ids), config=config, attention_mask=jnp.asarray(mask))["logits"]
    )
    # only compare non-pad positions (HF's pad-position outputs are arbitrary)
    np.testing.assert_allclose(got[0, 3:], ref[0, 3:], rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(got[1], ref[1], rtol=1e-4, atol=2e-5)


def test_kv_cache_decode_matches_full_forward(ours, rng):
    config, params = ours
    plan = default_plan(config)
    ids = rng.integers(0, HF_CFG["vocab_size"], size=(2, 12))
    full = np.asarray(forward(params, jnp.asarray(ids), config=config)["logits"])

    cache = init_kv_cache(config, batch=2, max_len=16)
    logits_p, cache = prefill(params, jnp.asarray(ids[:, :8]), cache, config=config, plan=plan)
    np.testing.assert_allclose(np.asarray(logits_p), full[:, :8], rtol=1e-4, atol=1e-5)
    for t in range(8, 12):
        logits_t, cache = decode_step(
            params, jnp.asarray(ids[:, t : t + 1]), cache, jnp.asarray(t, jnp.int32),
            config=config, plan=plan,
        )
        np.testing.assert_allclose(np.asarray(logits_t)[:, 0], full[:, t], rtol=1e-4, atol=1e-5)


def test_tied_embeddings_and_random_init():
    config = ModelConfig.tiny(tie_word_embeddings=True)
    params = init_params(jax.random.PRNGKey(0), config)
    assert "lm_head" not in params
    ids = jnp.zeros((1, 5), jnp.int32)
    out = forward(params, ids, config=config)
    assert out["logits"].shape == (1, 5, config.vocab_size)


def test_remat_forward_matches(ours, rng):
    config, params = ours
    ids = rng.integers(0, HF_CFG["vocab_size"], size=(1, 7))
    a = np.asarray(forward(params, jnp.asarray(ids), config=config)["logits"])
    b = np.asarray(forward(params, jnp.asarray(ids), config=config, remat=True)["logits"])
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)
