"""Qwen2-family parity: our functional model vs HF torch Qwen2ForCausalLM.

Qwen2 is LLaMA-shaped with GQA plus BIASES on the q/k/v projections (o_proj
and the MLP stay bias-free) — the one numerics path the LLaMA goldens never
exercise. Bias presence is data-driven from the imported pytree
(models/hf_io.py:96-97), so parity here pins both the import and the
forward's bias application. The reference supports Qwen2 checkpoints through
the same HF loading path it uses for LLaMA (grasp.py:54-58).
"""

import numpy as np
import pytest
import torch

torch.manual_seed(0)

import jax
import jax.numpy as jnp
from transformers import Qwen2Config, Qwen2ForCausalLM

from grasp_tpu.configs import GraspConfig, ModelConfig
from grasp_tpu.core.engine import GraspEngine
from grasp_tpu.models.hf_io import config_from_hf, params_from_state_dict
from grasp_tpu.models.llama import decode_step, default_plan, forward, init_kv_cache, prefill

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
)


@pytest.fixture(scope="module")
def hf_model():
    return Qwen2ForCausalLM(Qwen2Config(**HF_CFG)).eval().float()


@pytest.fixture(scope="module")
def ours(hf_model):
    config = config_from_hf(hf_model.config)
    params = params_from_state_dict(hf_model.state_dict(), config)
    return config, jax.tree.map(jnp.asarray, params)


def test_qwen2_has_qkv_biases(hf_model, ours):
    """The imported pytree carries exactly HF's biases: q/k/v yes, o/mlp no."""
    _, params = ours
    attn = params["layers"][0]["self_attn"]
    assert "bias" in attn["q_proj"] and "bias" in attn["k_proj"] and "bias" in attn["v_proj"]
    assert "bias" not in attn["o_proj"]
    assert "bias" not in params["layers"][0]["mlp"]["gate_proj"]
    want = hf_model.model.layers[0].self_attn.q_proj.bias.detach().numpy()
    np.testing.assert_array_equal(np.asarray(attn["q_proj"]["bias"]), want)


def test_qwen2_logits_match_hf(hf_model, ours, rng):
    config, params = ours
    ids = rng.integers(1, 120, (2, 19))
    with torch.no_grad():
        want = hf_model(torch.tensor(ids)).logits.numpy()
    got = np.asarray(forward(params, jnp.asarray(ids), config=config)["logits"])
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_qwen2_kv_decode_matches_full_forward(ours, rng):
    config, params = ours
    ids = rng.integers(1, 120, (1, 12))
    full = np.asarray(forward(params, jnp.asarray(ids), config=config)["logits"])

    cache = init_kv_cache(config, batch=1, max_len=32)
    logits, cache = prefill(params, jnp.asarray(ids[:, :8]), cache, config=config,
                            plan=default_plan(config))
    np.testing.assert_allclose(np.asarray(logits), full[:, :8], atol=2e-4, rtol=2e-4)
    for i in range(8, 12):
        step, cache = decode_step(params, jnp.asarray(ids[:, i : i + 1]), cache, i,
                                  config=config, plan=default_plan(config))
        np.testing.assert_allclose(np.asarray(step[:, 0]), full[:, i], atol=3e-4, rtol=3e-4)


def test_qwen2_grasp_compression_end_to_end(ours, rng):
    """The engine compresses a biased-attention model: biases survive the
    low-rank swap (they attach to the module, not the factorized kernel)."""
    config, params = ours
    batches = [{"input_ids": rng.integers(1, 120, (2, 16)),
                "labels": rng.integers(1, 120, (2, 16))} for _ in range(2)]
    eng = GraspEngine(jax.tree.map(jnp.array, params), config)
    summary = eng.run(batches, GraspConfig(num_prune_layers=1, compression_ratio=0.3))
    assert summary["rank_dict"]
    attn = eng.params["layers"][summary["redundant_layers"][0]]["self_attn"]
    assert "bias" in attn["q_proj"]  # bias preserved through compile
    out = forward(eng.params, jnp.asarray(batches[0]["input_ids"]), config=config,
                  plan=eng.plan)["logits"]
    assert np.isfinite(np.asarray(out)).all()
