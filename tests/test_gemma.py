"""Gemma-family parity: our functional model vs HF torch GemmaForCausalLM.

Gemma-1 departs from the LLaMA shape in four ways, each threaded through
every decode path (models/llama.py, serving/paged.py, serving/spec_paged.py,
parallel/seq_parallel.py):

  - GeGLU MLP: gate activation is gelu_pytorch_tanh, not silu
    (``mlp_act``, HF ACT2FN parity);
  - (1+w) RMSNorm with zero-initialized weight, multiply in fp32 before the
    cast back (``rms_norm(plus_one=True)``, HF GemmaRMSNorm /
    transformers#29402);
  - embeddings scaled by sqrt(hidden_size), with the normalizer rounded to
    the embedding dtype first (``embed_lookup``, HF GemmaModel.forward);
  - tied lm_head + a head_dim decoupled from hidden_size/num_heads (the
    o_proj is [heads*head_dim, hidden], non-square even for MHA).

The reference loads any HF causal LM through the same AutoModel path it uses
for LLaMA (grasp.py:54-58); compression itself is projection-name-driven, so
parity of the forward is what makes the whole pipeline Gemma-capable.
"""

import numpy as np
import pytest
import torch

torch.manual_seed(0)

import jax
import jax.numpy as jnp
from transformers import GemmaConfig, GemmaForCausalLM

from grasp_tpu.configs import GraspConfig, ModelConfig
from grasp_tpu.core.engine import GraspEngine
from grasp_tpu.models.hf_io import config_from_hf, params_from_state_dict
from grasp_tpu.models.llama import (
    decode_step,
    default_plan,
    forward,
    init_kv_cache,
    init_params,
    prefill,
)

HF_CFG = dict(
    vocab_size=128,
    hidden_size=48,
    intermediate_size=144,
    num_hidden_layers=3,
    num_attention_heads=4,
    num_key_value_heads=1,  # MQA, like gemma-2b
    head_dim=16,            # decoupled: q_dim = 64 != 48 = hidden
    max_position_embeddings=128,
    rms_norm_eps=1e-6,
    rope_theta=10000.0,
    hidden_activation="gelu_pytorch_tanh",
)


@pytest.fixture(scope="module")
def hf_model():
    return GemmaForCausalLM(GemmaConfig(**HF_CFG)).eval().float()


@pytest.fixture(scope="module")
def ours(hf_model):
    config = config_from_hf(hf_model.config)
    params = params_from_state_dict(hf_model.state_dict(), config)
    return config, jax.tree.map(jnp.asarray, params)


def test_gemma_config_import(hf_model, ours):
    config, params = ours
    assert config.hidden_act == "gelu_pytorch_tanh"
    assert config.norm_plus_one and config.scale_embeddings
    assert config.tie_word_embeddings and "lm_head" not in params
    assert config.head_dim_ == 16 and config.q_dim == 64
    # HF zero-initializes Gemma norm weights ((1+w) convention)
    w = np.asarray(params["layers"][0]["input_layernorm"]["weight"])
    np.testing.assert_array_equal(
        w, hf_model.model.layers[0].input_layernorm.weight.detach().numpy())


def test_gemma_logits_match_hf(hf_model, ours, rng):
    config, params = ours
    ids = rng.integers(1, 120, (2, 19))
    with torch.no_grad():
        want = hf_model(torch.tensor(ids)).logits.numpy()
    got = np.asarray(forward(params, jnp.asarray(ids), config=config)["logits"])
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_gemma_kv_decode_matches_full_forward(ours, rng):
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


def test_gemma_init_params_matches_hf_conventions():
    """Random init honors the family: zero norm weights, no lm_head leaf."""
    config = ModelConfig.tiny(hidden_act="gelu_pytorch_tanh", norm_plus_one=True,
                              scale_embeddings=True, tie_word_embeddings=True)
    params = init_params(jax.random.PRNGKey(0), config)
    assert "lm_head" not in params
    assert float(jnp.abs(params["norm"]["weight"]).max()) == 0.0


def test_gemma_grasp_compression_end_to_end(ours, rng):
    """The engine compresses a Gemma model end-to-end: non-square o_proj
    (64 -> 48) factorizes, the tied head and (1+w) norms ride through."""
    config, params = ours
    batches = [{"input_ids": rng.integers(1, 120, (2, 16)),
                "labels": rng.integers(1, 120, (2, 16))} for _ in range(2)]
    eng = GraspEngine(jax.tree.map(jnp.array, params), config)
    summary = eng.run(batches, GraspConfig(num_prune_layers=1, compression_ratio=0.3))
    assert summary["rank_dict"]
    lid = summary["redundant_layers"][0]
    assert "in_kernel" in eng.params["layers"][lid]["self_attn"]["o_proj"]
    out = forward(eng.params, jnp.asarray(batches[0]["input_ids"]), config=config,
                  plan=eng.plan)["logits"]
    assert np.isfinite(np.asarray(out)).all()


def test_gemma_paged_serving_matches_generate(ours):
    """Continuous-batching decode on a Gemma model emits the same greedy
    stream as the plain KV-cache generate (embed scaling + GeGLU + (1+w)
    norms all live inside the paged step fn)."""
    from grasp_tpu.eval.generate import greedy_generate
    from grasp_tpu.serving.paged import ServingEngine

    config, params = ours
    prompt = np.asarray([3, 14, 15, 92, 65], dtype=np.int32)
    want = greedy_generate(params, config, prompt, 8)

    eng = ServingEngine(params, config, num_pages=32, page_size=8,
                        max_batch=2, max_pages_per_seq=4)
    rid = eng.submit(prompt, 8)
    outs = eng.run()
    assert list(outs[rid]) == list(want)


def test_raw_config_legacy_gelu_maps_to_tanh():
    """Original google/gemma config.json files carry hidden_act='gelu' and
    no hidden_activation — HF ignores the former and runs the tanh
    approximation; the raw-json import must do the same."""
    class _NS:
        model_type = "gemma"
        vocab_size = 64
        hidden_size = 32
        intermediate_size = 64
        num_hidden_layers = 2
        num_attention_heads = 4
        num_key_value_heads = 1
        head_dim = 8
        hidden_act = "gelu"  # legacy field, ignored by HF GemmaConfig

    config = config_from_hf(_NS())
    assert config.hidden_act == "gelu_pytorch_tanh"
