"""Gemma-2 parity: our functional model vs HF torch Gemma2ForCausalLM.

On top of Gemma-1's variants (GeGLU, (1+w) norms, scaled embeddings, tied
head), Gemma-2 adds — each pinned here against the executing HF model with
attn_implementation="eager" (HF's sdpa path silently skips softcapping):

  - sandwich norms: post_attention_layernorm normalizes the ATTENTION OUTPUT
    before the residual add, and pre/post_feedforward_layernorm wrap the MLP
    (4 norms per layer, HF Gemma2DecoderLayer);
  - attention logit softcapping c*tanh(scores/c) applied BEFORE the mask
    (HF eager_attention_forward order), and final logit softcapping;
  - attention scale query_pre_attn_scalar**-0.5 instead of head_dim**-0.5;
  - per-layer window alternation via layer_types ("sliding_attention" /
    "full_attention") — ModelConfig.layer_window.

Scan stacking keys on the per-layer window, so alternating layers never
stack into one group with the wrong mask. The Generator KV-decode path and
the paged/speculative serving engines support all of these (the fused paged
kernels cannot softcap, so Gemma-2 takes the gather path, and page
recycling stays off — full-attention layers read every slot);
pipeline/sequence parallelism reject them with clear errors.
"""

import numpy as np
import pytest
import torch

torch.manual_seed(0)

import jax
import jax.numpy as jnp
from transformers import Gemma2Config, Gemma2ForCausalLM

from grasp_tpu.configs import GraspConfig, ModelConfig
from grasp_tpu.core.engine import GraspEngine
from grasp_tpu.models.hf_io import config_from_hf, params_from_state_dict
from grasp_tpu.models.llama import decode_step, default_plan, forward, init_kv_cache, prefill

HF_CFG = dict(
    vocab_size=128,
    hidden_size=48,
    intermediate_size=144,
    num_hidden_layers=4,        # alternation: sliding, full, sliding, full
    num_attention_heads=4,
    num_key_value_heads=2,
    head_dim=16,
    max_position_embeddings=128,
    rms_norm_eps=1e-6,
    rope_theta=10000.0,
    hidden_activation="gelu_pytorch_tanh",
    sliding_window=4,           # << seq so the sliding layers diverge from full
    query_pre_attn_scalar=32,   # != head_dim so the scale override is material
    attn_logit_softcapping=0.2,  # small cap: random-init scores are ~O(0.1),
    #                              so tanh actually bends them (materiality)
    final_logit_softcapping=3.0,
    attn_implementation="eager",
)


@pytest.fixture(scope="module")
def hf_model():
    return Gemma2ForCausalLM(Gemma2Config(**HF_CFG)).eval().float()


@pytest.fixture(scope="module")
def ours(hf_model):
    config = config_from_hf(hf_model.config)
    params = params_from_state_dict(hf_model.state_dict(), config)
    return config, jax.tree.map(jnp.asarray, params)


def test_gemma2_config_and_structure(hf_model, ours):
    config, params = ours
    assert config.sandwich_norms and config.attn_logit_softcapping == 0.2
    assert config.layer_types[:2] == ("sliding_attention", "full_attention")
    assert config.layer_window(0) == 4 and config.layer_window(1) is None
    lp = params["layers"][0]
    assert "pre_feedforward_layernorm" in lp and "post_feedforward_layernorm" in lp
    w = np.asarray(lp["post_feedforward_layernorm"]["weight"])
    want = hf_model.model.layers[0].post_feedforward_layernorm.weight.detach().numpy()
    np.testing.assert_array_equal(w, want)


def test_gemma2_logits_match_hf(hf_model, ours, rng):
    config, params = ours
    ids = rng.integers(1, 120, (2, 17))
    with torch.no_grad():
        want = hf_model(torch.tensor(ids)).logits.numpy()
    got = np.asarray(forward(params, jnp.asarray(ids), config=config)["logits"])
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_gemma2_variants_are_material(hf_model, ours, rng):
    """Each Gemma-2 departure changes the output — dropping softcapping or
    the per-layer windows would fail the parity test above."""
    import dataclasses

    config, params = ours
    ids = jnp.asarray(rng.integers(1, 120, (1, 15)))
    ref = np.asarray(forward(params, ids, config=config)["logits"])
    for strip in (
        {"final_logit_softcapping": None},
        {"query_pre_attn_scalar": None},
        {"layer_types": None, "sliding_window": None},
    ):
        out = np.asarray(forward(
            params, ids, config=dataclasses.replace(config, **strip))["logits"])
        assert np.abs(out - ref).max() > 1e-3, strip


def test_attn_softcap_matches_hf_eager(rng):
    """Random-init model scores are too small for the cap to bend (model-
    level parity can't see it), so pin the primitive: _attention with
    softcap equals HF's eager_attention_forward at score magnitudes where
    tanh saturates, and differs materially from the uncapped result."""
    from types import SimpleNamespace

    from transformers.models.gemma2.modeling_gemma2 import eager_attention_forward

    from grasp_tpu.models.llama import _attention

    q = rng.normal(size=(1, 4, 6, 16)).astype(np.float32) * 3
    k = rng.normal(size=(1, 4, 8, 16)).astype(np.float32) * 3
    v = rng.normal(size=(1, 4, 8, 16)).astype(np.float32)
    mask = np.where(rng.random((1, 1, 6, 8)) < 0.3,
                    np.finfo(np.float32).min, 0.0).astype(np.float32)
    mod = SimpleNamespace(num_key_value_groups=1, head_dim=16, training=False)
    want, _ = eager_attention_forward(
        mod, torch.tensor(q), torch.tensor(k), torch.tensor(v),
        torch.tensor(mask), scaling=0.25, softcap=2.0)
    got = np.asarray(_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                                jnp.asarray(mask), 1, scale=0.25, softcap=2.0))
    # HF returns [B, S, H, hd]; ours is [B, H, S, hd]
    np.testing.assert_allclose(got.transpose(0, 2, 1, 3), want.numpy(),
                               atol=2e-5, rtol=2e-5)
    uncapped = np.asarray(_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                                     jnp.asarray(mask), 1, scale=0.25))
    assert np.abs(got - uncapped).max() > 1e-2  # the cap bends these scores


def test_gemma2_kv_decode_matches_full_forward(ours, rng):
    config, params = ours
    ids = rng.integers(1, 120, (1, 13))
    full = np.asarray(forward(params, jnp.asarray(ids), config=config)["logits"])
    cache = init_kv_cache(config, batch=1, max_len=32)
    logits, cache = prefill(params, jnp.asarray(ids[:, :6]), cache, config=config,
                            plan=default_plan(config))
    np.testing.assert_allclose(np.asarray(logits), full[:, :6], atol=2e-4, rtol=2e-4)
    for i in range(6, 13):
        step, cache = decode_step(params, jnp.asarray(ids[:, i : i + 1]), cache, i,
                                  config=config, plan=default_plan(config))
        np.testing.assert_allclose(np.asarray(step[:, 0]), full[:, i], atol=3e-4, rtol=3e-4)


def test_gemma2_grasp_compression_end_to_end(ours, rng):
    config, params = ours
    batches = [{"input_ids": rng.integers(1, 120, (2, 16)),
                "labels": rng.integers(1, 120, (2, 16))} for _ in range(2)]
    eng = GraspEngine(jax.tree.map(jnp.array, params), config)
    summary = eng.run(batches, GraspConfig(num_prune_layers=1, compression_ratio=0.3))
    assert summary["rank_dict"]
    out = forward(eng.params, jnp.asarray(batches[0]["input_ids"]), config=config,
                  plan=eng.plan)["logits"]
    assert np.isfinite(np.asarray(out)).all()


def test_gemma2_paged_serving_matches_generate(ours):
    """Continuous batching on Gemma-2: per-layer window masks, softcapped
    scores (pre-mask), sandwich norms and the capped lm head all live in the
    paged decode body — the greedy stream matches the plain KV decode."""
    from grasp_tpu.eval.generate import greedy_generate
    from grasp_tpu.serving.paged import ServingEngine

    config, params = ours
    r = np.random.default_rng(11)
    prompts = [r.integers(1, 120, size=(n,)).astype(np.int32) for n in (9, 5)]
    want = [greedy_generate(params, config, p, 8) for p in prompts]

    eng = ServingEngine(params, config, num_pages=32, page_size=4,
                        max_batch=2, max_pages_per_seq=8)
    assert eng._window_recycle is None  # full-attention layers read every slot
    rids = [eng.submit(p, 8) for p in prompts]
    outs = eng.run()
    for rid, w in zip(rids, want):
        assert list(outs[rid]) == list(w)


def test_gemma2_speculative_bit_identical(ours):
    """Gemma-2 target+draft through the speculative engine: the multi-token
    verify applies the same per-layer masks/softcaps as the plain decode."""
    from grasp_tpu.models.llama import init_params as _init
    from grasp_tpu.serving.paged import ServingEngine
    from grasp_tpu.serving.spec_paged import SpeculativeServingEngine
    import dataclasses

    config, params = ours
    dconfig = dataclasses.replace(config, num_hidden_layers=2,
                                  layer_types=config.layer_types[:2])
    dparams = _init(jax.random.PRNGKey(9), dconfig)
    r = np.random.default_rng(13)
    prompts = [r.integers(1, 120, size=(n,)).astype(np.int32) for n in (10, 6)]

    plain = ServingEngine(params, config, num_pages=64, page_size=4,
                          max_batch=2, max_pages_per_seq=8)
    rids = [plain.submit(p, 8) for p in prompts]
    pouts = plain.run()
    want = [pouts[rid] for rid in rids]

    spec = SpeculativeServingEngine(params, config, dparams, dconfig, gamma=2,
                                    num_pages=96, page_size=4, max_batch=2,
                                    max_pages_per_seq=8)
    rids = [spec.submit(p, 8) for p in prompts]
    outs = spec.run()
    for rid, w in zip(rids, want):
        assert list(outs[rid]) == list(w)


def test_raw_config_without_layer_types_gets_alternation(hf_model):
    """Original gemma-2 config.json files lack layer_types (transformers
    synthesizes it); the raw-json import must synthesize the same
    even-layers-sliding alternation — otherwise the 4096 window would
    silently apply to the full-attention layers too."""
    class _NS:
        model_type = "gemma2"
        vocab_size = 64
        hidden_size = 32
        intermediate_size = 64
        num_hidden_layers = 4
        num_attention_heads = 4
        num_key_value_heads = 2
        head_dim = 8
        sliding_window = 4096
        query_pre_attn_scalar = 8
        attn_logit_softcapping = 50.0
        final_logit_softcapping = 30.0

    config = config_from_hf(_NS())
    assert config.layer_types == ("sliding_attention", "full_attention") * 2
    # matches what transformers synthesizes for the same architecture
    want = tuple(Gemma2Config(num_hidden_layers=4).layer_types)
    assert config.layer_types == want
