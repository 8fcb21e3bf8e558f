"""Phi-3-family parity: our functional model vs HF torch Phi3ForCausalLM.

Phi-3 is LLaMA-shaped with MHA at head_dim 96 but FUSES q/k/v into one
qkv_proj and gate/up into gate_up_proj (HF modeling_phi3.py). Import splits
the fused weights by output rows — numerically exact — restoring the
per-projection structure GRASP compresses. The 128k variants add "longrope"
rope scaling (per-dim short/long rescale factors + an attention magnitude
factor), replicated from transformers' _compute_longrope_parameters and
pinned here against the executing HF model in BOTH regimes (short factors
at seq <= original ctx; long factors beyond it). The reference supports any
HF causal-LM checkpoint through the same loading path (grasp.py:54-58).
"""

import numpy as np
import pytest
import torch

torch.manual_seed(0)

import jax
import jax.numpy as jnp
from transformers import Phi3Config, Phi3ForCausalLM

from grasp_tpu.configs import GraspConfig, ModelConfig
from grasp_tpu.core.engine import GraspEngine
from grasp_tpu.models.hf_io import config_from_hf, params_from_state_dict
from grasp_tpu.models.llama import default_plan, forward, init_kv_cache, prefill

HF_CFG = dict(
    vocab_size=128,
    hidden_size=64,
    intermediate_size=176,
    num_hidden_layers=3,
    num_attention_heads=4,
    num_key_value_heads=4,  # Phi-3-mini is MHA
    max_position_embeddings=128,
    rms_norm_eps=1e-5,
    rope_theta=10000.0,
    tie_word_embeddings=False,
    pad_token_id=0,  # Phi3Config defaults to 32000, outside the tiny vocab
)


@pytest.fixture(scope="module")
def hf_model():
    return Phi3ForCausalLM(Phi3Config(**HF_CFG)).eval().float()


@pytest.fixture(scope="module")
def ours(hf_model):
    config = config_from_hf(hf_model.config)
    params = params_from_state_dict(hf_model.state_dict(), config)
    return config, jax.tree.map(jnp.asarray, params)


def test_phi3_fused_projections_split_exactly(hf_model, ours):
    """qkv_proj/gate_up_proj split into our per-projection kernels by rows."""
    config, params = ours
    hd = config.head_dim_
    nh = config.num_attention_heads
    qkv = hf_model.model.layers[0].self_attn.qkv_proj.weight.detach().numpy()
    np.testing.assert_array_equal(
        np.asarray(params["layers"][0]["self_attn"]["q_proj"]["kernel"]),
        qkv[: nh * hd].T)
    gu = hf_model.model.layers[0].mlp.gate_up_proj.weight.detach().numpy()
    half = gu.shape[0] // 2
    np.testing.assert_array_equal(
        np.asarray(params["layers"][0]["mlp"]["gate_proj"]["kernel"]), gu[:half].T)
    np.testing.assert_array_equal(
        np.asarray(params["layers"][0]["mlp"]["up_proj"]["kernel"]), gu[half:].T)


def test_phi3_logits_match_hf(hf_model, ours, rng):
    config, params = ours
    ids = rng.integers(1, 120, (2, 17))
    with torch.no_grad():
        want = hf_model(torch.tensor(ids)).logits.numpy()
    got = np.asarray(forward(params, jnp.asarray(ids), config=config)["logits"])
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_phi3_kv_decode_matches_full_forward(ours, rng):
    config, params = ours
    ids = rng.integers(1, 120, (1, 12))
    full = np.asarray(forward(params, jnp.asarray(ids), config=config)["logits"])
    cache = init_kv_cache(config, batch=1, max_len=32)
    logits, cache = prefill(params, jnp.asarray(ids), cache, config=config,
                            plan=default_plan(config))
    np.testing.assert_allclose(np.asarray(logits), full, atol=2e-4, rtol=2e-4)


def test_phi3_longrope_matches_hf_both_regimes(rng):
    """longrope: short factors at seq <= original ctx, long factors beyond,
    attention magnitude factor on cos/sin — pinned vs the executing HF model
    which switches by the same seq-len rule (@dynamic_rope_update)."""
    half = HF_CFG["hidden_size"] // HF_CFG["num_attention_heads"] // 2
    hf_rng = np.random.default_rng(3)
    scaling = {
        "type": "longrope",
        "short_factor": (1.0 + hf_rng.random(half)).tolist(),
        "long_factor": (2.0 + hf_rng.random(half)).tolist(),
    }
    cfg = Phi3Config(**{**HF_CFG, "max_position_embeddings": 256,
                        "original_max_position_embeddings": 32,
                        "rope_scaling": scaling})
    hf = Phi3ForCausalLM(cfg).eval().float()
    config = config_from_hf(hf.config)
    params = jax.tree.map(jnp.asarray, params_from_state_dict(hf.state_dict(), config))

    for s in (16, 48):  # short regime; long regime (> original 32)
        ids = rng.integers(1, 120, (1, s))
        with torch.no_grad():
            want = hf(torch.tensor(ids)).logits.numpy()
        got = np.asarray(forward(params, jnp.asarray(ids), config=config)["logits"])
        np.testing.assert_allclose(got, want, atol=3e-4, rtol=3e-4)


def test_phi3_compresses_and_serves(ours, rng):
    """End-to-end: GRASP compression runs on the split projections and the
    paged engine decodes the compressed plan identically to the dense
    Generator."""
    from grasp_tpu.eval.generate import Generator
    from grasp_tpu.serving import ServingEngine

    config, params = ours
    batches = [{
        "input_ids": jnp.asarray(rng.integers(1, 120, (1, 16))),
        "labels": jnp.asarray(rng.integers(1, 120, (1, 16))),
    }]
    eng = GraspEngine(params, config)
    summary = eng.run(batches, GraspConfig(num_prune_layers=1, compression_ratio=0.4))
    assert summary["rank_dict"]

    prompt = rng.integers(1, 120, size=(9,)).astype(np.int32)
    want = Generator(eng.params, config, eng.plan).greedy(prompt, 5)
    srv = ServingEngine(eng.params, config, eng.plan, num_pages=16, page_size=8,
                        max_batch=2, max_pages_per_seq=4)
    rid = srv.submit(prompt, 5)
    assert srv.run()[rid] == want
