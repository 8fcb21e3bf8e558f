"""Per-module compression-ratio overrides + greedy_until adapter tests."""

import numpy as np

import jax
import jax.numpy as jnp

from grasp_tpu.configs import GraspConfig, ModelConfig
from grasp_tpu.core.engine import GraspEngine, module_name
from grasp_tpu.data.tokenizer import ByteTokenizer
from grasp_tpu.eval.harness import EvalLM
from grasp_tpu.models.llama import init_params
from grasp_tpu.ops.saliency import preserve_rank


def _batches(rng, vocab):
    return [{
        "input_ids": jnp.asarray(rng.integers(0, vocab, (2, 16))),
        "labels": jnp.asarray(rng.integers(0, vocab, (2, 16))),
    }]


def test_module_ratio_override(rng):
    """Reference honors per-module compression_ratio attrs
    (modeling_grasp.py:399-400); our engine takes a module_ratios dict."""
    config = ModelConfig.tiny(num_hidden_layers=3)
    engine = GraspEngine(init_params(jax.random.PRNGKey(0), config), config)
    engine.compute_bi(1, _batches(rng, config.vocab_size))
    lid = engine.redundant_layers[0]
    target = module_name(lid, "up_proj")
    engine.module_ratios[target] = 0.8  # much stronger compression on one module

    engine.run(_batches(rng, config.vocab_size),
               GraspConfig(layers_id=[lid], compression_ratio=0.3))
    d, f = config.hidden_size, config.intermediate_size
    assert engine.rank_dict[target] == preserve_rank(d, f, 0.8)
    assert engine.rank_dict[module_name(lid, "gate_proj")] == preserve_rank(d, f, 0.3)


def test_module_ratio_override_svd_mode(rng):
    config = ModelConfig.tiny(num_hidden_layers=3)
    engine = GraspEngine(init_params(jax.random.PRNGKey(0), config), config)
    target = module_name(1, "down_proj")
    engine.module_ratios[target] = 0.7
    engine.run(_batches(rng, config.vocab_size),
               GraspConfig(layers_id=[1], compression_ratio=0.3, grad_mode="svd"))
    f, d = config.intermediate_size, config.hidden_size
    assert engine.rank_dict[target] == preserve_rank(f, d, 0.7)


def test_greedy_until(rng):
    config = ModelConfig.tiny(num_hidden_layers=2, vocab_size=260)
    params = init_params(jax.random.PRNGKey(0), config)
    tok = ByteTokenizer(vocab_size=config.vocab_size)
    lm = EvalLM(params, config, tok)
    outs = lm.greedy_until([("Once upon a time", ["\n"]), ("Q: 2+2?\nA:", ["\n", "Q:"])])
    assert len(outs) == 2
    for o in outs:
        assert isinstance(o, str)
        assert "\n" not in o  # stop strings applied
