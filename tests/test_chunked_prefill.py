"""Chunked prefill admission (serving/paged.py, prefill_chunk=...).

A long prompt admits `prefill_chunk` tokens per engine step instead of all at
once, so live rows keep decoding while it prefills (no head-of-line
blocking). Correctness gate: outputs are bit-identical to whole-prompt
admission and the dense Generator; interleaving is asserted by stepping the
engine by hand. Beyond-reference serving extension.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from grasp_tpu.configs import GraspConfig, ModelConfig
from grasp_tpu.core.engine import GraspEngine
from grasp_tpu.eval.generate import Generator
from grasp_tpu.models import init_params
from grasp_tpu.serving import ServingEngine

PS = 8


@pytest.fixture(scope="module")
def compressed():
    config = ModelConfig.tiny(num_hidden_layers=3)
    engine = GraspEngine(init_params(jax.random.PRNGKey(0), config), config)
    rng = np.random.default_rng(7)
    batches = [{
        "input_ids": jnp.asarray(rng.integers(0, config.vocab_size, (1, 16))),
        "labels": jnp.asarray(rng.integers(0, config.vocab_size, (1, 16))),
    }]
    engine.run(batches, GraspConfig(num_prune_layers=1, compression_ratio=0.4))
    return config, engine.params, engine.plan


def _engine(compressed, **kw):
    config, params, plan = compressed
    kw.setdefault("num_pages", 32)
    kw.setdefault("page_size", PS)
    kw.setdefault("max_batch", 2)
    kw.setdefault("max_pages_per_seq", 8)
    return ServingEngine(params, config, plan, **kw)


def _prompt(config, rng, n):
    return rng.integers(1, config.vocab_size, size=(n,)).astype(np.int32)


def test_chunked_identity_mixed_lengths(compressed, rng):
    """Chunked admission emits the exact Generator stream across mixed
    prompt lengths (partial pages, chunk boundaries, churn past max_batch)."""
    config, params, plan = compressed
    prompts = [_prompt(config, rng, n) for n in (4, 19, 33, 8, 26)]
    gen = Generator(params, config, plan)
    want = [gen.greedy(p, 5) for p in prompts]

    srv = _engine(compressed, prefill_chunk=2 * PS)
    rids = [srv.submit(p, 5) for p in prompts]
    got = srv.run()
    for rid, w in zip(rids, want):
        assert got[rid] == w
    assert srv.pool.free_pages == srv.pool.num_pages - 1  # all recycled


def test_decode_proceeds_during_long_admission(compressed, rng):
    """While a 5-page prompt admits one page per step, the already-live row
    must emit a token every step — the admission never stalls it."""
    config, params, plan = compressed
    short = _prompt(config, rng, 4)
    long = _prompt(config, rng, 5 * PS - 2)
    gen = Generator(params, config, plan)

    srv = _engine(compressed, prefill_chunk=PS)
    r_short = srv.submit(short, 8)
    srv.step()  # short admits (1 chunk: 1-page prompt) and seeds its stream
    r_long = srv.submit(long, 4)

    for _ in range(4):  # long needs 5 chunk steps; watch short meanwhile
        srv.step()
        assert any(a.req.rid == r_long for a in srv._admitting.values()), \
            "long prompt should still be admitting"
    before = [r for r in srv._live if r is not None and r.rid == r_short]
    assert before and len(before[0].out) >= 4  # short decoded every step

    got = srv.run()
    assert got[r_short] == gen.greedy(short, 8)
    assert got[r_long] == gen.greedy(long, 4)


def test_chunked_with_prefix_cache(compressed, rng):
    """A prefix hit skips whole chunks: admission of a repeated prompt takes
    fewer steps and still matches."""
    config, params, plan = compressed
    prompt = _prompt(config, rng, 4 * PS + 3)
    gen = Generator(params, config, plan)
    want = gen.greedy(prompt, 4)

    srv = _engine(compressed, prefill_chunk=PS, prefix_cache=True)
    r1 = srv.submit(prompt, 4)
    steps_cold = 0
    while any(a.req.rid == r1 for a in srv._admitting.values()) or not srv._live[0]:
        srv.step()
        steps_cold += 1
        if steps_cold > 20:
            break
    got1 = srv.run()
    assert got1[r1] == want

    r2 = srv.submit(prompt, 4)
    srv.step()  # prefix covers 4 full pages; the 1-page tail is one chunk
    assert not srv._admitting, "hit admission should finish in one step"
    got2 = srv.run()
    assert got2[r2] == want
    assert srv.prefix_tokens_saved == 4 * PS


def test_cancel_mid_admission_frees_pages(compressed, rng):
    config, params, plan = compressed
    long = _prompt(config, rng, 5 * PS)
    srv = _engine(compressed, prefill_chunk=PS)
    rid = srv.submit(long, 4)
    srv.step()  # first chunk only
    assert srv._admitting
    assert srv.cancel(rid)
    assert not srv._admitting
    assert srv.pool.free_pages == srv.pool.num_pages - 1
    done = srv.collect()
    assert done[rid] == []


def test_bad_chunk_size_rejected(compressed):
    with pytest.raises(ValueError, match="prefill_chunk"):
        _engine(compressed, prefill_chunk=PS + 1)
    from grasp_tpu.serving.spec_paged import SpeculativeServingEngine

    config, params, plan = compressed
    with pytest.raises(ValueError, match="prefill_chunk"):
        SpeculativeServingEngine(params, config, params, config, plan=plan,
                                 draft_plan=plan, prefill_chunk=PS)


def test_chunked_sampled_and_quantized(compressed, rng):
    """Chunked admission composes with int8 KV pools and seeded sampling."""
    config, params, plan = compressed
    prompt = _prompt(config, rng, 3 * PS + 1)
    kw = dict(temperature=0.7, top_k=8, seed=42)

    plain = _engine(compressed, quantized_kv=True)
    r = plain.submit(prompt, 5, **kw)
    want = plain.run()[r]

    srv = _engine(compressed, prefill_chunk=PS, quantized_kv=True)
    r2 = srv.submit(prompt, 5, **kw)
    assert srv.run()[r2] == want
