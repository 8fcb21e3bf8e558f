"""Speculative paged serving (serving/spec_paged.py): outputs bit-identical
to the plain ServingEngine; draft==target accepts every draft; pages are
recycled through the shared allocator."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from grasp_tpu.configs import ModelConfig
from grasp_tpu.models import init_params
from grasp_tpu.serving.paged import ServingEngine
from grasp_tpu.serving.spec_paged import SpeculativeServingEngine


@pytest.fixture(scope="module")
def models():
    config = ModelConfig.tiny(num_hidden_layers=4, vocab_size=128)
    params = init_params(jax.random.PRNGKey(0), config)
    dconfig = ModelConfig.tiny(num_hidden_layers=2, vocab_size=128)
    dparams = init_params(jax.random.PRNGKey(7), dconfig)
    return config, params, dconfig, dparams


def _prompts(rng, n=5):
    return [rng.integers(1, 120, size=(int(l),)) for l in rng.integers(4, 40, n)]


def _run(engine, prompts, max_new):
    rids = [engine.submit(p, max_new) for p in prompts]
    outs = engine.run()
    return [outs[r] for r in rids]


def test_outputs_bit_identical_to_plain_engine(models, rng):
    config, params, dconfig, dparams = models
    prompts = _prompts(rng)

    plain = ServingEngine(params, config, num_pages=96, page_size=16,
                          max_batch=4, max_pages_per_seq=8)
    want = _run(plain, prompts, max_new=12)

    spec = SpeculativeServingEngine(
        params, config, dparams, dconfig, gamma=3,
        num_pages=96, page_size=16, max_batch=4, max_pages_per_seq=8,
    )
    got = _run(spec, prompts, max_new=12)

    for g, w in zip(got, want):
        assert g == w
    assert spec.last_stats["chunks"] > 0
    # a different draft still accepts sometimes or not — rate is in [0, 1]
    assert 0.0 <= spec.acceptance_rate <= 1.0


def test_draft_equals_target_accepts_everything(models, rng):
    config, params, _, _ = models
    prompts = _prompts(rng, n=3)
    spec = SpeculativeServingEngine(
        params, config, params, config, gamma=3,
        num_pages=128, page_size=16, max_batch=4, max_pages_per_seq=8,
    )
    plain = ServingEngine(params, config, num_pages=96, page_size=16,
                          max_batch=4, max_pages_per_seq=8)
    want = _run(plain, prompts, max_new=10)
    got = _run(spec, prompts, max_new=10)
    for g, w in zip(got, want):
        assert g == w
    assert spec.acceptance_rate == 1.0


def test_eos_and_page_recycling(models, rng):
    config, params, dconfig, dparams = models
    prompts = _prompts(rng, n=6)

    plain = ServingEngine(params, config, num_pages=96, page_size=16,
                          max_batch=2, max_pages_per_seq=8, eos_token_id=5)
    want = _run(plain, prompts, max_new=16)

    spec = SpeculativeServingEngine(
        params, config, dparams, dconfig, gamma=2,
        num_pages=96, page_size=16, max_batch=2, max_pages_per_seq=8,
        eos_token_id=5,
    )
    free0 = spec.pool.free_pages
    got = _run(spec, prompts, max_new=16)
    for g, w in zip(got, want):
        assert g == w
    assert spec.pool.free_pages == free0  # every page returned


def test_fused_draft_matches_unfused(models, rng):
    """_draft_multi_fn (one dispatch, fori_loop token feedback) is bit-equal
    to gamma+1 separate _paged_decode_fn calls with host argmax feedback —
    drafts AND final page contents."""
    from grasp_tpu.models.llama import default_plan
    from grasp_tpu.serving.paged import _paged_decode_fn
    from grasp_tpu.serving.spec_paged import _draft_multi_fn

    _, _, dconfig, dparams = models
    plan = default_plan(dconfig)
    gamma, b, pps, ps = 3, 2, 4, 16
    nkv, hd = dconfig.num_key_value_heads, dconfig.head_dim_
    num_pages = 1 + b * pps
    shape = (dconfig.num_hidden_layers, nkv, num_pages, ps, hd)
    k0 = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    v0 = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    tables = jnp.asarray(1 + np.arange(b * pps).reshape(b, pps), jnp.int32)
    tok0 = jnp.asarray(rng.integers(1, 120, b), jnp.int32)
    pos0 = jnp.asarray([5, 2 * ps - 1], jnp.int32)  # incl. page-boundary cross
    live = jnp.ones(b, jnp.int32)

    # unfused: fresh jit per call is wasteful but exact; copies because the
    # jitted decode donates its page buffers
    step = _paged_decode_fn(dconfig, plan, pps)
    kp, vp = jnp.array(k0), jnp.array(v0)
    tok = tok0
    want = np.zeros((b, gamma), np.int32)
    for i in range(gamma + 1):
        logits, kp, vp, _, _ = step(dparams, tok, kp, vp, None, None,
                                    tables, pos0 + i, live)
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        if i < gamma:
            want[:, i] = np.asarray(tok)

    fused = _draft_multi_fn(dconfig, plan, pps, gamma)
    drafts, kf, vf = fused(dparams, tok0, jnp.array(k0), jnp.array(v0),
                           None, None, tables, pos0, live)
    np.testing.assert_array_equal(np.asarray(drafts), want)
    np.testing.assert_array_equal(np.asarray(kf), np.asarray(kp))
    np.testing.assert_array_equal(np.asarray(vf), np.asarray(vp))


def test_sampled_requests_rejected(models):
    config, params, dconfig, dparams = models
    spec = SpeculativeServingEngine(
        params, config, dparams, dconfig,
        num_pages=32, page_size=16, max_batch=2, max_pages_per_seq=8,
    )
    with pytest.raises(NotImplementedError, match="greedy-only"):
        spec.submit(np.arange(4), 8, temperature=0.8)
