"""Sliding-window attention (Mistral): parity vs HF and path consistency.

HF MistralModel masks each query to its trailing `sliding_window` keys
(inclusive of itself) unconditionally; Qwen2 carries a window in its config
but gates it off with use_sliding_window=False. The window threads through
the full forward, the KV-cache decode, and the paged serving visibility
masks (the fused paged kernels attend to [0, pos] and are bypassed for
windowed models).
"""

import numpy as np
import pytest
import torch

torch.manual_seed(0)

import jax
import jax.numpy as jnp
from transformers import MistralConfig, MistralForCausalLM

from grasp_tpu.configs import ModelConfig
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
    hidden_size=64,
    intermediate_size=176,
    num_hidden_layers=3,
    num_attention_heads=4,
    num_key_value_heads=2,
    max_position_embeddings=128,
    rms_norm_eps=1e-5,
    rope_theta=10000.0,
    sliding_window=4,  # << seq so the window actually bites
    tie_word_embeddings=False,
)


@pytest.fixture(scope="module")
def hf_model():
    return MistralForCausalLM(MistralConfig(**HF_CFG)).eval().float()


@pytest.fixture(scope="module")
def ours(hf_model):
    config = config_from_hf(hf_model.config)
    params = params_from_state_dict(hf_model.state_dict(), config)
    return config, jax.tree.map(jnp.asarray, params)


def test_window_imported_and_material(hf_model, ours, rng):
    """The window imports, and ignoring it would NOT reproduce HF."""
    config, params = ours
    assert config.sliding_window == 4
    ids = rng.integers(1, 120, (1, 12))
    with torch.no_grad():
        want = hf_model(torch.tensor(ids)).logits.numpy()
    nowin = np.asarray(forward(
        params, jnp.asarray(ids),
        config=ModelConfig(**{**config.__dict__, "sliding_window": None}),
    )["logits"])
    assert np.abs(nowin - want).max() > 1e-3  # the window matters at seq 12


def test_sliding_logits_match_hf(hf_model, ours, rng):
    config, params = ours
    ids = rng.integers(1, 120, (2, 17))
    with torch.no_grad():
        want = hf_model(torch.tensor(ids)).logits.numpy()
    got = np.asarray(forward(params, jnp.asarray(ids), config=config)["logits"])
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_sliding_kv_decode_matches_full_forward(ours, rng):
    config, params = ours
    ids = rng.integers(1, 120, (1, 14))
    full = np.asarray(forward(params, jnp.asarray(ids), config=config)["logits"])

    cache = init_kv_cache(config, batch=1, max_len=32)
    logits, cache = prefill(params, jnp.asarray(ids[:, :6]), cache, config=config,
                            plan=default_plan(config))
    np.testing.assert_allclose(np.asarray(logits), full[:, :6], atol=2e-4, rtol=2e-4)
    for i in range(6, 14):
        step, cache = decode_step(params, jnp.asarray(ids[:, i : i + 1]), cache, i,
                                  config=config, plan=default_plan(config))
        np.testing.assert_allclose(np.asarray(step[:, 0]), full[:, i], atol=3e-4, rtol=3e-4)


def test_sliding_paged_serving_matches_generate(ours):
    """Continuous batching emits the same greedy stream as the plain decode:
    the paged visibility mask applies the same window the dense cache does
    (long prompt + enough new tokens that old slots fall out of the window)."""
    from grasp_tpu.eval.generate import greedy_generate
    from grasp_tpu.serving.paged import ServingEngine

    config, params = ours
    r = np.random.default_rng(3)
    prompts = [r.integers(1, 120, size=(n,)).astype(np.int32) for n in (9, 5)]
    want = [greedy_generate(params, config, p, 8) for p in prompts]

    eng = ServingEngine(params, config, num_pages=32, page_size=4,
                        max_batch=2, max_pages_per_seq=8)
    rids = [eng.submit(p, 8) for p in prompts]
    outs = eng.run()
    for rid, w in zip(rids, want):
        assert list(outs[rid]) == list(w)


def test_qwen2_style_gated_window_imports_as_none():
    class _NS:
        model_type = "qwen2"
        vocab_size = 64
        hidden_size = 32
        intermediate_size = 64
        num_hidden_layers = 2
        num_attention_heads = 4
        num_key_value_heads = 2
        sliding_window = 4096
        use_sliding_window = False

    assert config_from_hf(_NS()).sliding_window is None


def test_seq_parallel_windowed_matches_forward(ours, rng):
    """Ring attention applies the window blockwise from absolute positions:
    the sharded forward equals the single-device windowed forward."""
    from jax.sharding import Mesh
    from grasp_tpu.parallel.seq_parallel import seq_parallel_logits

    config, params = ours  # sliding_window = 4 << 64-token sequence
    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("data",))
    ids = jnp.asarray(rng.integers(1, 120, (2, 64)))
    ref = np.asarray(forward(params, ids, config=config)["logits"])
    got = np.asarray(seq_parallel_logits(params, ids, mesh, config))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


def test_sliding_speculative_bit_identical(ours):
    """Windowed target+draft through the speculative paged engine: the
    multi-token verify applies the same windowed visibility as the plain
    decode, so greedy streams match token for token."""
    from grasp_tpu.models.llama import init_params as _init
    from grasp_tpu.serving.paged import ServingEngine
    from grasp_tpu.serving.spec_paged import SpeculativeServingEngine

    config, params = ours
    dconfig = ModelConfig(**{**config.__dict__, "num_hidden_layers": 1})
    dparams = _init(jax.random.PRNGKey(7), dconfig)
    r = np.random.default_rng(5)
    prompts = [r.integers(1, 120, size=(n,)).astype(np.int32) for n in (11, 6)]

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


def test_window_page_recycling_bounds_live_pages(ours):
    """Rolling-buffer analogue: physical pages every future query is masked
    from return to the pool mid-flight, so a windowed row's live pages stay
    ~window/page_size + 1 regardless of generated length — and the stream
    still matches the plain decode exactly."""
    from grasp_tpu.eval.generate import greedy_generate
    from grasp_tpu.serving.paged import ServingEngine

    config, params = ours  # sliding_window = 4
    prompt = np.asarray([5, 9, 2, 33, 7, 11, 4], dtype=np.int32)
    max_new = 24
    want = greedy_generate(params, config, prompt, max_new)

    eng = ServingEngine(params, config, num_pages=24, page_size=2,
                        max_batch=1, max_pages_per_seq=16)
    rid = eng.submit(prompt, max_new)
    min_free, max_live = 99, 0
    while eng.has_work():
        eng.step()
        r = eng._live[0]
        if r is not None:
            max_live = max(max_live, sum(1 for p in r.pages if p > 0))
            min_free = min(min_free, eng.pool.free_pages)
    outs = eng.collect()
    assert list(outs[rid]) == list(want)
    # lazy alloc + recycling: peak live pages = the prompt's 4; steady
    # state oscillates 2-3 (window 4 / page_size 2) — far below the 16
    # logical pages the request spans end to end
    assert max_live <= 4
    # every recycled page really returned: all 15 allocatable pages free
    assert eng.pool.free_pages == 23


def test_spec_recycling_disabled_on_mismatched_windows(ours):
    """A windowless draft reads every slot, so shared pages must never be
    recycled out from under it."""
    from grasp_tpu.models.llama import init_params as _init
    from grasp_tpu.serving.spec_paged import SpeculativeServingEngine

    config, params = ours
    dconfig = ModelConfig(**{**config.__dict__, "num_hidden_layers": 1,
                             "sliding_window": None})
    dparams = _init(jax.random.PRNGKey(7), dconfig)
    spec = SpeculativeServingEngine(params, config, dparams, dconfig, gamma=2,
                                    num_pages=32, page_size=4, max_batch=2,
                                    max_pages_per_seq=8)
    assert spec._window_recycle is None


def test_window_lazy_alloc_stalls_and_resumes(ours):
    """A windowed row whose next page cannot be allocated stalls (no emit,
    no advance) and resumes when pages free — the stream is unchanged."""
    from grasp_tpu.eval.generate import greedy_generate
    from grasp_tpu.serving.paged import ServingEngine

    config, params = ours
    prompt = np.asarray([5, 9, 2, 33, 7, 11], dtype=np.int32)  # 3 prompt pages
    want = greedy_generate(params, config, prompt, 10)

    eng = ServingEngine(params, config, num_pages=24, page_size=2,
                        max_batch=1, max_pages_per_seq=16)
    rid = eng.submit(prompt, 10)
    eng.step()  # admit + decode (writes slot 6 into the prompt's last page)
    eng.step()  # pos -> 8: the NEXT step must allocate a fresh page
    hog = eng.pool.alloc(eng.pool.free_pages)  # drain the pool
    r = eng._live[0]
    pos_before, out_before = r.pos, len(r.out)
    for _ in range(3):
        eng.step()  # slot 8 needs a new page -> stalls
    assert (r.pos, len(r.out)) == (pos_before, out_before)  # truly stalled
    eng.pool.free(hog)
    outs = eng.run()
    assert list(outs[rid]) == list(want)


def test_windowed_pool_never_overcommits(ours):
    """Admission reserves each lazy row's peak page demand: a pool that fits
    only one row's peak serializes the rows instead of admitting both and
    livelocking when they exhaust the pool in lockstep."""
    from grasp_tpu.serving.paged import ServingEngine

    config, params = ours  # w=4
    r = np.random.default_rng(7)
    prompts = [r.integers(1, 120, size=(4,)).astype(np.int32) for _ in range(2)]
    # ps=2: peak = 2 prompt pages + band (2+2) = 6; pool of 9 pages (8
    # usable) fits one peak, not two
    eng = ServingEngine(params, config, num_pages=9, page_size=2,
                        max_batch=2, max_pages_per_seq=16)
    rids = [eng.submit(p, 20) for p in prompts]
    outs = eng.run()  # must terminate (old code could livelock all-stalled)
    assert all(len(outs[rid]) == 20 for rid in rids)
    assert eng._reserved_pages == 0 and eng.pool.free_pages == 8


def test_windowed_submit_accepts_beyond_pool_length(ours):
    """A windowed request longer than the pool is servable via the rolling
    buffer: the submit guard uses the bounded peak, not prompt+max_new."""
    from grasp_tpu.serving.paged import ServingEngine

    config, params = ours
    eng = ServingEngine(params, config, num_pages=10, page_size=2,
                        max_batch=1, max_pages_per_seq=64)
    # full need = (4 + 100)/2 = 52 pages >> 9 usable; peak = 2 + 4 = 6
    rid = eng.submit(np.asarray([1, 2, 3, 4], np.int32), 100)
    outs = eng.run()
    assert len(outs[rid]) == 100


def test_stall_does_not_perturb_sampled_stream(ours):
    """A stalled step must not advance a sampled row's PRNG stream: the
    same seeded request produces the same tokens with and without a
    transient page shortage."""
    from grasp_tpu.serving.paged import ServingEngine

    config, params = ours
    prompt = np.asarray([5, 9, 2, 33, 7, 11], dtype=np.int32)

    def run(stall):
        eng = ServingEngine(params, config, num_pages=24, page_size=2,
                            max_batch=1, max_pages_per_seq=16)
        rid = eng.submit(prompt, 10, temperature=0.9, top_k=16, seed=123)
        eng.step(); eng.step()  # next step needs a fresh page
        hog = eng.pool.alloc(eng.pool.free_pages) if stall else []
        if stall:
            for _ in range(2):
                eng.step()  # stalled: no emit, no PRNG advance
            eng.pool.free(hog)
        outs = eng.run()
        return outs[rid]

    assert list(run(stall=False)) == list(run(stall=True))
