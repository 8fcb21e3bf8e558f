"""Sampling controls: presence/frequency/repetition penalties, logit_bias,
min_p (serving/paged.py + eval/generate.topk_topp_filter).

Math is pinned golden against the executing transformers logits processors
(RepetitionPenaltyLogitsProcessor, MinPLogitsWarper); engine behavior is
pinned by exact properties (bias forces/bans tokens, min_p=1 reduces sampling
to greedy, huge repetition penalty forbids repeats) and by bit-identity of
unpenalized rows batched next to penalized ones. Beyond-reference serving
extension (the reference decodes greedily everywhere).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from grasp_tpu.configs import GraspConfig, ModelConfig
from grasp_tpu.core.engine import GraspEngine
from grasp_tpu.models import init_params
from grasp_tpu.serving import ServingEngine
from grasp_tpu.serving.paged import apply_penalties

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
    kw.setdefault("max_pages_per_seq", 6)
    return ServingEngine(params, config, plan, **kw)


def _prompt(config, rng, n):
    return rng.integers(1, config.vocab_size, size=(n,)).astype(np.int32)


# ---------------------------------------------------------------------------
# math golden vs the executing transformers processors
# ---------------------------------------------------------------------------

def test_repetition_penalty_matches_hf():
    import torch
    from transformers.generation.logits_process import (
        RepetitionPenaltyLogitsProcessor,
    )

    rng = np.random.default_rng(0)
    logits = rng.normal(size=(2, 50)).astype(np.float32) * 5
    ids = rng.integers(0, 50, size=(2, 12))
    for p in (1.3, 0.7, 2.0):
        want = RepetitionPenaltyLogitsProcessor(p)(
            torch.tensor(ids), torch.tensor(logits)).numpy()
        counts = np.zeros((2, 50), np.int32)
        for b in range(2):
            counts[b] = np.bincount(ids[b], minlength=50)
        got = apply_penalties(
            jnp.asarray(logits), jnp.asarray(counts), jnp.zeros((2, 50)),
            jnp.zeros(2), jnp.zeros(2), jnp.full(2, p, jnp.float32))
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)


def test_min_p_matches_hf():
    import torch
    from transformers.generation.logits_process import MinPLogitsWarper

    from grasp_tpu.eval.generate import topk_topp_filter

    rng = np.random.default_rng(1)
    logits = rng.normal(size=(3, 40)).astype(np.float32) * 3
    for mp in (0.05, 0.2, 0.9):
        want = MinPLogitsWarper(min_p=mp)(
            None, torch.tensor(logits)).numpy()
        got = np.asarray(topk_topp_filter(
            jnp.asarray(logits), jnp.zeros(3, jnp.int32), jnp.ones(3),
            max_k=1, min_ps=jnp.full(3, mp, jnp.float32)))
        # both mark dropped tokens with their filler value; compare masks
        # and surviving values
        np.testing.assert_array_equal(got <= -1e30, want <= -1e30)
        keep = want > -1e30
        np.testing.assert_allclose(got[keep], want[keep], rtol=1e-6)


def test_presence_frequency_formula():
    """OpenAI: logit -= presence * [count > 0] + frequency * count."""
    rng = np.random.default_rng(2)
    logits = rng.normal(size=(1, 20)).astype(np.float32)
    counts = rng.integers(0, 4, size=(1, 20)).astype(np.int32)
    pres, freq = 0.6, 0.3
    got = np.asarray(apply_penalties(
        jnp.asarray(logits), jnp.asarray(counts), jnp.zeros((1, 20)),
        jnp.full(1, pres), jnp.full(1, freq), jnp.ones(1)))
    want = logits - pres * (counts > 0) - freq * counts
    np.testing.assert_allclose(got, want, rtol=1e-6)


# ---------------------------------------------------------------------------
# engine-level properties
# ---------------------------------------------------------------------------

def test_logit_bias_forces_and_bans(compressed, rng):
    config, params, plan = compressed
    prompt = _prompt(config, rng, 6)

    srv = _engine(compressed)
    _rid = srv.submit(prompt, 4)
    plain = srv.run()[_rid]

    # +100 on one token dominates the tiny model's logits: every pick is it
    forced = 7
    srv = _engine(compressed)
    _rid = srv.submit(prompt, 4, logit_bias={forced: 100.0})
    out = srv.run()[_rid]
    assert out == [forced] * 4

    # -100 bans the plain stream's first pick
    srv = _engine(compressed)
    _rid = srv.submit(prompt, 4, logit_bias={plain[0]: -100.0})
    out = srv.run()[_rid]
    assert out[0] != plain[0]


def test_min_p_one_reduces_sampling_to_greedy(compressed, rng):
    """min_p=1 keeps only the top token, so any seeded sampled stream equals
    the greedy stream — an exact identity across the whole filter stack."""
    config, params, plan = compressed
    prompt = _prompt(config, rng, 9)
    srv = _engine(compressed)
    _rid = srv.submit(prompt, 6)
    greedy = srv.run()[_rid]
    srv = _engine(compressed)
    _rid = srv.submit(prompt, 6, temperature=1.3, seed=5,
                                   min_p=1.0)
    sampled = srv.run()[_rid]
    assert sampled == greedy


def test_huge_repetition_penalty_forbids_repeats(compressed, rng):
    config, params, plan = compressed
    prompt = _prompt(config, rng, 5)
    srv = _engine(compressed)
    _rid = srv.submit(prompt, 8, repetition_penalty=1e9)
    out = srv.run()[_rid]
    assert len(out) == 8
    assert len(set(out)) == len(out), f"repeated token in {out}"
    assert not (set(out) & set(prompt.tolist())), "prompt token repeated"


def test_frequency_penalty_diversifies_greedy(compressed, rng):
    config, params, plan = compressed
    prompt = _prompt(config, rng, 5)
    srv = _engine(compressed)
    _rid = srv.submit(prompt, 10)
    plain = srv.run()[_rid]
    srv = _engine(compressed)
    _rid = srv.submit(prompt, 10, frequency_penalty=2.0,
                               presence_penalty=2.0)
    pen = srv.run()[_rid]
    assert len(set(pen)) >= len(set(plain))


def test_plain_rows_unaffected_by_penalized_batchmates(compressed, rng):
    """A penalized row in the batch routes EVERY row through the penalized
    sampler; identity settings must be fp-exact no-ops for the plain row."""
    config, params, plan = compressed
    p1 = _prompt(config, rng, 7)
    p2 = _prompt(config, rng, 11)

    solo = _engine(compressed)
    r = solo.submit(p1, 6, temperature=0.9, top_k=8, seed=3)
    want = solo.run()[r]

    srv = _engine(compressed)
    r1 = srv.submit(p1, 6, temperature=0.9, top_k=8, seed=3)
    r2 = srv.submit(p2, 6, repetition_penalty=1.7, presence_penalty=1.0,
                    min_p=0.1, temperature=0.8, seed=9)
    got = srv.run()
    assert got[r1] == want


def test_validation_and_spec_rejection(compressed):
    config, params, plan = compressed
    srv = _engine(compressed)
    with pytest.raises(ValueError, match="presence_penalty"):
        srv.submit([1, 2], 2, presence_penalty=3.0)
    with pytest.raises(ValueError, match="repetition_penalty"):
        srv.submit([1, 2], 2, repetition_penalty=0.0)
    with pytest.raises(ValueError, match="min_p"):
        srv.submit([1, 2], 2, min_p=1.5)
    with pytest.raises(ValueError, match="out of vocab"):
        srv.submit([1, 2], 2, logit_bias={config.vocab_size: 1.0})
    with pytest.raises(ValueError, match="not in \\[-100, 100\\]"):
        srv.submit([1, 2], 2, logit_bias={1: 200.0})

    from grasp_tpu.serving.spec_paged import SpeculativeServingEngine

    spec = SpeculativeServingEngine(params, config, params, config, plan=plan,
                                    draft_plan=plan, num_pages=32, page_size=PS,
                                    max_batch=2, max_pages_per_seq=6)
    # the speculative engine VALIDATES like the plain one (penalties are
    # supported there since r4 — tests/test_spec_penalties.py pins parity)
    with pytest.raises(ValueError, match="repetition_penalty"):
        spec.submit([1, 2], 2, repetition_penalty=0.0)
    with pytest.raises(ValueError, match="logprobs"):
        spec.submit([1, 2], 2, logprobs=2)


def test_penalties_with_logprobs_report_raw(compressed, rng):
    """logprobs report the MODEL's distribution even when penalties change
    the pick (documented plain-sampler semantics)."""
    config, params, plan = compressed
    prompt = _prompt(config, rng, 6)
    srv = _engine(compressed)
    rid = srv.submit(prompt, 3, logprobs=4, repetition_penalty=1e9)
    while srv.has_work():  # run() would drain the request objects
        srv.step()
    reqs = {r.rid: r for r in srv.collect_requests()}
    r = reqs[rid]
    assert len(r.lp) == 3
    for (chosen_lp, top_ids, top_lps), tok in zip(r.lp, r.out):
        assert len(top_ids) == 4 and np.isfinite(chosen_lp)
        # raw distribution: top-1 of the report may well differ from the
        # penalized pick; the chosen token's raw lp must be consistent if
        # present in the top list
        if tok in top_ids:
            assert abs(top_lps[top_ids.index(tok)] - chosen_lp) < 1e-5


def test_stale_bias_does_not_leak_to_next_row_tenant(compressed, rng):
    """A biased request retires; a PLAIN request reuses its row while a
    penalized request keeps the whole batch on the penalized sampler — the
    plain row must not inherit the previous tenant's bias buffer."""
    config, params, plan = compressed
    p_bias = _prompt(config, rng, 5)
    p_pen = _prompt(config, rng, 6)
    p_plain = _prompt(config, rng, 7)

    solo = _engine(compressed)
    _r = solo.submit(p_plain, 6)
    want = solo.run()[_r]

    srv = _engine(compressed)  # max_batch=2
    forced = 7
    r_bias = srv.submit(p_bias, 2, logit_bias={forced: 100.0})   # row 0
    r_pen = srv.submit(p_pen, 14, presence_penalty=0.5)          # row 1
    r_plain = srv.submit(p_plain, 6)                             # reuses row 0
    got = srv.run()
    assert got[r_bias] == [forced, forced]
    assert got[r_plain] == want, "stale logit_bias leaked into the reused row"
