"""Penalties / min_p / logit_bias / guided decoding in the SPECULATIVE paged
engine (serving/spec_paged.py) — closing the serving feature matrix: the
fastest engine serves the same constrained/penalized requests the plain one
does, with the same guarantees (greedy bit-identity to the penalized plain
engine; sampled rows distributed exactly as penalized target-only sampling).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from grasp_tpu.configs import ModelConfig
from grasp_tpu.data.tokenizer import ByteTokenizer
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


@pytest.fixture(scope="module")
def byte_models():
    # vocab 300 so ByteTokenizer (bytes 0-255 + bos/eos/pad) fits — guided
    # decoding needs a tokenizer with byte-level token decompositions
    config = ModelConfig.tiny(num_hidden_layers=3, vocab_size=300)
    params = init_params(jax.random.PRNGKey(1), config)
    dconfig = ModelConfig.tiny(num_hidden_layers=2, vocab_size=300)
    dparams = init_params(jax.random.PRNGKey(8), dconfig)
    return config, params, dconfig, dparams


def _prompts(rng, n=4):
    return [rng.integers(1, 120, size=(int(l),)) for l in rng.integers(4, 30, n)]


def _run(engine, prompts, max_new, kws):
    rids = [engine.submit(p, max_new, **kw) for p, kw in zip(prompts, kws)]
    outs = engine.run()
    return [outs[r] for r in rids]


PEN = dict(repetition_penalty=1.7, presence_penalty=0.6, frequency_penalty=0.3,
           logit_bias={3: 4.0, 9: -6.0})


def test_penalized_greedy_bit_identical_to_plain(models, rng):
    """Greedy + every penalty knob: the speculative stream equals the
    penalized plain engine's token for token (the verify side replays the
    plain sampler's exact adjustments along the draft path)."""
    config, params, dconfig, dparams = models
    prompts = _prompts(rng)
    kws = [PEN] * len(prompts)

    plain = ServingEngine(params, config, num_pages=96, page_size=16,
                          max_batch=4, max_pages_per_seq=8)
    want = _run(plain, prompts, 12, kws)

    spec = SpeculativeServingEngine(
        params, config, dparams, dconfig, gamma=3,
        num_pages=96, page_size=16, max_batch=4, max_pages_per_seq=8)
    got = _run(spec, prompts, 12, kws)
    assert got == want
    assert spec.last_stats["chunks"] > 0


def test_penalized_mixed_batch_plain_rows_unperturbed(models, rng):
    """Plain greedy rows sharing a macro-step with penalized rows keep the
    exact unpenalized stream (identity settings are fp-exact no-ops)."""
    config, params, dconfig, dparams = models
    prompts = _prompts(rng, n=4)
    kws = [PEN, {}, dict(repetition_penalty=2.5), {}]

    plain = ServingEngine(params, config, num_pages=96, page_size=16,
                          max_batch=4, max_pages_per_seq=8)
    want = _run(plain, prompts, 10, kws)

    spec = SpeculativeServingEngine(
        params, config, dparams, dconfig, gamma=3,
        num_pages=96, page_size=16, max_batch=4, max_pages_per_seq=8)
    got = _run(spec, prompts, 10, kws)
    assert got == want


def test_min_p_one_reduces_spec_sampling_to_greedy(models, rng):
    """min_p=1.0 keeps only the argmax: a sampled speculative request must
    emit the plain engine's GREEDY stream (sharp exactness check of the
    min_p threading through draft + verify)."""
    config, params, dconfig, dparams = models
    prompts = _prompts(rng, n=3)

    plain = ServingEngine(params, config, num_pages=96, page_size=16,
                          max_batch=4, max_pages_per_seq=8)
    want = _run(plain, prompts, 10, [{}] * 3)

    spec = SpeculativeServingEngine(
        params, config, dparams, dconfig, gamma=3,
        num_pages=96, page_size=16, max_batch=4, max_pages_per_seq=8)
    got = _run(spec, prompts, 10,
               [dict(temperature=1.3, min_p=1.0, seed=s) for s in range(3)])
    assert got == want


def test_penalized_sampled_deterministic_in_seed(models, rng):
    config, params, dconfig, dparams = models
    prompts = _prompts(rng, n=3)
    kws = [dict(temperature=0.9, top_k=8, seed=11, **PEN) for _ in prompts]

    def once():
        spec = SpeculativeServingEngine(
            params, config, dparams, dconfig, gamma=3,
            num_pages=96, page_size=16, max_batch=4, max_pages_per_seq=8)
        return _run(spec, prompts, 10, kws)

    assert once() == once()


def test_penalized_sampled_matches_exact_target_distribution(models):
    """Leviathan + penalties: the empirical distribution of the first two
    sampled tokens matches the exact PENALIZED target chain (adjustments
    recomputed from first principles on the host), TV < 0.15 at N=400."""
    from grasp_tpu.eval.generate import filter_logits
    from grasp_tpu.models.llama import default_plan, forward

    config, params, dconfig, dparams = models
    prompt = np.asarray([3, 17, 42, 9], np.int32)
    temp, top_k, rep, pres, freq = 1.3, 4, 1.6, 0.4, 0.2
    max_new, n_req = 2, 400

    def exact_dist(ids):
        logits = np.asarray(forward(
            params, jnp.asarray(ids)[None, :], config=config,
            plan=default_plan(config))["logits"][0, len(ids) - 1], np.float32)
        counts = np.bincount(ids, minlength=config.vocab_size)
        l = logits.astype(np.float64)
        seen = counts > 0
        pen = np.where(l < 0, l * rep, l / rep)
        l = np.where(seen, pen, l)
        l = l - counts * freq - seen * pres
        filt = filter_logits(jnp.asarray(l / temp, jnp.float32)[None, :],
                             top_k, 1.0)[0]
        return np.asarray(jax.nn.softmax(filt), np.float64)

    p1 = exact_dist(prompt)
    joint = {}
    for t1 in np.where(p1 > 0)[0]:
        p2 = exact_dist(np.concatenate([prompt, [t1]]))
        for t2 in np.where(p2 > 0)[0]:
            joint[(int(t1), int(t2))] = p1[t1] * p2[t2]

    spec = SpeculativeServingEngine(
        params, config, dparams, dconfig, gamma=3,
        num_pages=256, page_size=16, max_batch=8, max_pages_per_seq=4)
    rids = {}
    for s in range(n_req):
        rids[spec.submit(prompt, max_new, temperature=temp, top_k=top_k,
                         seed=s, repetition_penalty=rep, presence_penalty=pres,
                         frequency_penalty=freq)] = s
    outs = spec.run()
    counts = {}
    for r in rids:
        t = tuple(outs[r])
        assert len(t) == max_new
        counts[t] = counts.get(t, 0) + 1

    tv = 0.5 * sum(abs(counts.get(k, 0) / n_req - v) for k, v in joint.items())
    tv += 0.5 * sum(c / n_req for k, c in counts.items() if k not in joint)
    assert tv < 0.15, f"TV={tv:.3f} vs exact penalized target chain"
    assert all(k in joint for k in counts)


# ---------------------------------------------------------------------------
# guided decoding over speculation
# ---------------------------------------------------------------------------

def _spec_byte(byte_models, **kw):
    config, params, dconfig, dparams = byte_models
    kw.setdefault("num_pages", 64)
    kw.setdefault("page_size", 8)
    kw.setdefault("max_batch", 3)
    kw.setdefault("max_pages_per_seq", 8)
    kw.setdefault("tokenizer", ByteTokenizer(config.vocab_size))
    kw.setdefault("eos_token_id", 257)
    return SpeculativeServingEngine(params, config, dparams, dconfig,
                                    gamma=3, **kw)


def _plain_byte(byte_models, **kw):
    config, params, _, _ = byte_models
    kw.setdefault("num_pages", 64)
    kw.setdefault("page_size", 8)
    kw.setdefault("max_batch", 3)
    kw.setdefault("max_pages_per_seq", 8)
    kw.setdefault("tokenizer", ByteTokenizer(config.vocab_size))
    kw.setdefault("eos_token_id", 257)
    return ServingEngine(params, config, **kw)


def test_guided_spec_greedy_identical_and_fullmatch(byte_models, rng):
    """Bounded pattern (grammar forces eos within max_new): spec output is
    bit-identical to the guided plain engine and fully matches."""
    import re

    pattern = r"[ab]{3}[0-9]"  # exactly 4 bytes, then only eos is allowed
    prompts = [rng.integers(1, 250, size=(6,)) for _ in range(3)]
    kws = [dict(guided_regex=pattern)] * 3

    want = _run(_plain_byte(byte_models), prompts, 16, kws)
    got = _run(_spec_byte(byte_models), prompts, 16, kws)
    assert got == want
    tok = ByteTokenizer(300)
    for out in got:
        assert re.fullmatch(pattern, tok.decode(out))


def test_guided_spec_multiple_grammars_one_batch(byte_models, rng):
    """Two different grammars + a plain row share a macro-step via the
    block-diagonal union table; outputs match the plain engine row for row."""
    import re

    pats = [r"[0-9]{2}", r"(yes|no)", None]
    prompts = [rng.integers(1, 250, size=(5,)) for _ in range(3)]
    kws = [dict(guided_regex=p) if p else {} for p in pats]

    want = _run(_plain_byte(byte_models), prompts, 12, kws)
    got = _run(_spec_byte(byte_models), prompts, 12, kws)
    assert got == want
    tok = ByteTokenizer(300)
    for out, p in zip(got, pats):
        if p is not None:
            assert re.fullmatch(p, tok.decode(out))


def test_guided_spec_prefix_valid_when_length_capped(byte_models, rng):
    spec = _spec_byte(byte_models)
    rid = spec.submit(rng.integers(1, 250, size=(4,)), 4,
                      guided_regex=r"[0-9]{10}")
    out = spec.run()[rid]
    assert len(out) == 4
    assert all(48 <= t <= 57 for t in out)  # digits: a valid prefix


def test_guided_spec_sampled_fullmatch(byte_models, rng):
    import re

    pattern = r"x[01]{2}y"  # bounded: forces eos within max_new
    spec = _spec_byte(byte_models)
    rids = [spec.submit(rng.integers(1, 250, size=(4,)), 16, temperature=1.1,
                        top_k=6, seed=s, guided_regex=pattern)
            for s in range(3)]
    outs = spec.run()
    tok = ByteTokenizer(300)
    for r in rids:
        assert re.fullmatch(pattern, tok.decode(outs[r])), outs[r]
