"""Speculative greedy decoding (grasp_tpu/serving/speculative.py).

Hard correctness gate: the emitted stream is bit-identical to target-only
greedy decoding (Generator), for every draft — speculation may only change
wall-clock. Draft == target must fully accept every chunk. Beyond-reference
serving extension (the reference's only generator is HF ``model.generate``,
tools/eval_longbench.py:337-353).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from grasp_tpu.configs import GraspConfig, ModelConfig
from grasp_tpu.core.engine import GraspEngine
from grasp_tpu.eval.generate import Generator
from grasp_tpu.models import init_params
from grasp_tpu.serving import SpeculativeGenerator


@pytest.fixture(scope="module")
def target():
    config = ModelConfig.tiny(num_hidden_layers=3)
    params = init_params(jax.random.PRNGKey(0), config)
    return config, params


@pytest.fixture(scope="module")
def draft(target):
    """GRASP-compressed draft of the same checkpoint (the intended pairing)."""
    config, params = target
    engine = GraspEngine(jax.tree.map(jnp.array, params), config)
    rng = np.random.default_rng(3)
    batches = [{
        "input_ids": jnp.asarray(rng.integers(1, config.vocab_size, (1, 16))),
        "labels": jnp.asarray(rng.integers(1, config.vocab_size, (1, 16))),
    }]
    engine.run(batches, GraspConfig(num_prune_layers=1, compression_ratio=0.5))
    return config, engine.params, engine.plan


def test_spec_matches_vanilla_greedy(target, draft, rng):
    tconfig, tparams = target
    dconfig, dparams, dplan = draft
    prompt = rng.integers(1, tconfig.vocab_size, size=(9,)).astype(np.int32)
    max_new = 12

    want = Generator(tparams, tconfig).greedy(prompt, max_new)
    spec = SpeculativeGenerator(tparams, tconfig, dparams, dconfig,
                                draft_plan=dplan, gamma=3)
    got = spec.greedy(prompt, max_new)
    assert got == want, (got, want)
    assert spec.last_stats["tokens"] == len(want)


def test_spec_draft_equals_target_accepts_everything(target, rng):
    """Identical draft ⇒ every draft token accepted, chunks = ceil(n/(g+1))."""
    tconfig, tparams = target
    prompt = rng.integers(1, tconfig.vocab_size, size=(6,)).astype(np.int32)
    max_new = 10
    gamma = 4

    want = Generator(tparams, tconfig).greedy(prompt, max_new)
    spec = SpeculativeGenerator(tparams, tconfig, tparams, tconfig, gamma=gamma)
    got = spec.greedy(prompt, max_new)
    assert got == want
    st = spec.last_stats
    assert st["acceptance_rate"] == 1.0, st
    # each chunk emits gamma+1 tokens (prefill emits the first separately)
    assert st["chunks"] == -(-(max_new - 1) // (gamma + 1)), st


def test_spec_adversarial_draft_still_exact(target, rng):
    """A garbage draft (random weights) must not corrupt the output stream."""
    tconfig, tparams = target
    bad_config = ModelConfig.tiny(num_hidden_layers=2)
    bad_params = init_params(jax.random.PRNGKey(99), bad_config)
    prompt = rng.integers(1, tconfig.vocab_size, size=(5,)).astype(np.int32)
    max_new = 8

    want = Generator(tparams, tconfig).greedy(prompt, max_new)
    spec = SpeculativeGenerator(tparams, tconfig, bad_params, bad_config, gamma=2)
    got = spec.greedy(prompt, max_new)
    assert got == want, (got, want)


def test_spec_eos_parity(target, draft, rng):
    """Stop-token handling matches the Generator for every eos choice."""
    tconfig, tparams = target
    dconfig, dparams, dplan = draft
    prompt = rng.integers(1, tconfig.vocab_size, size=(7,)).astype(np.int32)
    max_new = 10

    gen = Generator(tparams, tconfig)
    spec = SpeculativeGenerator(tparams, tconfig, dparams, dconfig,
                                draft_plan=dplan, gamma=3)
    base = gen.greedy(prompt, max_new)
    # use tokens that actually occur (plus one that doesn't) as eos
    for eos in {base[0], base[len(base) // 2], base[-1], -7}:
        want = gen.greedy(prompt, max_new, eos_token_id=eos)
        got = spec.greedy(prompt, max_new, eos_token_id=eos)
        assert got == want, (eos, got, want)


def test_spec_vocab_mismatch_rejected(target):
    tconfig, tparams = target
    other = ModelConfig.tiny(num_hidden_layers=1, vocab_size=tconfig.vocab_size + 8)
    oparams = init_params(jax.random.PRNGKey(1), other)
    with pytest.raises(ValueError, match="vocab"):
        SpeculativeGenerator(tparams, tconfig, oparams, other)


def test_spec_with_quantized_kv_matches_quantized_generator(target, draft, rng):
    """int8 KV in both caches: still bit-identical to the (quantized-kv)
    target-only stream — per-position quantization is chunking-invariant."""
    tconfig, tparams = target
    dconfig, dparams, dplan = draft
    prompt = rng.integers(1, tconfig.vocab_size, size=(8,)).astype(np.int32)
    want = Generator(tparams, tconfig, quantized_kv=True).greedy(prompt, 10)
    spec = SpeculativeGenerator(tparams, tconfig, dparams, dconfig,
                                draft_plan=dplan, gamma=3, quantized_kv=True)
    got = spec.greedy(prompt, 10)
    assert got == want, (got, want)


# ---------------------------------------------------------------------------
# speculative SAMPLING (Leviathan rejection scheme)
# ---------------------------------------------------------------------------


def test_speculative_accept_emits_exact_target_marginal():
    """Monte-Carlo: over draft sampling + accept/resample, the first emitted
    token's marginal equals the target distribution p_0 exactly — the core
    guarantee of speculative sampling."""
    from grasp_tpu.serving.speculative import speculative_accept

    V, gamma, N = 4, 2, 20000
    q = jnp.asarray([[0.7, 0.1, 0.1, 0.1], [0.25, 0.25, 0.25, 0.25]])
    p = jnp.asarray([
        [0.1, 0.2, 0.3, 0.4],
        [0.4, 0.3, 0.2, 0.1],
        [0.25, 0.25, 0.4, 0.1],
    ])

    def one(key):
        kd, ka = jax.random.split(key)
        drafts = jax.vmap(
            lambda k, row: jax.random.categorical(k, jnp.log(row))
        )(jax.random.split(kd, gamma), q).astype(jnp.int32)
        a, corr = speculative_accept(ka, drafts, q, p)
        return jnp.where(a >= 1, drafts[0], corr)

    toks = jax.vmap(one)(jax.random.split(jax.random.PRNGKey(0), N))
    emp = np.bincount(np.asarray(toks), minlength=V) / N
    tv = 0.5 * np.abs(emp - np.asarray(p[0])).sum()
    assert tv < 0.02, (emp, np.asarray(p[0]), tv)


def test_spec_sample_temperature_zero_is_greedy(target, draft, rng):
    tconfig, tparams = target
    dconfig, dparams, dplan = draft
    prompt = rng.integers(1, tconfig.vocab_size, size=(7,)).astype(np.int32)
    spec = SpeculativeGenerator(tparams, tconfig, dparams, dconfig,
                                draft_plan=dplan, gamma=3)
    assert spec.sample(prompt, 8, temperature=0.0) == spec.greedy(prompt, 8)


def test_spec_sample_identical_draft_accepts_all(target, rng):
    """p == q at every position => every draft accepted."""
    tconfig, tparams = target
    prompt = rng.integers(1, tconfig.vocab_size, size=(6,)).astype(np.int32)
    spec = SpeculativeGenerator(tparams, tconfig, tparams, tconfig, gamma=3)
    out = spec.sample(prompt, 9, temperature=1.2, seed=5)
    assert len(out) == 9
    assert spec.last_stats["acceptance_rate"] == 1.0, spec.last_stats


def test_spec_sample_deterministic_and_within_target_support(target, draft, rng):
    """Same seed -> same stream; with top_k=2 every emitted token lies in the
    TARGET's top-2 given the prefix (the draft cannot leak tokens outside the
    target's filtered support)."""
    from grasp_tpu.models import forward

    tconfig, tparams = target
    dconfig, dparams, dplan = draft
    prompt = rng.integers(1, tconfig.vocab_size, size=(6,)).astype(np.int32)
    spec = SpeculativeGenerator(tparams, tconfig, dparams, dconfig,
                                draft_plan=dplan, gamma=2)
    a = spec.sample(prompt, 6, temperature=1.5, top_k=2, seed=11)
    b = spec.sample(prompt, 6, temperature=1.5, top_k=2, seed=11)
    assert a == b
    seq = list(prompt)
    for t in a:
        logits = forward(tparams, jnp.asarray([seq]), config=tconfig)["logits"][0, -1]
        top2 = set(np.asarray(jax.lax.top_k(logits, 2)[1]).tolist())
        assert t in top2, (t, top2)
        seq.append(t)
