"""Paged KV cache + continuous batching (grasp_tpu/serving/paged.py).

Correctness gate: outputs match the dense-cache Generator token for token on
rank-heterogeneous (GRASP-compressed) plans, across mixed-length prompts,
request churn beyond max_batch, and eos stops; pages are recycled.
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


def _prompts(config, rng, lens):
    return [rng.integers(1, config.vocab_size, size=(n,)).astype(np.int32) for n in lens]


def test_paged_matches_dense_generator(compressed, rng):
    config, params, plan = compressed
    prompts = _prompts(config, rng, [5, 11, 17])
    max_new = 6

    gen = Generator(params, config, plan)
    want = [gen.greedy(p, max_new) for p in prompts]

    srv = ServingEngine(params, config, plan, num_pages=32, page_size=8,
                        max_batch=4, max_pages_per_seq=4)
    rids = [srv.submit(p, max_new) for p in prompts]
    got = srv.run()
    for rid, w in zip(rids, want):
        assert got[rid] == w, f"request {rid}: {got[rid]} != {w}"


def test_continuous_batching_beyond_max_batch(compressed, rng):
    """More requests than rows: later requests join as earlier ones retire;
    every output still matches the single-request path; pages recycle."""
    config, params, plan = compressed
    prompts = _prompts(config, rng, [4, 9, 6, 13, 3, 7])
    max_new = 5

    gen = Generator(params, config, plan)
    want = [gen.greedy(p, max_new) for p in prompts]

    srv = ServingEngine(params, config, plan, num_pages=16, page_size=8,
                        max_batch=2, max_pages_per_seq=4)
    rids = [srv.submit(p, max_new) for p in prompts]
    got = srv.run()
    assert len(got) == len(prompts)
    for rid, w in zip(rids, want):
        assert got[rid] == w
    assert srv.pool.free_pages == srv.pool.num_pages - 1  # all pages recycled


def test_eos_stops_early_and_frees_pages(compressed):
    config, params, plan = compressed
    # local rng: the session-scoped fixture's state depends on which tests ran
    # before, and this test's expectation depends on the exact token stream
    prompt = _prompts(config, np.random.default_rng(1234), [8])[0]
    gen = Generator(params, config, plan)
    full = gen.greedy(prompt, 8)
    eos = full[3]  # force a stop mid-stream
    stop_at = full.index(eos)  # serving stops at the FIRST occurrence

    srv = ServingEngine(params, config, plan, num_pages=16, page_size=8,
                        max_batch=2, max_pages_per_seq=4, eos_token_id=eos)
    rid = srv.submit(prompt, 8)
    got = srv.run()[rid]
    assert got == full[:stop_at]  # tokens before the stop; eos not emitted
    assert srv.pool.free_pages == srv.pool.num_pages - 1


def test_pool_exhaustion_raises_and_oversize_rejected(compressed):
    config, params, plan = compressed
    srv = ServingEngine(params, config, plan, num_pages=4, page_size=8,
                        max_batch=2, max_pages_per_seq=2)
    with pytest.raises(ValueError):
        srv.submit(np.arange(1, 30, dtype=np.int32), 8)  # needs > max_pages_per_seq
    with pytest.raises(MemoryError):
        srv.pool.alloc(99)


def test_paged_serving_moe_matches_dense_generator(rng):
    """Mixtral-family MoE model through the paged continuous-batching path."""
    config = ModelConfig.tiny(num_hidden_layers=2, num_local_experts=4)
    params = init_params(jax.random.PRNGKey(2), config)
    prompts = _prompts(config, rng, [5, 9])
    max_new = 4

    gen = Generator(params, config)
    want = [gen.greedy(p, max_new) for p in prompts]

    srv = ServingEngine(params, config, num_pages=32, page_size=8,
                        max_batch=2, max_pages_per_seq=4)
    rids = [srv.submit(p, max_new) for p in prompts]
    got = srv.run()
    for rid, w in zip(rids, want):
        assert got[rid] == w, f"request {rid}: {got[rid]} != {w}"


def test_paged_mixed_greedy_and_sampled_rows(compressed, rng):
    """Sampled rows don't perturb greedy rows batched alongside them; sampled
    rows are deterministic in their per-request seed."""
    config, params, plan = compressed
    g_prompt, s_prompt = _prompts(config, rng, [6, 9])
    want_greedy = Generator(params, config, plan).greedy(g_prompt, 5)

    def run_engine():
        srv = ServingEngine(params, config, plan, num_pages=32, page_size=8,
                            max_batch=2, max_pages_per_seq=4)
        rg = srv.submit(g_prompt, 5)  # greedy (default)
        rs = srv.submit(s_prompt, 5, temperature=1.3, top_k=8, seed=42)
        out = srv.run()
        return out[rg], out[rs]

    g1, s1 = run_engine()
    g2, s2 = run_engine()
    assert g1 == want_greedy == g2          # greedy row unaffected by sampling row
    assert s1 == s2                         # same seed -> same stream
    assert len(s1) == 5 and all(0 <= t < config.vocab_size for t in s1)


def test_paged_sampling_topk1_equals_greedy(compressed, rng):
    config, params, plan = compressed
    prompt = _prompts(config, rng, [7])[0]
    want = Generator(params, config, plan).greedy(prompt, 5)
    srv = ServingEngine(params, config, plan, num_pages=32, page_size=8,
                        max_batch=2, max_pages_per_seq=4)
    rid = srv.submit(prompt, 5, temperature=0.9, top_k=1, seed=3)
    assert srv.run()[rid] == want


def test_paged_sampling_seeds_vary(compressed, rng):
    config, params, plan = compressed
    prompt = _prompts(config, rng, [6])[0]
    outs = set()
    srv = ServingEngine(params, config, plan, num_pages=64, page_size=8,
                        max_batch=4, max_pages_per_seq=4)
    rids = [srv.submit(prompt, 8, temperature=2.0, seed=s) for s in range(4)]
    out = srv.run()
    outs = {tuple(out[r]) for r in rids}
    assert len(outs) > 1  # high temperature: different seeds diverge

    import pytest as _pytest
    with _pytest.raises(ValueError, match="top_k"):
        srv.submit(prompt, 2, temperature=1.0, top_k=1000)


def test_paged_quantized_kv_matches_quantized_generator(compressed, rng):
    """int8 page pool: outputs match the (quantized-kv) dense-cache Generator
    token for token; pool bytes ~halve."""
    config, params, plan = compressed
    prompts = _prompts(config, rng, [5, 11])
    max_new = 5

    gen = Generator(params, config, plan, quantized_kv=True)
    want = [gen.greedy(p, max_new) for p in prompts]

    srv = ServingEngine(params, config, plan, num_pages=32, page_size=8,
                        max_batch=2, max_pages_per_seq=4, quantized_kv=True)
    nbytes = lambda *xs: sum(x.size * x.dtype.itemsize for x in xs)
    dense_pool = ServingEngine(params, config, plan, num_pages=32, page_size=8).pool
    assert nbytes(srv.pool.k_pages, srv.pool.v_pages) < 0.6 * nbytes(
        dense_pool.k_pages, dense_pool.v_pages)

    rids = [srv.submit(p, max_new) for p in prompts]
    got = srv.run()
    for rid, w in zip(rids, want):
        assert got[rid] == w, f"request {rid}: {got[rid]} != {w}"


@pytest.mark.parametrize("bits", [8, 4])
def test_paged_quantized_weights_match_quantized_generator(compressed, rng, bits):
    """int8/int4 WEIGHTS through the paged engine (the 7B-on-one-chip serving
    configuration): outputs match the dense-cache Generator running the same
    quantized params token for token, on a rank-heterogeneous plan."""
    from grasp_tpu.ops.quant import quantize_model_weights

    config, params, plan = compressed
    qp = quantize_model_weights(params, bits=bits, group_size=16)
    prompts = _prompts(config, rng, [5, 11])
    max_new = 5

    gen = Generator(qp, config, plan)
    want = [gen.greedy(p, max_new) for p in prompts]

    srv = ServingEngine(qp, config, plan, num_pages=32, page_size=8,
                        max_batch=2, max_pages_per_seq=4)
    rids = [srv.submit(p, max_new) for p in prompts]
    got = srv.run()
    for rid, w in zip(rids, want):
        assert got[rid] == w, f"request {rid}: {got[rid]} != {w}"


def test_quantize_consume_releases_source_tree(compressed):
    """quantize_model_weights(consume=True) empties the source pytree (the
    7B memory-safety path) and produces leaves identical to the plain path."""
    import copy

    from grasp_tpu.ops.quant import quantize_model_weights

    config, params, plan = compressed
    want = quantize_model_weights(params, bits=8)
    src = copy.copy({**params, "layers": list(params["layers"])})
    got = quantize_model_weights(src, bits=8, consume=True)
    assert not src, "consume=True must clear the source dict"
    for a, b in zip(jax.tree.leaves(want), jax.tree.leaves(got)):
        assert a.dtype == b.dtype and bool((a == b).all())


@pytest.mark.skipif(
    not any(d.platform == "tpu" for d in jax.devices()), reason="needs a real TPU"
)
def test_paged_attention_kernel_on_tpu(rng):
    """On TPU the paged decode routes through jax's fused paged-attention
    Pallas kernel (no gathered KV copy); outputs must match the dense-cache
    Generator token for token, and the XLA-gather path (GRASP_PAGED_KERNEL=0
    builds it) must agree too."""
    import os

    config = ModelConfig.tiny(
        hidden_size=256, num_attention_heads=2, num_key_value_heads=1,
        num_hidden_layers=2,
    )
    params = init_params(jax.random.PRNGKey(0), config)
    prompts = _prompts(config, rng, [5, 11])
    max_new = 4

    gen = Generator(params, config)
    want = [gen.greedy(p, max_new) for p in prompts]

    srv = ServingEngine(params, config, num_pages=16, page_size=16,
                        max_batch=2, max_pages_per_seq=4)
    rids = [srv.submit(p, max_new) for p in prompts]
    got = srv.run()
    for rid, w in zip(rids, want):
        assert got[rid] == w, f"kernel path request {rid}: {got[rid]} != {w}"

    os.environ["GRASP_PAGED_KERNEL"] = "0"
    try:
        srv2 = ServingEngine(params, config, num_pages=16, page_size=16,
                             max_batch=2, max_pages_per_seq=4)
        rids2 = [srv2.submit(p, max_new) for p in prompts]
        got2 = srv2.run()
        for rid, w in zip(rids2, want):
            assert got2[rid] == w, f"gather path request {rid}: {got2[rid]} != {w}"
    finally:
        del os.environ["GRASP_PAGED_KERNEL"]


@pytest.mark.skipif(
    not any(d.platform == "tpu" for d in jax.devices()), reason="needs a real TPU"
)
def test_paged_attention_hd64_kernel_on_tpu(rng):
    """Sub-lane head dims (TinyLlama's hd=64) route through our own paged
    kernel (ops/pallas_paged64.py) — outputs must match the dense-cache
    Generator AND the gather path token for token."""
    import os

    config = ModelConfig.tiny(
        hidden_size=128, num_attention_heads=2, num_key_value_heads=2,
        num_hidden_layers=2,  # head_dim = 64
    )
    assert config.head_dim_ == 64
    params = init_params(jax.random.PRNGKey(5), config)
    prompts = _prompts(config, rng, [5, 11, 30])
    max_new = 4

    gen = Generator(params, config)
    want = [gen.greedy(p, max_new) for p in prompts]

    srv = ServingEngine(params, config, num_pages=24, page_size=16,
                        max_batch=3, max_pages_per_seq=4)
    rids = [srv.submit(p, max_new) for p in prompts]
    got = srv.run()
    for rid, w in zip(rids, want):
        assert got[rid] == w, f"hd64 kernel request {rid}: {got[rid]} != {w}"

    os.environ["GRASP_PAGED64_KERNEL"] = "0"
    try:
        srv2 = ServingEngine(params, config, num_pages=24, page_size=16,
                             max_batch=3, max_pages_per_seq=4)
        rids2 = [srv2.submit(p, max_new) for p in prompts]
        got2 = srv2.run()
        for rid, w in zip(rids2, want):
            assert got2[rid] == w, f"gather path request {rid}: {got2[rid]} != {w}"
    finally:
        del os.environ["GRASP_PAGED64_KERNEL"]


@pytest.mark.skipif(
    not any(d.platform == "tpu" for d in jax.devices()), reason="needs a real TPU"
)
def test_paged_attention_kernel_quantized_pool_on_tpu(rng):
    """int8 page pool through the kernel's QuantizedTensor input: matches the
    quantized-kv Generator token for token (scale conventions reconciled)."""
    config = ModelConfig.tiny(
        hidden_size=256, num_attention_heads=2, num_key_value_heads=1,
        num_hidden_layers=2,
    )
    params = init_params(jax.random.PRNGKey(3), config)
    prompts = _prompts(config, rng, [6, 10])
    max_new = 4

    gen = Generator(params, config, quantized_kv=True)
    want = [gen.greedy(p, max_new) for p in prompts]

    srv = ServingEngine(params, config, num_pages=16, page_size=16,
                        max_batch=2, max_pages_per_seq=4, quantized_kv=True)
    rids = [srv.submit(p, max_new) for p in prompts]
    got = srv.run()
    for rid, w in zip(rids, want):
        assert got[rid] == w, f"quantized kernel path request {rid}: {got[rid]} != {w}"


def test_paged64_chunk_matches_single_query(rng):
    """The chunked hd64 kernel (speculative verify) is row-wise bit-equal to
    C separate single-query calls at lengths base..base+C-1 — the property
    that makes greedy speculation emit the plain engine's exact stream.
    Interpret mode (runs on CPU); the TPU-gated serving test exercises the
    compiled kernel."""
    from grasp_tpu.ops.pallas_paged64 import (
        paged_attention_hd64,
        paged_attention_hd64_chunk,
    )

    b, nh, nkv, hd, ps, pages_per_seq, c_len = 2, 4, 2, 64, 8, 3, 3
    num_pages = b * pages_per_seq + 1
    t_max = pages_per_seq * ps
    k_pages = jnp.asarray(rng.standard_normal((nkv, num_pages, ps, hd)), jnp.float32)
    v_pages = jnp.asarray(rng.standard_normal((nkv, num_pages, ps, hd)), jnp.float32)
    tables = jnp.asarray(
        1 + np.arange(b * pages_per_seq).reshape(b, pages_per_seq), jnp.int32)
    q = jnp.asarray(rng.standard_normal((b, c_len, nh, hd)), jnp.float32)
    base = jnp.asarray([5, t_max - c_len], jnp.int32)  # incl. a page-crossing row

    got = paged_attention_hd64_chunk(q, k_pages, v_pages, base, tables,
                                     interpret=True)
    for c in range(c_len):
        want = paged_attention_hd64(q[:, c], k_pages, v_pages, base + c,
                                    tables, interpret=True)
        np.testing.assert_array_equal(
            np.asarray(got[:, c]), np.asarray(want), err_msg=f"chunk pos {c}")


def test_logprobs_and_cancel(compressed, rng):
    """logprobs=N never changes token choice; records are per emitted token;
    cancel() retires live requests (pages freed) and drops pending ones."""
    config, params, plan = compressed
    prompts = _prompts(config, rng, [5, 9])

    srv = ServingEngine(params, config, plan, num_pages=32, page_size=8,
                        max_batch=4, max_pages_per_seq=4)
    plain = [srv.submit(p, 5) for p in prompts]
    want = srv.run()

    srv2 = ServingEngine(params, config, plan, num_pages=32, page_size=8,
                         max_batch=4, max_pages_per_seq=4)
    rids = [srv2.submit(p, 5, logprobs=3) for p in prompts]
    reqs = {}
    while srv2.has_work():
        srv2.step()
        for r in srv2.collect_requests():
            reqs[r.rid] = r
    for rid, p_rid in zip(rids, plain):
        assert reqs[rid].out == want[p_rid]  # identical choice with logprobs
        assert len(reqs[rid].lp) == len(reqs[rid].out)
        for chosen, top_ids, top_lps in reqs[rid].lp:
            assert len(top_ids) == len(top_lps) == 3
            assert chosen <= 0.0
            # greedy row: chosen token is the top-1 alternative
            assert abs(chosen - top_lps[0]) < 1e-5

    import pytest as _pytest
    with _pytest.raises(ValueError):
        srv2.submit(prompts[0], 4, logprobs=99)

    # cancel: live request retires with a partial stream + frees its pages
    srv3 = ServingEngine(params, config, plan, num_pages=32, page_size=8,
                         max_batch=1, max_pages_per_seq=4)
    live = srv3.submit(prompts[0], 6)
    queued = srv3.submit(prompts[1], 6)  # waits for the single row
    for _ in range(3):
        srv3.step()
    assert srv3.cancel(live) and srv3.cancel(queued)
    assert not srv3.cancel(12345)
    done = {r.rid: r for r in srv3.collect_requests()}
    assert 0 < len(done[live].out) < 6 + 1
    assert done[live].out == want[plain[0]][: len(done[live].out)]
    assert done[queued].out == []
    srv3.step()  # no-op drain after cancels
    assert srv3.pool.free_pages == srv3.pool.num_pages - 1


def test_multiple_stop_tokens_and_finish_cause(compressed):
    """eos_token_id accepts a list (LLaMA-3 stops on eos AND eot); the
    retired request records why it finished."""
    config, params, plan = compressed
    prompt = _prompts(config, np.random.default_rng(77), [8])[0]
    gen = Generator(params, config, plan)
    full = gen.greedy(prompt, 8)
    stop_a, stop_b = full[4], full[2]  # full[2] hits first

    srv = ServingEngine(params, config, plan, num_pages=16, page_size=8,
                        max_batch=2, max_pages_per_seq=4,
                        eos_token_id=[stop_a, stop_b])
    rid = srv.submit(prompt, 8)
    while srv.has_work():
        srv.step()
    done = {r.rid: r for r in srv.collect_requests()}
    assert done[rid].out == full[:2]
    assert done[rid].finish == "eos"

    # length-limited request records "length"; cancelled records "cancel"
    srv = ServingEngine(params, config, plan, num_pages=16, page_size=8,
                        max_batch=2, max_pages_per_seq=4)
    r1 = srv.submit(prompt, 3)
    r2 = srv.submit(prompt, 8)
    srv.step()
    srv.cancel(r2)
    while srv.has_work():
        srv.step()
    done = {r.rid: r for r in srv.collect_requests()}
    assert done[r1].finish == "length"
    assert done[r2].finish == "cancel"


@pytest.mark.skipif(
    not any(d.platform == "tpu" for d in jax.devices()), reason="needs a real TPU"
)
def test_paged_attention_hd96_kernel_on_tpu(rng):
    """Phi-3's head_dim 96 also routes through the sub-lane paged kernel
    (ops/pallas_paged64.py gates on hd < 128) — probed 2026-08-19 on v5e:
    Mosaic accepts the 96-wide blocks and the stream matches the gather
    path and the dense Generator token for token."""
    import os

    config = ModelConfig.tiny(
        hidden_size=384, num_attention_heads=4, num_key_value_heads=4,
        num_hidden_layers=2, intermediate_size=512,  # head_dim = 96
    )
    assert config.head_dim_ == 96
    params = init_params(jax.random.PRNGKey(6), config)
    prompts = _prompts(config, rng, [6, 13])
    max_new = 4

    gen = Generator(params, config)
    want = [gen.greedy(p, max_new) for p in prompts]

    srv = ServingEngine(params, config, num_pages=24, page_size=16,
                        max_batch=2, max_pages_per_seq=4)
    rids = [srv.submit(p, max_new) for p in prompts]
    got = srv.run()
    for rid, w in zip(rids, want):
        assert got[rid] == w, f"hd96 kernel request {rid}: {got[rid]} != {w}"

    os.environ["GRASP_PAGED64_KERNEL"] = "0"
    try:
        srv2 = ServingEngine(params, config, num_pages=24, page_size=16,
                             max_batch=2, max_pages_per_seq=4)
        rids2 = [srv2.submit(p, max_new) for p in prompts]
        got2 = srv2.run()
        for rid, w in zip(rids2, want):
            assert got2[rid] == w
    finally:
        del os.environ["GRASP_PAGED64_KERNEL"]


def test_warmup_precompiles_and_serves(compressed, rng):
    """warmup() AOT-compiles decode/sampler/prefill/scatter for the buckets;
    requests afterwards hit the primed cache and outputs are unchanged."""
    config, params, plan = compressed
    srv = ServingEngine(params, config, plan, num_pages=32, page_size=8,
                        max_batch=2, max_pages_per_seq=4)
    dt = srv.warmup(prompt_lens=(8, 13))  # 13 rounds up to 16
    assert dt > 0
    assert "decode" in srv._primed
    assert ("prefill", 8, 8) in srv._primed
    assert ("prefill", 16, 16) in srv._primed
    assert ("scatter", 2, 16, 0) in srv._primed
    assert ("sampler", 1) in srv._primed and ("sampler", 2) in srv._primed

    prompt = _prompts(config, rng, [13])[0]
    want = Generator(params, config, plan).greedy(prompt, 4)
    rid = srv.submit(prompt, 4)
    assert srv.run()[rid] == want
    # oversized buckets clamp to table capacity instead of failing
    assert srv.warmup(prompt_lens=(10_000,)) >= 0
