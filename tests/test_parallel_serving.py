"""Multi-chip (tensor-parallel) SERVING coverage on the virtual 8-CPU mesh.

The reference serves single-GPU only; production TPU serving shards the model
over ICI. These tests pin that the whole serving surface — KV-cache greedy
decode, paged continuous batching, speculative decoding, int8/int4 quantized
weights — produces token-identical outputs when the params are TP-sharded via
parallel.mesh.shard_params (GSPMD inserts the collectives).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from grasp_tpu.configs import GraspConfig, ModelConfig
from grasp_tpu.core.engine import GraspEngine
from grasp_tpu.eval.generate import Generator
from grasp_tpu.models import init_params
from grasp_tpu.parallel.mesh import make_mesh, shard_params
from grasp_tpu.serving import ServingEngine, SpeculativeGenerator

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs >= 4 (virtual) devices"
)


@pytest.fixture(scope="module")
def setup():
    config = ModelConfig.tiny(num_hidden_layers=3)
    params = init_params(jax.random.PRNGKey(0), config)
    engine = GraspEngine(jax.tree.map(jnp.array, params), config)
    rng = np.random.default_rng(11)
    batches = [{
        "input_ids": jnp.asarray(rng.integers(1, config.vocab_size, (1, 16))),
        "labels": jnp.asarray(rng.integers(1, config.vocab_size, (1, 16))),
    }]
    engine.run(batches, GraspConfig(num_prune_layers=1, compression_ratio=0.4))
    mesh = make_mesh((1, 4), devices=jax.devices()[:4])
    return config, params, engine, mesh


def test_tp_sharded_greedy_decode_matches(setup, rng):
    config, params, engine, mesh = setup
    sharded = shard_params(engine.params, mesh, config)
    prompt = rng.integers(1, config.vocab_size, size=(9,)).astype(np.int32)
    want = Generator(engine.params, config, engine.plan).greedy(prompt, 6)
    got = Generator(sharded, config, engine.plan).greedy(prompt, 6)
    assert got == want, (got, want)


def test_tp_sharded_paged_serving_matches(setup, rng):
    config, params, engine, mesh = setup
    sharded = shard_params(engine.params, mesh, config)
    prompts = [rng.integers(1, config.vocab_size, size=(n,)).astype(np.int32)
               for n in (5, 12)]
    want = ServingEngine(engine.params, config, engine.plan, num_pages=32,
                         page_size=8, max_batch=2, max_pages_per_seq=4)
    got = ServingEngine(sharded, config, engine.plan, num_pages=32,
                        page_size=8, max_batch=2, max_pages_per_seq=4)
    w_rids = [want.submit(p, 4) for p in prompts]
    g_rids = [got.submit(p, 4) for p in prompts]
    w_out, g_out = want.run(), got.run()
    for wr, gr in zip(w_rids, g_rids):
        assert w_out[wr] == g_out[gr], (w_out[wr], g_out[gr])


def test_tp_sharded_speculative_matches(setup, rng):
    """Target AND draft sharded: output still bit-identical to unsharded."""
    config, params, engine, mesh = setup
    t_sharded = shard_params(jax.tree.map(jnp.array, params), mesh, config)
    d_sharded = shard_params(engine.params, mesh, config)
    prompt = rng.integers(1, config.vocab_size, size=(7,)).astype(np.int32)
    want = Generator(params, config).greedy(prompt, 6)
    got = SpeculativeGenerator(t_sharded, config, d_sharded, config,
                               draft_plan=engine.plan, gamma=2).greedy(prompt, 6)
    assert got == want, (got, want)


def test_tp_sharded_quantized_decode_matches(setup, rng):
    """int8-quantized weights shard like their fp kernels (mesh._proj_spec
    covers the _q/_scale forms); decode is token-identical."""
    from grasp_tpu.ops.quant import quantize_model_weights

    config, params, engine, mesh = setup
    q8 = quantize_model_weights(engine.params, bits=8)
    sharded = shard_params(q8, mesh, config)
    prompt = rng.integers(1, config.vocab_size, size=(8,)).astype(np.int32)
    want = Generator(q8, config, engine.plan).greedy(prompt, 5)
    got = Generator(sharded, config, engine.plan).greedy(prompt, 5)
    assert got == want, (got, want)


def test_tp_sharded_spec_paged_engine_matches(setup, rng):
    """SpeculativeServingEngine with BOTH models TP-sharded: greedy rows
    bit-identical to the unsharded plain engine; a sampled row runs the
    Leviathan path over sharded verify logits."""
    from grasp_tpu.serving import SpeculativeServingEngine

    config, params, engine, mesh = setup
    t_sharded = shard_params(jax.tree.map(jnp.array, params), mesh, config)
    d_sharded = shard_params(engine.params, mesh, config)
    prompts = [rng.integers(1, config.vocab_size, size=(n,)).astype(np.int32)
               for n in (6, 11)]

    plain = ServingEngine(params, config, num_pages=48, page_size=8,
                          max_batch=2, max_pages_per_seq=6)
    w_rids = [plain.submit(p, 5) for p in prompts]
    want = plain.run()

    spec = SpeculativeServingEngine(
        t_sharded, config, d_sharded, config, draft_plan=engine.plan, gamma=2,
        num_pages=64, page_size=8, max_batch=2, max_pages_per_seq=6,
    )
    g_rids = [spec.submit(p, 5) for p in prompts]
    got = spec.run()
    for wr, gr in zip(w_rids, g_rids):
        assert want[wr] == got[gr], (want[wr], got[gr])

    s_rid = spec.submit(prompts[0], 5, temperature=1.0, top_k=8, seed=3)
    souts = spec.run()
    assert len(souts[s_rid]) == 5
