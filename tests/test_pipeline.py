"""GPipe pipeline parallelism (grasp_tpu/parallel/pipeline.py) on the virtual
8-device CPU mesh: the pipelined loss/grads/updates must match the plain
single-device forward bit-for-tolerance, for dense and uniform-lowrank plans.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from grasp_tpu.configs import ModelConfig
from grasp_tpu.models import init_params
from grasp_tpu.models.llama import (
    PROJ_ORDER,
    default_plan,
    forward,
    hf_causal_lm_loss,
    plan_set,
)
from grasp_tpu.parallel.pipeline import (
    from_pipeline_params,
    make_pipeline_loss,
    make_pp_train_step,
    shard_pipeline_params,
    to_pipeline_params,
    uniform_layer_plan,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs >=4 virtual devices"
)


def _mesh(n=4):
    return jax.sharding.Mesh(np.array(jax.devices()[:n]), ("pipe",))


@pytest.fixture(scope="module")
def dense_model():
    config = ModelConfig.tiny(num_hidden_layers=8)
    params = init_params(jax.random.PRNGKey(0), config)
    return config, params, default_plan(config)


def _batch(config, b=8, s=24, seed=3):
    r = np.random.default_rng(seed)
    ids = jnp.asarray(r.integers(1, config.vocab_size, (b, s)))
    labels = jnp.asarray(r.integers(1, config.vocab_size, (b, s)))
    # mask a few label positions to exercise the -100 token counting
    labels = labels.at[:, :4].set(-100)
    return ids, labels


def _ref_loss(params, config, plan, ids, labels):
    logits = forward(params, ids, config=config, plan=plan)["logits"]
    return hf_causal_lm_loss(logits, labels)


def test_round_trip(dense_model):
    config, params, _ = dense_model
    pp = to_pipeline_params(params, num_stages=4)
    back = from_pipeline_params(pp, config.num_hidden_layers)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pipeline_loss_matches_forward(dense_model):
    config, params, plan = dense_model
    mesh = _mesh(4)
    ids, labels = _batch(config)
    pparams = shard_pipeline_params(to_pipeline_params(params, 4), mesh)
    loss_fn = make_pipeline_loss(config, uniform_layer_plan(plan), mesh, num_microbatches=4)
    got = float(jax.jit(loss_fn)(pparams, ids, labels))
    want = float(_ref_loss(params, config, plan, ids, labels))
    assert np.isfinite(got)
    np.testing.assert_allclose(got, want, rtol=1e-5)


@pytest.mark.parametrize("remat", [False, True])
def test_pipeline_grads_match_single_device(dense_model, remat):
    config, params, plan = dense_model
    mesh = _mesh(4)
    ids, labels = _batch(config)
    pparams = shard_pipeline_params(to_pipeline_params(params, 4), mesh)
    loss_fn = make_pipeline_loss(
        config, uniform_layer_plan(plan), mesh, num_microbatches=2, remat=remat
    )
    pgrads = jax.jit(jax.grad(loss_fn))(pparams, ids, labels)
    got = from_pipeline_params(pgrads, config.num_hidden_layers)

    want = jax.grad(lambda p: _ref_loss(p, config, plan, ids, labels))(params)
    for ga, gw in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gw), rtol=2e-4, atol=2e-5)


def test_pp_train_step_matches_single_device(dense_model):
    config, params, plan = dense_model
    mesh = _mesh(4)
    tx = optax.adamw(1e-3)

    pparams = shard_pipeline_params(to_pipeline_params(params, 4), mesh)
    popt = tx.init(pparams)
    pstep = make_pp_train_step(config, uniform_layer_plan(plan), tx, mesh, num_microbatches=4)

    sparams = jax.tree.map(jnp.array, params)
    sopt = tx.init(sparams)

    @jax.jit
    def sstep(p, o, ids, labels):
        loss, g = jax.value_and_grad(lambda q: _ref_loss(q, config, plan, ids, labels))(p)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, loss

    for seed in (3, 4):
        ids, labels = _batch(config, seed=seed)
        pparams, popt, ploss = pstep(pparams, popt, ids, labels)
        sparams, sopt, sloss = sstep(sparams, sopt, ids, labels)
        np.testing.assert_allclose(float(ploss), float(sloss), rtol=1e-5)

    flat = from_pipeline_params(pparams, config.num_hidden_layers)
    for a, b in zip(jax.tree.leaves(flat), jax.tree.leaves(sparams)):
        # atol 5e-5: adamw's rsqrt(nu) amplifies fp reduction-order noise on
        # near-zero second moments (observed max 2.8e-5 on 1/11264 elements)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=5e-5)


def test_uniform_lowrank_pipeline():
    """All-layers-compressed (uniform low-rank plan) pipelines too."""
    config = ModelConfig.tiny(num_hidden_layers=4)
    params = init_params(jax.random.PRNGKey(1), config)
    plan = default_plan(config)
    rng = jax.random.PRNGKey(2)
    for li in range(config.num_hidden_layers):
        for proj in PROJ_ORDER:
            group = "self_attn" if proj in PROJ_ORDER[:4] else "mlp"
            in_f, out_f = params["layers"][li][group][proj]["kernel"].shape
            k = 8
            rng, k1, k2 = jax.random.split(rng, 3)
            params["layers"][li][group][proj] = {
                "in_kernel": jax.random.normal(k1, (in_f, k), jnp.float32) * 0.05,
                "out_kernel": jax.random.normal(k2, (k, out_f), jnp.float32) * 0.05,
            }
            plan = plan_set(plan, li, proj, "lowrank")

    mesh = _mesh(4)
    ids, labels = _batch(config, b=4, s=16)
    pparams = shard_pipeline_params(to_pipeline_params(params, 4), mesh)
    loss_fn = make_pipeline_loss(config, uniform_layer_plan(plan), mesh, num_microbatches=2)
    got = float(jax.jit(loss_fn)(pparams, ids, labels))
    want = float(_ref_loss(params, config, plan, ids, labels))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def _hetero_model(seed=5):
    """A genuinely heterogeneous GRASP product: two compressed layers with
    DIFFERENT ranks (6 and 9) amid dense layers — exercises both the hybrid
    dual-slot form and rank padding."""
    config = ModelConfig.tiny(num_hidden_layers=8)
    params = init_params(jax.random.PRNGKey(seed), config)
    plan = default_plan(config)
    rng = jax.random.PRNGKey(seed + 1)
    for li, k in ((2, 6), (5, 9)):
        for proj in PROJ_ORDER:
            group = "self_attn" if proj in PROJ_ORDER[:4] else "mlp"
            in_f, out_f = params["layers"][li][group][proj]["kernel"].shape
            rng, k1, k2 = jax.random.split(rng, 3)
            params["layers"][li][group][proj] = {
                "in_kernel": jax.random.normal(k1, (in_f, k), jnp.float32) * 0.05,
                "out_kernel": jax.random.normal(k2, (k, out_f), jnp.float32) * 0.05,
            }
            plan = plan_set(plan, li, proj, "lowrank")
    return config, params, plan


def test_hybridize_forward_exact():
    """Hybridized (uniform) model == heterogeneous model bit-for-tolerance,
    and dehybridize round-trips the original tree exactly."""
    from grasp_tpu.parallel.pipeline import dehybridize_layers, hybridize_layers

    config, params, plan = _hetero_model()
    hparams, layer_plan, spec = hybridize_layers(params, plan)
    assert set(layer_plan) == {"hybrid"}
    ids, labels = _batch(config, b=2, s=16)

    want = float(_ref_loss(params, config, plan, ids, labels))
    hplan = tuple(layer_plan for _ in range(config.num_hidden_layers))
    got = float(_ref_loss(hparams, config, hplan, ids, labels))
    np.testing.assert_allclose(got, want, rtol=1e-6)

    back = dehybridize_layers(hparams, spec)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_hetero_pipeline_loss_and_grads_match_single_device():
    """The VERDICT gate: a compressed NON-merged heterogeneous plan pipelines,
    with loss and real-parameter grads equal to the single-device run."""
    from grasp_tpu.parallel.pipeline import dehybridize_layers, hybridize_layers

    config, params, plan = _hetero_model()
    hparams, layer_plan, spec = hybridize_layers(params, plan)
    mesh = _mesh(4)
    ids, labels = _batch(config)

    pparams = shard_pipeline_params(to_pipeline_params(hparams, 4), mesh)
    loss_fn = make_pipeline_loss(config, layer_plan, mesh, num_microbatches=4)
    got_loss = float(jax.jit(loss_fn)(pparams, ids, labels))
    want_loss = float(_ref_loss(params, config, plan, ids, labels))
    np.testing.assert_allclose(got_loss, want_loss, rtol=1e-5)

    pgrads = jax.jit(jax.grad(loss_fn))(pparams, ids, labels)
    flat_grads = from_pipeline_params(pgrads, config.num_hidden_layers)
    got = dehybridize_layers(flat_grads, spec)
    want = jax.grad(lambda p: _ref_loss(p, config, plan, ids, labels))(params)
    for ga, gw in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gw), rtol=2e-4, atol=2e-5)


def test_hetero_pp_train_step_with_mask():
    """One pp train step on a hybridized plan: real params update exactly as
    the single-device step; structural zeros stay exactly zero."""
    from grasp_tpu.parallel.pipeline import (
        dehybridize_layers, hybrid_grad_mask, hybridize_layers,
    )

    config, params, plan = _hetero_model()
    hparams, layer_plan, spec = hybridize_layers(params, plan)
    mask = to_pipeline_params(hybrid_grad_mask(hparams, spec), 4)
    mesh = _mesh(4)
    tx = optax.adamw(1e-3)

    pparams = shard_pipeline_params(to_pipeline_params(hparams, 4), mesh)
    pstep = make_pp_train_step(
        config, layer_plan, tx, mesh, num_microbatches=4, grad_mask=mask
    )
    # fresh copies BEFORE the step: it donates its inputs, and device_put can
    # alias host buffers (CLAUDE.md invariant)
    sparams = jax.tree.map(jnp.array, params)
    ids, labels = _batch(config, seed=7)
    new_pparams, _, ploss = pstep(pparams, tx.init(pparams), ids, labels)

    @jax.jit
    def sstep(p, o, ids, labels):
        loss, g = jax.value_and_grad(lambda q: _ref_loss(q, config, plan, ids, labels))(p)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, loss

    new_sparams, _, sloss = sstep(sparams, tx.init(sparams), ids, labels)
    np.testing.assert_allclose(float(ploss), float(sloss), rtol=1e-5)

    flat = from_pipeline_params(new_pparams, config.num_hidden_layers)
    got = dehybridize_layers(flat, spec)
    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(new_sparams)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=5e-5)

    # structural zeros survived the update exactly
    for li, lspec in enumerate(spec):
        for j, (kind, r) in enumerate(lspec):
            proj = PROJ_ORDER[j]
            group = "self_attn" if proj in PROJ_ORDER[:4] else "mlp"
            mod = flat["layers"][li][group][proj]
            if kind == "dense" and "in_kernel" in mod:
                assert not np.asarray(mod["in_kernel"]).any()
                assert not np.asarray(mod["out_kernel"]).any()
            elif kind == "lowrank":
                if "kernel" in mod:
                    assert not np.asarray(mod["kernel"]).any()
                assert not np.asarray(mod["in_kernel"][:, r:]).any()
                assert not np.asarray(mod["out_kernel"][r:, :]).any()


def test_heterogeneous_plan_rejected(dense_model):
    config, params, plan = dense_model
    plan = plan_set(plan, 1, "q_proj", "lowrank")
    with pytest.raises(ValueError, match="uniform"):
        uniform_layer_plan(plan)
    # and structurally mixed layers are rejected at stacking time
    p2 = jax.tree.map(lambda x: x, params)
    p2["layers"] = list(p2["layers"])
    p2["layers"][0] = dict(p2["layers"][0])
    p2["layers"][0]["self_attn"] = dict(p2["layers"][0]["self_attn"])
    p2["layers"][0]["self_attn"]["q_proj"] = {
        "in_kernel": jnp.zeros((8, 4)), "out_kernel": jnp.zeros((4, 8))
    }
    with pytest.raises(ValueError, match="structure"):
        to_pipeline_params(p2, 4)


def test_gemma_pipeline_loss_matches_forward():
    """Gemma-family variants through the pipeline: the staged layers apply
    GeGLU/(1+w)-norms via llama._layer_forward, and the tick body applies
    the sqrt(hidden) embedding scaling + tied-embedding head itself."""
    config = ModelConfig.tiny(num_hidden_layers=8, hidden_act="gelu_pytorch_tanh",
                              norm_plus_one=True, scale_embeddings=True,
                              tie_word_embeddings=True)
    params = init_params(jax.random.PRNGKey(4), config)
    plan = default_plan(config)
    mesh = _mesh(4)
    ids, labels = _batch(config)
    pparams = shard_pipeline_params(to_pipeline_params(params, 4), mesh)
    loss_fn = make_pipeline_loss(config, uniform_layer_plan(plan), mesh, num_microbatches=4)
    got = float(jax.jit(loss_fn)(pparams, ids, labels))
    want = float(_ref_loss(params, config, plan, ids, labels))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_gemma2_pipeline_loss_matches_forward():
    """Gemma-2 through the pipeline: the stage scan carries each layer's
    window flag (sliding/full alternation) and selects the mask per layer;
    softcaps/sandwich norms come from the shared layer body; the head caps
    the final logits."""
    config = ModelConfig.tiny(
        num_hidden_layers=8, hidden_act="gelu_pytorch_tanh",
        norm_plus_one=True, scale_embeddings=True, tie_word_embeddings=True,
        sandwich_norms=True, sliding_window=6,
        layer_types=("sliding_attention", "full_attention") * 4,
        attn_logit_softcapping=0.5, final_logit_softcapping=3.0,
        query_pre_attn_scalar=32.0)
    params = init_params(jax.random.PRNGKey(6), config)
    plan = default_plan(config)
    mesh = _mesh(4)
    ids, labels = _batch(config)
    pparams = shard_pipeline_params(to_pipeline_params(params, 4), mesh)
    loss_fn = make_pipeline_loss(config, uniform_layer_plan(plan), mesh, num_microbatches=4)
    got = float(jax.jit(loss_fn)(pparams, ids, labels))
    want = float(_ref_loss(params, config, plan, ids, labels))
    np.testing.assert_allclose(got, want, rtol=1e-5)
