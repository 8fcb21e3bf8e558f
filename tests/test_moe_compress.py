"""GRASP compression of stacked MoE expert MLPs (beyond-reference extension).

The reference's target names are hardcoded to dense gate/up/down_proj
(modeling_grasp.py:248), so sparse-MoE expert compression has no reference
counterpart. TPU-native design: each Mixtral part (w1/w2/w3) is ONE engine
module covering all experts — selection runs as one batched gram-eigh over
the leading [E] axis (core.engine compress_round, ops.svd ufree_select) and
the compiled form is a pair of stacked low-rank factors p_a [E, in, k] /
p_b [E, k, out] consumed by two batched einsums in models.moe.moe_apply.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grasp_tpu.configs import GraspConfig, ModelConfig
from grasp_tpu.core.engine import GraspEngine, module_name
from grasp_tpu.models.llama import forward, init_params
from grasp_tpu.ops.saliency import select_topk


MOE_CFG = dict(
    vocab_size=128,
    hidden_size=64,
    intermediate_size=112,
    num_hidden_layers=3,
    num_attention_heads=4,
    num_key_value_heads=2,
    num_local_experts=4,
    num_experts_per_tok=2,
)


@pytest.fixture(scope="module")
def moe_model():
    config = ModelConfig.tiny(**MOE_CFG)
    params = init_params(jax.random.PRNGKey(7), config)
    return config, params


@pytest.fixture(scope="module")
def batches(moe_model):
    config, _ = moe_model
    rng = np.random.default_rng(3)
    return [
        {
            "input_ids": jnp.asarray(rng.integers(1, config.vocab_size, (2, 24))),
            "labels": jnp.asarray(rng.integers(1, config.vocab_size, (2, 24))),
        }
        for _ in range(2)
    ]


def test_batched_ufree_matches_per_expert():
    """One batched [E] gram selection == E independent 2D selections."""
    from grasp_tpu.ops.svd import ufree_select, ufree_truncate_kernel

    rng = np.random.default_rng(0)
    E, d, f, k = 3, 48, 80, 16
    kernels = jnp.asarray(rng.normal(size=(E, d, f)).astype(np.float32))
    grads = jnp.asarray(rng.normal(size=(E, d, f)).astype(np.float32))

    s_b, basis_b, side_b, imp_b = ufree_select(kernels, grads, "taylor")
    idx_b = np.asarray(select_topk(imp_b, k))
    assert idx_b.shape == (E, k)
    ut_b, st_b, vht_b = ufree_truncate_kernel(
        kernels, s_b, basis_b, side_b, jnp.asarray(idx_b)
    )

    for e in range(E):
        s1, basis1, side1, imp1 = ufree_select(kernels[e], grads[e], "taylor")
        assert side1 == side_b
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s_b)[e], rtol=1e-4, atol=1e-4)
        idx1 = np.asarray(select_topk(imp1, k))
        np.testing.assert_array_equal(idx1, idx_b[e])
        ut1, st1, vht1 = ufree_truncate_kernel(
            kernels[e], s1, basis1, side1, jnp.asarray(idx1)
        )
        rec_b = (np.asarray(ut_b[e]) * np.asarray(st_b[e])) @ np.asarray(vht_b[e])
        rec_1 = (np.asarray(ut1) * np.asarray(st1)) @ np.asarray(vht1)
        np.testing.assert_allclose(rec_b, rec_1, rtol=1e-3, atol=1e-3)


def _expert_shapes(params, layer_id):
    return {
        k: tuple(v.shape)
        for k, v in params["layers"][layer_id]["moe"]["experts"].items()
    }


def test_engine_compresses_moe_experts(moe_model, batches):
    """Full pipeline with default targets on a Mixtral layer compresses the
    stacked experts; the compiled low-rank block equals its own dense
    reconstruction exactly."""
    config, params = moe_model
    engine = GraspEngine(jax.tree.map(jnp.array, params), config)
    cfg = GraspConfig(
        num_prune_layers=1, compression_ratio=0.4,
        attn_target_layer_types=None,  # MoE-expert round only
    )
    engine.run(batches, cfg)

    lid = engine.redundant_layers[0]
    names = [module_name(lid, p) for p in ("w1", "w2", "w3")]
    assert set(names) <= set(engine.rank_dict), engine.rank_dict
    ex = engine.params["layers"][lid]["moe"]["experts"]
    assert "w1" not in ex and "w1_a" in ex and "w1_b" in ex
    E = MOE_CFG["num_local_experts"]
    k = engine.rank_dict[names[0]]
    assert ex["w1_a"].shape == (E, MOE_CFG["hidden_size"], k)
    assert ex["w1_b"].shape == (E, k, MOE_CFG["intermediate_size"])

    out = forward(
        engine.params, batches[0]["input_ids"], config=config, plan=engine.plan
    )["logits"]
    assert bool(jnp.isfinite(out).all())

    # the low-rank apply path must equal running the SAME factors merged dense
    merged = jax.tree.map(jnp.array, engine.params)
    ex_m = dict(merged["layers"][lid]["moe"]["experts"])
    for p in ("w1", "w2", "w3"):
        ex_m[p] = jnp.einsum("eik,eko->eio", ex_m.pop(p + "_a"), ex_m.pop(p + "_b"))
    merged["layers"][lid]["moe"]["experts"] = ex_m
    out_m = forward(
        merged, batches[0]["input_ids"], config=config, plan=engine.plan
    )["logits"]
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(out_m, np.float32), rtol=2e-4, atol=2e-4
    )

    # parameter count actually shrank
    dense_n = sum(np.prod(s) for s in _expert_shapes(params, lid).values())
    comp_n = sum(np.prod(s) for s in _expert_shapes(engine.params, lid).values())
    assert comp_n < dense_n


def test_moe_target_name_translation(moe_model, batches):
    """Reference dense-MLP target names map onto Mixtral parts
    (gate_proj->w1, up_proj->w3, down_proj->w2)."""
    config, params = moe_model
    engine = GraspEngine(jax.tree.map(jnp.array, params), config)
    cfg = GraspConfig(
        num_prune_layers=1, compression_ratio=0.4,
        mlp_target_layer_types=("gate_proj", "down_proj"),
        attn_target_layer_types=None,
    )
    engine.run(batches, cfg)
    lid = engine.redundant_layers[0]
    assert module_name(lid, "w1") in engine.rank_dict
    assert module_name(lid, "w2") in engine.rank_dict
    assert module_name(lid, "w3") not in engine.rank_dict
    ex = engine.params["layers"][lid]["moe"]["experts"]
    assert "w3" in ex and "w1_a" in ex and "w2_a" in ex


def test_moe_host_svd_path_matches_gram(moe_model, batches):
    """The stacked host-SVD route (svd_future prefetch) picks the same
    indices as the U-free gram route."""
    config, params = moe_model
    cfg = GraspConfig(
        num_prune_layers=1, compression_ratio=0.4,
        attn_target_layer_types=None,
    )
    eng_g = GraspEngine(jax.tree.map(jnp.array, params), config, svd_method="gram_device")
    eng_g.run([{k: jnp.array(v) for k, v in b.items()} for b in batches], cfg)
    eng_h = GraspEngine(jax.tree.map(jnp.array, params), config, svd_method="host")
    eng_h.run([{k: jnp.array(v) for k, v in b.items()} for b in batches], cfg)
    assert set(eng_g.indices_log) == set(eng_h.indices_log)
    for n, idx in eng_g.indices_log.items():
        np.testing.assert_array_equal(idx, eng_h.indices_log[n], err_msg=n)


def test_moe_compressed_expert_parallel_forward(moe_model, batches):
    """Compressed stacked factors shard their [E] axis over the model axis
    (parallel.mesh.moe_specs keys off the actual expert dict) — sharded
    forward matches single-device."""
    from grasp_tpu.parallel.mesh import make_mesh, shard_params

    config, params = moe_model
    engine = GraspEngine(jax.tree.map(jnp.array, params), config)
    cfg = GraspConfig(
        num_prune_layers=1, compression_ratio=0.4,
        attn_target_layer_types=None,
    )
    engine.run(batches, cfg)
    ids = batches[0]["input_ids"]
    ref = forward(engine.params, ids, config=config, plan=engine.plan)["logits"]

    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices for the EP mesh")
    mesh = make_mesh((1, 2), devices=jax.devices()[:2])
    sharded = shard_params(jax.tree.map(jnp.array, engine.params), mesh, config)
    out = forward(sharded, ids, config=config, plan=engine.plan)["logits"]
    np.testing.assert_allclose(
        np.asarray(ref, np.float32), np.asarray(out, np.float32), rtol=2e-4, atol=2e-4
    )


def test_recovery_step_trains_compressed_experts(moe_model, batches):
    """GRASP* recovery on a compressed MoE model: gradients flow through the
    stacked low-rank expert einsums and only the redundant layer updates
    (train.recover.trainable_mask is structural, so the w*_a/w*_b factor
    keys are covered automatically)."""
    import optax

    from grasp_tpu.train import make_train_step
    from grasp_tpu.train.recover import trainable_mask

    config, params = moe_model
    engine = GraspEngine(jax.tree.map(jnp.array, params), config)
    cfg = GraspConfig(
        num_prune_layers=1, compression_ratio=0.4,
        attn_target_layer_types=None,
    )
    engine.run(batches, cfg)
    lid = engine.redundant_layers[0]

    mask = trainable_mask(engine.params, [lid])
    assert mask["layers"][lid]["moe"]["experts"]["w1_a"] is True

    labels = jax.tree.map(lambda t: "train" if t else "freeze", mask)
    tx = optax.multi_transform(
        {"train": optax.adamw(1e-3), "freeze": optax.set_to_zero()}, labels
    )
    step = make_train_step(config, engine.plan, tx)
    before = {
        k: np.asarray(v)
        for k, v in engine.params["layers"][lid]["moe"]["experts"].items()
    }
    frozen_li = (lid + 1) % config.num_hidden_layers
    frozen_before = np.asarray(
        engine.params["layers"][frozen_li]["moe"]["experts"]["w1"]
    )
    p = jax.tree.map(jnp.array, engine.params)
    opt = tx.init(jax.tree.map(jnp.array, engine.params))
    ids = batches[0]["input_ids"]
    p, opt, loss = step(p, opt, ids, ids, None)
    assert np.isfinite(float(loss))
    after = p["layers"][lid]["moe"]["experts"]
    assert any(
        not np.array_equal(before[k], np.asarray(after[k])) for k in before
    ), "compressed expert factors did not train"
    np.testing.assert_array_equal(
        frozen_before, np.asarray(p["layers"][frozen_li]["moe"]["experts"]["w1"])
    )


def test_gram_eigh_batches_group_by_gram_shape():
    """MoE parts w1/w2/w3 ([E,h,f],[E,f,h],[E,h,f]) share gram [E,h,h] and
    batch into ONE stacked eigh; adaptive (ratio None) modules stay
    per-matrix; order is first-seen stable (engine._gram_eigh_batches)."""
    from grasp_tpu.core.engine import _gram_eigh_batches

    shapes = {
        "w1": (8, 64, 224), "w2": (8, 224, 64), "w3": (8, 64, 224),
        "q": (64, 64), "k": (64, 32), "v": (64, 32),
    }
    ratios = {n: 0.5 for n in shapes}
    batches = _gram_eigh_batches(list(shapes), shapes.get, ratios.get)
    got = [(tuple(ns), gs, st) for ns, gs, st in batches]
    assert got == [
        (("w1", "w2", "w3"), (8, 64, 64), True),
        (("q",), (64, 64), False),
        (("k", "v"), (32, 32), True),
    ]
    # adaptive modules never stack
    ratios["w2"] = None
    batches = _gram_eigh_batches(list(shapes), shapes.get, ratios.get)
    got = [(tuple(ns), st) for ns, _, st in batches]
    assert (("w2",), False) in got
    assert (("w1", "w3"), True) in got
