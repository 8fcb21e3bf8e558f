"""Subtree-gradient recovery steps (grasp_tpu/train/recover.py).

make_subtree_train_step / make_subtree_accum_train_step differentiate only
the redundant layers' subtree — the memory shape that lets 7B recovery fit a
single 16 GiB chip. Gate: updates match the full-tree steps leaf for leaf
(the full path zeroes frozen grads before its global clip, so both clip over
the same norm), frozen leaves stay bit-identical.
"""

import copy

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from grasp_tpu.configs import GraspConfig, ModelConfig
from grasp_tpu.core.engine import GraspEngine
from grasp_tpu.models import init_params
from grasp_tpu.train.recover import (
    make_accum_train_step,
    make_optimizer,
    make_subtree_accum_train_step,
    make_subtree_train_step,
    make_train_step,
    recovery_train,
    trainable_mask,
)

REDUNDANT = [1, 2]


@pytest.fixture(scope="module")
def compressed():
    config = ModelConfig.tiny(num_hidden_layers=4)
    engine = GraspEngine(init_params(jax.random.PRNGKey(0), config), config)
    rng = np.random.default_rng(3)
    batches = [{
        "input_ids": jnp.asarray(rng.integers(0, config.vocab_size, (2, 16))),
        "labels": jnp.asarray(rng.integers(0, config.vocab_size, (2, 16))),
    }]
    engine.run(batches, GraspConfig(
        num_prune_layers=2, compression_ratio=0.4, layers_id=REDUNDANT))
    return config, engine.params, engine.plan


def _copy(tree):
    return jax.tree.map(jnp.array, tree)  # donation-safe fresh buffers


def _batch(config, rng, bs=2, seq=16):
    ids = rng.integers(1, config.vocab_size, (bs, seq)).astype(np.int32)
    labels = ids.copy()
    labels[:, : seq // 4] = -100  # instruction-masked prefix
    return jnp.asarray(ids), jnp.asarray(labels)


def _subtree(params):
    return {str(li): params["layers"][li] for li in REDUNDANT}


def test_subtree_step_matches_full_step(compressed, rng):
    config, params0, plan = compressed
    mask = trainable_mask(params0, REDUNDANT)

    opt_full = make_optimizer(1e-3, total_steps=10, warmup_steps=2, mask=mask)
    full = make_train_step(config, plan, opt_full, remat=False)
    p_f, s_f = _copy(params0), opt_full.init(_copy(params0))

    opt_sub = make_optimizer(1e-3, total_steps=10, warmup_steps=2, mask=None)
    sub = make_subtree_train_step(config, plan, opt_sub, REDUNDANT, remat=False)
    p_s, s_s = _copy(params0), opt_sub.init(_subtree(_copy(params0)))

    for i in range(3):
        ids, labels = _batch(config, rng)
        p_f, s_f, loss_f = full(p_f, s_f, ids, labels, None)
        p_s, s_s, loss_s = sub(p_s, s_s, ids, labels, None)
        assert np.allclose(float(loss_f), float(loss_s), rtol=1e-6)

    leaves_f = jax.tree.leaves_with_path(p_f)
    leaves_s = dict(jax.tree.leaves_with_path(p_s))
    mask_leaves = dict(jax.tree.leaves_with_path(mask))
    orig = dict(jax.tree.leaves_with_path(params0))
    for path, lf in leaves_f:
        ls = leaves_s[path]
        if mask_leaves[path]:
            np.testing.assert_allclose(
                np.asarray(lf, np.float64), np.asarray(ls, np.float64),
                rtol=2e-5, atol=2e-7, err_msg=str(path))
        else:
            assert bool((ls == orig[path]).all()), f"frozen leaf moved: {path}"
            assert bool((lf == orig[path]).all())


def test_subtree_accum_step_matches_full_accum(compressed, rng):
    config, params0, plan = compressed
    mask = trainable_mask(params0, REDUNDANT)

    opt_full = make_optimizer(1e-3, total_steps=10, warmup_steps=2, mask=mask)
    full = make_accum_train_step(config, plan, opt_full, remat=False)
    p_f, s_f = _copy(params0), opt_full.init(_copy(params0))

    opt_sub = make_optimizer(1e-3, total_steps=10, warmup_steps=2, mask=None)
    sub = make_subtree_accum_train_step(config, plan, opt_sub, REDUNDANT, remat=False)
    p_s, s_s = _copy(params0), opt_sub.init(_subtree(_copy(params0)))

    for i in range(2):
        ids1, lab1 = _batch(config, rng)
        ids2, lab2 = _batch(config, rng)
        ids = jnp.stack([ids1, ids2])
        labels = jnp.stack([lab1, lab2])
        p_f, s_f, loss_f = full(p_f, s_f, ids, labels, None)
        p_s, s_s, loss_s = sub(p_s, s_s, ids, labels, None)
        assert np.allclose(float(loss_f), float(loss_s), rtol=1e-6)

    for (path, lf), (_, ls) in zip(
            jax.tree.leaves_with_path(p_f), jax.tree.leaves_with_path(p_s)):
        np.testing.assert_allclose(
            np.asarray(lf, np.float64), np.asarray(ls, np.float64),
            rtol=2e-5, atol=2e-7, err_msg=str(path))


def test_recovery_train_grad_scope_layers(compressed, rng):
    """recovery_train(grad_scope='layers') reproduces the full-scope loss
    curve on identical data."""
    config, params0, plan = compressed

    def data():
        r = np.random.default_rng(11)
        out = []
        for _ in range(4):
            ids = r.integers(1, config.vocab_size, (2, 12)).astype(np.int32)
            lab = ids.copy()
            lab[:, :3] = -100
            out.append({"input_ids": ids, "labels": lab,
                        "attention_mask": np.ones_like(ids)})
        return out

    pf, hf = recovery_train(
        _copy(params0), config, plan, REDUNDANT, data(),
        num_epochs=1, learning_rate=1e-3, warmup_steps=1, log_every=100,
        grad_scope="full")
    ps, hs = recovery_train(
        _copy(params0), config, plan, REDUNDANT, data(),
        num_epochs=1, learning_rate=1e-3, warmup_steps=1, log_every=100,
        grad_scope="layers")
    lf = [l for _, l in hf["train_loss"]]
    ls = [l for _, l in hs["train_loss"]]
    np.testing.assert_allclose(lf, ls, rtol=1e-5)
    for (path, a), (_, b) in zip(
            jax.tree.leaves_with_path(pf), jax.tree.leaves_with_path(ps)):
        np.testing.assert_allclose(
            np.asarray(a, np.float64), np.asarray(b, np.float64),
            rtol=2e-5, atol=2e-7, err_msg=str(path))


def test_recovery_train_bad_grad_scope(compressed):
    config, params0, plan = compressed
    with pytest.raises(ValueError):
        recovery_train(_copy(params0), config, plan, REDUNDANT, [],
                       grad_scope="nope")


def test_auto_scan_layers_decision(compressed):
    """Big layer stacks unroll (the 7B stack-temp OOM guard); small models
    scan; an explicit scan_layers always wins over the heuristic."""
    from grasp_tpu.train.recover import _auto_scan_layers

    config, params, plan = compressed
    assert _auto_scan_layers(params, None) is True      # tiny: KBs of layers
    assert _auto_scan_layers(params, False) is False    # explicit override
    assert _auto_scan_layers(params, True) is True

    # a fake >6 GB layer stack (shape metadata only — jax.eval_shape, no
    # allocation) must flip the decision to unroll
    big = {"layers": [{"w": jax.ShapeDtypeStruct((40000, 40000), jnp.bfloat16)}
                      for _ in range(3)]}
    assert _auto_scan_layers(big, None) is False
