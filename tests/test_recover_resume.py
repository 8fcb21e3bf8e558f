"""Recovery-training checkpoint/resume (reference alpaca_grasp.py:143-153,
184-188: eval+save every N steps, save_total_limit, load_best_at_end,
resume_from_checkpoint).

The kill-and-resume test is strict: a run interrupted after the first
checkpoint and resumed from disk must reproduce the uninterrupted run's loss
trajectory exactly (full train state — params + optimizer + step + data
position — survives the restart)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from grasp_tpu.configs import ModelConfig
from grasp_tpu.models import default_plan, init_params
from grasp_tpu.train import latest_checkpoint, recovery_train


@pytest.fixture(scope="module")
def tiny():
    config = ModelConfig.tiny(num_hidden_layers=2)
    params = init_params(jax.random.PRNGKey(0), config)
    return config, params


def _batches(config, rng, n=12, rows=2, seq=12):
    out = []
    for _ in range(n):
        ids = rng.integers(0, config.vocab_size, size=(rows, seq))
        out.append({"input_ids": ids, "labels": ids, "attention_mask": np.ones_like(ids)})
    return out


def _fresh(params):
    return jax.tree.map(jnp.array, params)  # train step donates its input


def test_periodic_save_and_total_limit(tiny, rng, tmp_path):
    config, params = tiny
    batches = _batches(config, rng, n=10)
    out = str(tmp_path / "trainer")
    recovery_train(
        _fresh(params), config, default_plan(config), [0],
        batches, num_epochs=1, learning_rate=1e-3, warmup_steps=0,
        eval_every=2, output_dir=out, save_total_limit=3, log_every=1,
    )
    kept = sorted(d for d in os.listdir(out) if d.startswith("step_"))
    assert len(kept) == 3, kept  # 5 saves pruned to the newest 3
    assert latest_checkpoint(out).endswith("step_10")


def test_kill_and_resume_reproduces_loss_curve(tiny, rng, tmp_path):
    config, params = tiny
    batches = _batches(config, rng, n=12)
    plan = default_plan(config)
    out_a = str(tmp_path / "uninterrupted")
    out_b = str(tmp_path / "killed")
    # steps_per_epoch pinned so the LR schedule is identical across all runs
    # (the killed run sees fewer batches but has the same planned horizon)
    kwargs = dict(
        num_epochs=1, learning_rate=1e-3, warmup_steps=0, steps_per_epoch=12,
        eval_every=4, save_total_limit=2, log_every=1,
    )

    _, hist_full = recovery_train(
        _fresh(params), config, plan, [0, 1], batches, output_dir=out_a, **kwargs,
    )

    # "kill" after the first checkpoint: only feed the first 5 batches
    recovery_train(
        _fresh(params), config, plan, [0, 1], batches[:5], output_dir=out_b, **kwargs,
    )
    assert latest_checkpoint(out_b).endswith("step_4")

    _, hist_resumed = recovery_train(
        _fresh(params), config, plan, [0, 1], batches, output_dir=out_b,
        resume_from_checkpoint=out_b, **kwargs,
    )

    full = dict(hist_full["train_loss"])
    resumed = dict(hist_resumed["train_loss"])
    post = [s for s in full if s > 4]
    assert post and all(s in resumed for s in post)
    for s in post:
        np.testing.assert_allclose(resumed[s], full[s], rtol=1e-5,
                                   err_msg=f"loss diverged at step {s}")


def test_load_best_at_end(tiny, rng, tmp_path):
    """With an exploding LR the last checkpoint is worse than the best —
    load_best_at_end must return the best one's params."""
    config, params = tiny
    batches = _batches(config, rng, n=8)
    val = _batches(config, rng, n=2)
    out = str(tmp_path / "trainer")

    new_params, hist = recovery_train(
        _fresh(params), config, default_plan(config), [0, 1],
        batches, val_batches=val,
        num_epochs=1, learning_rate=2.0, warmup_steps=0,  # diverges on purpose
        eval_every=2, output_dir=out, save_total_limit=8, log_every=1,
    )
    evals = dict(hist["eval_loss"])
    best_step = min(evals, key=evals.get)
    from grasp_tpu.train import load_train_state
    from grasp_tpu.train.recover import make_optimizer, trainable_mask

    mask = trainable_mask(_fresh(params), [0, 1])
    tx = make_optimizer(learning_rate=2.0, total_steps=8, warmup_steps=0, mask=mask)
    template = tx.init(_fresh(params))
    best_params, _, step, _ = load_train_state(
        os.path.join(out, f"step_{best_step}"), template
    )
    assert step == best_step
    got = np.asarray(new_params["layers"][0]["mlp"]["up_proj"]["kernel"], np.float32)
    want = np.asarray(best_params["layers"][0]["mlp"]["up_proj"]["kernel"], np.float32)
    np.testing.assert_array_equal(got, want)


def test_mesh_recovery_train(tiny, rng):
    """recovery_train(mesh=...) runs dp+tp sharded and reduces loss."""
    from grasp_tpu.parallel import make_mesh

    config, params = tiny
    batches = _batches(config, rng, n=1, rows=8) * 10  # memorize one batch
    mesh = make_mesh((4, 2))
    _, hist = recovery_train(
        _fresh(params), config, default_plan(config), [0, 1],
        batches, num_epochs=1, learning_rate=5e-3, warmup_steps=0,
        log_every=1, mesh=mesh,
    )
    losses = [v for _, v in hist["train_loss"]]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
