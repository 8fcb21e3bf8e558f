"""Flash attention kernel tests (kernel needs TPU; config plumbing on CPU)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from grasp_tpu.configs import ModelConfig
from grasp_tpu.models.llama import forward, init_params
from grasp_tpu.ops.pallas_attention import _xla_reference

_HAS_TPU = any(d.platform == "tpu" for d in jax.devices())


def test_xla_reference_matches_model_attention(rng):
    """The custom-vjp backward recomputes through _xla_reference — it must
    equal the model's own attention on the pure-causal path."""
    from grasp_tpu.models.llama import _attention, _causal_mask

    b, nh, nkv, s, hd = 2, 4, 2, 16, 8
    q = jnp.asarray(rng.standard_normal((b, nh, s, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, nkv, s, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, nkv, s, hd)), jnp.float32)
    a = _xla_reference(q, k, v, nh // nkv, None)
    b_ = _attention(q, k, v, _causal_mask(s, s, 0), nh // nkv)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-5)


def test_flash_flag_inert_on_cpu(rng):
    config = ModelConfig.tiny(num_hidden_layers=2)
    params = init_params(jax.random.PRNGKey(0), config)
    ids = jnp.asarray(rng.integers(0, config.vocab_size, (2, 12)))
    y0 = forward(params, ids, config=config)["logits"]
    cfg = dataclasses.replace(config, use_flash_attention=True)
    y1 = forward(params, ids, config=cfg)["logits"]
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), rtol=1e-6, atol=1e-6)


def test_flash_not_used_with_padding_mask(rng):
    """Padding masks must bypass the flash path (it is pure-causal only)."""
    config = dataclasses.replace(ModelConfig.tiny(num_hidden_layers=2), use_flash_attention=True)
    params = init_params(jax.random.PRNGKey(0), config)
    ids = jnp.asarray(rng.integers(0, config.vocab_size, (2, 12)))
    mask = jnp.ones((2, 12), jnp.int32).at[0, :4].set(0)
    y = forward(params, ids, config=config, attention_mask=mask)["logits"]
    assert bool(jnp.isfinite(y).all())


@pytest.mark.skipif(not _HAS_TPU, reason="needs a real TPU")
def test_flash_backward_kernels_match_xla_on_tpu(rng):
    from grasp_tpu.ops.pallas_attention import flash_attention

    b, nh, nkv, s, hd = 1, 8, 2, 511, 64
    q = jnp.asarray(rng.standard_normal((b, nh, s, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, nkv, s, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, nkv, s, hd)), jnp.float32)
    gf = jax.grad(lambda q_, k_, v_: jnp.sum(flash_attention(q_, k_, v_, 4) ** 2),
                  argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(lambda q_, k_, v_: jnp.sum(_xla_reference(q_, k_, v_, 4, None) ** 2),
                  argnums=(0, 1, 2))(q, k, v)
    for a, bb in zip(gf, gx):
        scale = float(jnp.abs(bb).max()) + 1e-9
        assert float(jnp.abs(a - bb).max()) / scale < 2e-2


@pytest.mark.skipif(not _HAS_TPU, reason="needs a real TPU")
def test_flash_kernel_matches_xla_on_tpu(rng):
    from grasp_tpu.ops.pallas_attention import flash_attention

    b, nh, nkv, s, hd = 1, 8, 2, 511, 64  # ragged seq exercises padding
    q = jnp.asarray(rng.standard_normal((b, nh, s, hd)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, nkv, s, hd)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, nkv, s, hd)), jnp.bfloat16)
    y = flash_attention(q, k, v, nh // nkv)
    ref = _xla_reference(q, k, v, nh // nkv, None)
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(ref, np.float32), rtol=5e-2, atol=5e-2
    )


def test_engine_auto_flash_sweep(monkeypatch):
    """Long-sequence calibration sweeps flip use_flash_attention on TPU
    (engine._maybe_enable_flash_sweep): seq >= 1024 + tpu backend -> on;
    short seq, CPU backend, or GRASP_FLASH_SWEEP=0 -> untouched."""
    from grasp_tpu.core import engine as eng
    from grasp_tpu.core.engine import GraspEngine

    config = ModelConfig.tiny(num_hidden_layers=2)
    params = init_params(jax.random.PRNGKey(0), config)
    batch_long = {"input_ids": jnp.zeros((1, 1024), jnp.int32),
                  "labels": jnp.zeros((1, 1024), jnp.int32)}
    batch_short = {"input_ids": jnp.zeros((1, 512), jnp.int32),
                   "labels": jnp.zeros((1, 512), jnp.int32)}

    def mk():
        return GraspEngine(jax.tree.map(jnp.array, params), config)

    monkeypatch.setattr(eng.jax, "default_backend", lambda: "tpu")
    e = mk()
    e._maybe_enable_flash_sweep([batch_long])
    assert e.config.use_flash_attention

    e = mk()
    e._maybe_enable_flash_sweep([batch_short])
    assert not e.config.use_flash_attention

    monkeypatch.setenv("GRASP_FLASH_SWEEP", "0")
    e = mk()
    e._maybe_enable_flash_sweep([batch_long])
    assert not e.config.use_flash_attention
    monkeypatch.delenv("GRASP_FLASH_SWEEP")

    monkeypatch.setattr(eng.jax, "default_backend", lambda: "cpu")
    e = mk()
    e._maybe_enable_flash_sweep([batch_long])
    assert not e.config.use_flash_attention
