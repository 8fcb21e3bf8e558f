"""Fused Pallas low-rank kernel tests.

The kernel itself needs a TPU (tests run on the virtual CPU mesh), so exact
kernel-vs-XLA parity is asserted on TPU when present and otherwise the
dispatch guard is verified: use_pallas must be a no-op on CPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from grasp_tpu.configs import ModelConfig
from grasp_tpu.models.llama import forward, init_params, plan_set, default_plan
from grasp_tpu.ops.lowrank import lowrank_apply

_HAS_TPU = any(d.platform == "tpu" for d in jax.devices())


def test_use_pallas_flag_inert_on_cpu(rng):
    x = jnp.asarray(rng.standard_normal((300, 64)), jnp.float32)
    a = jnp.asarray(rng.standard_normal((64, 16)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((16, 48)), jnp.float32)
    y0 = lowrank_apply(x, a, b)
    y1 = lowrank_apply(x, a, b, use_pallas=True)  # CPU backend -> XLA path
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))


def test_model_forward_with_pallas_config_flag(rng):
    """Config flag threads through forward without changing CPU numerics."""
    import dataclasses

    config = ModelConfig.tiny(num_hidden_layers=2)
    params = init_params(jax.random.PRNGKey(0), config)
    plan = default_plan(config)
    # make one projection low-rank
    k = params["layers"][0]["mlp"]["up_proj"]["kernel"]
    params["layers"][0]["mlp"]["up_proj"] = {
        "in_kernel": k[:, :8] * 0 + jnp.asarray(rng.standard_normal((k.shape[0], 8)), k.dtype) * 0.02,
        "out_kernel": jnp.asarray(rng.standard_normal((8, k.shape[1])), k.dtype) * 0.02,
    }
    plan = plan_set(plan, 0, "up_proj", "lowrank")

    ids = jnp.asarray(rng.integers(0, config.vocab_size, (2, 16)))
    y0 = forward(params, ids, config=config, plan=plan)["logits"]
    cfg_p = dataclasses.replace(config, use_pallas_lowrank=True)
    y1 = forward(params, ids, config=cfg_p, plan=plan)["logits"]
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), rtol=1e-6, atol=1e-6)


@pytest.mark.skipif(not _HAS_TPU, reason="needs a real TPU")
def test_fused_kernel_matches_xla_on_tpu(rng):
    from grasp_tpu.ops.pallas_lowrank import fused_lowrank

    x = jnp.asarray(rng.standard_normal((1024, 2048)), jnp.bfloat16)
    a = jnp.asarray(rng.standard_normal((2048, 204)) * 0.02, jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((204, 5632)) * 0.02, jnp.bfloat16)
    y = fused_lowrank(x, a, b)
    ref = jnp.dot(
        jnp.dot(x, a, preferred_element_type=jnp.float32).astype(jnp.bfloat16),
        b, preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(ref, np.float32), rtol=1e-2, atol=1e-2
    )
