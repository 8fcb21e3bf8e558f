"""Mesh-parallel compression engine: identical results to single-device.

SURVEY.md §7 build-order step 5: the ENGINE itself (BI sweep, gradient sweeps,
SVD stacks, compile) runs over a ("data","model") mesh — dp-sharded
calibration batches, Megatron-TP-sharded params — and must select the same
singular indices as the single-device run.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from grasp_tpu.configs import GraspConfig, ModelConfig
from grasp_tpu.core.engine import GraspEngine
from grasp_tpu.models import forward, init_params
from grasp_tpu.parallel import make_mesh


@pytest.fixture(scope="module")
def tiny():
    config = ModelConfig.tiny(num_hidden_layers=4, hidden_size=64, num_attention_heads=4,
                              num_key_value_heads=2, intermediate_size=128)
    params = init_params(jax.random.PRNGKey(0), config)
    return config, params


def _batches(config, rng, n=2, rows=8, seq=17):
    out = []
    for _ in range(n):
        ids = rng.integers(0, config.vocab_size, size=(rows, seq))
        out.append({
            "input_ids": jnp.asarray(ids[:, :-1]),
            "labels": jnp.asarray(ids[:, 1:]),
        })
    return out


@pytest.mark.parametrize("grad_mode", ["dense", "svd"])
def test_mesh_engine_matches_single_device(tiny, rng, grad_mode):
    config, params = tiny
    batches = _batches(config, rng)
    cfg = GraspConfig(num_prune_layers=2, compression_ratio=0.5, metric="taylor",
                      grad_mode=grad_mode)

    single = GraspEngine(jax.tree.map(jnp.array, params), config)
    single.run(batches, cfg)

    mesh = make_mesh((4, 2))
    meshed = GraspEngine(jax.tree.map(jnp.array, params), config, mesh=mesh)
    meshed.run(batches, cfg)

    assert meshed.redundant_layers == single.redundant_layers
    assert meshed.rank_dict == single.rank_dict
    assert set(meshed.indices_log) == set(single.indices_log)
    for name in single.indices_log:
        np.testing.assert_array_equal(
            meshed.indices_log[name], single.indices_log[name],
            err_msg=f"selected indices diverged for {name}",
        )

    # compiled models agree numerically
    ids = jnp.asarray(rng.integers(0, config.vocab_size, size=(4, 16)))
    ref = np.asarray(forward(single.params, ids, config=config, plan=single.plan)["logits"])
    got = np.asarray(forward(meshed.params, ids, config=config, plan=meshed.plan)["logits"])
    assert meshed.plan == single.plan
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_mesh_engine_parallel_sweep(tiny, rng):
    """The one-sweep fast path also runs mesh-parallel."""
    config, params = tiny
    batches = _batches(config, rng)
    cfg = GraspConfig(num_prune_layers=1, compression_ratio=0.4, sweep="parallel")

    single = GraspEngine(jax.tree.map(jnp.array, params), config)
    single.run(batches, cfg)

    mesh = make_mesh((8, 1))
    meshed = GraspEngine(jax.tree.map(jnp.array, params), config, mesh=mesh)
    meshed.run(batches, cfg)

    assert meshed.rank_dict == single.rank_dict
    for name in single.indices_log:
        np.testing.assert_array_equal(meshed.indices_log[name], single.indices_log[name])


def test_mesh_engine_nondivisible_batch_replicates(tiny, rng):
    """Rows not divisible by dp: batch replicates, pipeline still completes."""
    config, params = tiny
    batches = _batches(config, rng, n=1, rows=3)
    mesh = make_mesh((4, 2))
    engine = GraspEngine(jax.tree.map(jnp.array, params), config, mesh=mesh)
    engine.run(batches, GraspConfig(num_prune_layers=1, compression_ratio=0.4))
    assert engine.rank_dict


def test_sharded_device_svd_bit_identical(rng):
    """svd(method="device") sharded over the mesh == unsharded, bit for bit."""
    from grasp_tpu.ops.svd import svd

    w = jnp.asarray(rng.normal(size=(7, 24, 40)), jnp.float32)  # 7 pads to 8
    u0, s0, vh0 = svd(w, method="device")
    mesh = make_mesh((4, 2))
    u1, s1, vh1 = svd(w, method="device", mesh=mesh)
    np.testing.assert_array_equal(np.asarray(u1), np.asarray(u0))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s0))
    np.testing.assert_array_equal(np.asarray(vh1), np.asarray(vh0))
