"""Ring attention (context parallelism) tests on the virtual 8-device mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from grasp_tpu.models.llama import _attention, _causal_mask
from grasp_tpu.parallel.ring_attention import context_parallel_attention


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.asarray(jax.devices()).reshape(8), ("data",))


def _reference(q, k, v, groups, causal=True):
    s = q.shape[2]
    mask = _causal_mask(s, s, 0) if causal else None
    return _attention(q, k, v, mask, groups)


def test_ring_matches_reference_causal(mesh, rng):
    b, nh, nkv, s, hd = 2, 4, 4, 64, 16  # 8 tokens per device
    q = jnp.asarray(rng.standard_normal((b, nh, s, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, nkv, s, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, nkv, s, hd)), jnp.float32)
    got = context_parallel_attention(q, k, v, mesh)
    ref = _reference(q, k, v, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_ring_matches_reference_gqa(mesh, rng):
    b, nh, nkv, s, hd = 1, 8, 2, 32, 8
    q = jnp.asarray(rng.standard_normal((b, nh, s, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, nkv, s, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, nkv, s, hd)), jnp.float32)
    got = context_parallel_attention(q, k, v, mesh, num_kv_groups=nh // nkv)
    ref = _reference(q, k, v, nh // nkv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_ring_non_causal(mesh, rng):
    b, nh, s, hd = 1, 2, 40, 8
    q = jnp.asarray(rng.standard_normal((b, nh, s, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, nh, s, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, nh, s, hd)), jnp.float32)
    got = context_parallel_attention(q, k, v, mesh, causal=False)
    ref = _reference(q, k, v, 1, causal=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_ring_under_jit(mesh, rng):
    b, nh, s, hd = 1, 2, 16, 8
    q = jnp.asarray(rng.standard_normal((b, nh, s, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, nh, s, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, nh, s, hd)), jnp.float32)
    f = jax.jit(lambda q, k, v: context_parallel_attention(q, k, v, mesh))
    np.testing.assert_allclose(
        np.asarray(f(q, k, v)), np.asarray(_reference(q, k, v, 1)), rtol=2e-4, atol=2e-5
    )
