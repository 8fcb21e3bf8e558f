"""Math-core golden tests: block influence, rank selection vs the reference.

The reference implementation (read-only at /root/reference) is imported and
executed on CPU torch to produce golden outputs; our JAX implementations must
match to fp32 tolerance (SURVEY.md §4 acceptance gate).
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference")

import jax.numpy as jnp
import torch

from grasp_tpu.ops.saliency import (
    adaptive_rank_selection,
    bi_from_hiddens,
    block_influence,
    choose_prune_layers,
    preserve_rank,
    select_topk,
    svd_saliency,
)

ref_utils = pytest.importorskip("tools.utils_func")


def test_block_influence_matches_reference(rng):
    x = rng.standard_normal((2, 8, 16)).astype(np.float32)
    y = rng.standard_normal((2, 8, 16)).astype(np.float32)

    ours = np.asarray(block_influence(jnp.asarray(x), jnp.asarray(y)))
    theirs = ref_utils.block_influence(torch.from_numpy(x), torch.from_numpy(y)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_block_influence_angular_matches_reference(rng):
    x = rng.standard_normal((2, 8, 16)).astype(np.float32)
    y = rng.standard_normal((2, 8, 16)).astype(np.float32)

    ours = np.asarray(block_influence(jnp.asarray(x), jnp.asarray(y), angular=True))
    theirs = ref_utils.block_influence(torch.from_numpy(x), torch.from_numpy(y), angular=True).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


def test_block_influence_nan_guard():
    # a zero row produces nan cosine -> mapped to 0.5 (reference :20)
    x = np.zeros((1, 2, 4), dtype=np.float32)
    y = np.ones((1, 2, 4), dtype=np.float32)
    ours = np.asarray(block_influence(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(ours, 0.5)


def test_bi_from_hiddens_equals_per_layer_loop(rng):
    hiddens = [rng.standard_normal((2, 6, 16)).astype(np.float32) for _ in range(5)]
    ours = np.asarray(bi_from_hiddens([jnp.asarray(h) for h in hiddens]))
    # emulate the reference loop (modeling_grasp.py:150-167)
    expect = []
    for i in range(len(hiddens) - 1):
        expect.append(
            ref_utils.block_influence(
                torch.from_numpy(hiddens[i]), torch.from_numpy(hiddens[i + 1])
            ).mean().item()
        )
    np.testing.assert_allclose(ours, expect, rtol=1e-5, atol=1e-6)


def test_bi_angular_last_token_only(rng):
    hiddens = [rng.standard_normal((2, 6, 16)).astype(np.float32) for _ in range(6)]
    n = 2
    ours = np.asarray(bi_from_hiddens([jnp.asarray(h) for h in hiddens], num_prune_layers=n, angular=True))
    expect = []
    for i in range(len(hiddens) - n):
        expect.append(
            ref_utils.block_influence(
                torch.from_numpy(hiddens[i][:, -1:]),
                torch.from_numpy(hiddens[i + n][:, -1:]),
                angular=True,
            ).mean().item()
        )
    np.testing.assert_allclose(ours, expect, rtol=1e-5, atol=1e-5)


def test_choose_prune_layers_non_angular():
    imp = [0.5, 0.1, 0.9, 0.05, 0.3]
    assert choose_prune_layers(imp, 2) == [3, 1]


def test_choose_prune_layers_angular_window():
    imp = [0.5, 0.1, 0.05, 0.9, 0.3]
    # windows scored at start indices 0..3 (n=2); argmin over [:-1] of imp
    assert choose_prune_layers(imp, 2, angular=True) == [2, 3]


def test_preserve_rank_formula():
    # reference modeling_grasp.py:311-317
    assert preserve_rank(4096, 4096, 0.9) == int(4096 * 4096 * 0.1 / 8192)
    assert preserve_rank(4096, 11008, 0.8) == int(4096 * 11008 * 0.2 / (4096 + 11008))


def test_adaptive_rank_selection_matches_reference(rng):
    imp = np.abs(rng.standard_normal(64)).astype(np.float32)
    ours = adaptive_rank_selection(imp, 0.7)
    theirs = ref_utils.adaptive_rank_selection([float(v) for v in imp], 0.7)
    assert ours == theirs


def test_adaptive_rank_selection_full_mass():
    imp = np.array([1.0, 1.0, 1.0, 1.0])
    assert adaptive_rank_selection(imp, 1.0) == [0, 1, 2, 3]
    assert adaptive_rank_selection(imp, 0.25) == [0]


def test_select_topk_matches_torch_topk(rng):
    imp = np.abs(rng.standard_normal(256)).astype(np.float32)
    ours = np.asarray(select_topk(jnp.asarray(imp), 32))
    _, theirs = torch.topk(torch.from_numpy(imp), k=32)
    np.testing.assert_array_equal(ours, theirs.numpy())


def test_svd_saliency_metrics(rng):
    g = rng.standard_normal(16).astype(np.float32)
    s = np.abs(rng.standard_normal(16)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(svd_saliency(jnp.asarray(g), jnp.asarray(s), "gradient")), np.abs(g), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(svd_saliency(jnp.asarray(g), jnp.asarray(s), "taylor")), np.abs(g * s), rtol=1e-6)
    with pytest.raises(ValueError):
        svd_saliency(jnp.asarray(g), jnp.asarray(s), "bogus")
