"""SVD / low-rank compilation tests: exactness, fusion parity vs reference."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference")

import jax.numpy as jnp
import torch

from grasp_tpu.ops.lowrank import lowrank_apply, svd_apply
from grasp_tpu.ops.svd import lowrank_factors, merge_svd, svd, truncate_svd


def test_full_rank_reconstruction_exact(rng):
    w = rng.standard_normal((48, 32)).astype(np.float32)
    u, s, vh = svd(jnp.asarray(w), method="device")
    rec = np.asarray(merge_svd(u, s, vh))
    np.testing.assert_allclose(rec, w, rtol=1e-4, atol=1e-5)


def test_host_and_device_svd_agree_on_singular_values(rng):
    w = rng.standard_normal((32, 48)).astype(np.float32)
    _, s_dev, _ = svd(jnp.asarray(w), method="device")
    _, s_host, _ = svd(jnp.asarray(w), method="host")
    np.testing.assert_allclose(np.asarray(s_dev), np.asarray(s_host), rtol=1e-4, atol=1e-5)


def test_batched_svd_nonsquare_gqa_shapes(rng):
    # k_proj of a GQA model: [kv_dim, hidden] non-square (SURVEY.md §2 table)
    ws = rng.standard_normal((4, 16, 64)).astype(np.float32)
    u, s, vh = svd(jnp.asarray(ws), method="device")
    rec = np.asarray(merge_svd(u, s, vh))
    np.testing.assert_allclose(rec, ws, rtol=1e-4, atol=1e-5)
    assert u.shape == (4, 16, 16) and s.shape == (4, 16) and vh.shape == (4, 16, 64)


def test_singular_values_match_torch(rng):
    w = rng.standard_normal((40, 24)).astype(np.float32)
    _, s_ours, _ = svd(jnp.asarray(w), method="host")
    _, s_torch, _ = torch.linalg.svd(torch.from_numpy(w), full_matrices=False)
    np.testing.assert_allclose(np.asarray(s_ours), s_torch.numpy(), rtol=1e-4, atol=1e-5)


def test_truncate_preserves_index_order(rng):
    w = rng.standard_normal((16, 16)).astype(np.float32)
    u, s, vh = svd(jnp.asarray(w), method="host")
    idx = jnp.asarray([5, 2, 9])
    ut, st, vht = truncate_svd(u, s, vh, idx)
    np.testing.assert_array_equal(np.asarray(st), np.asarray(s)[[5, 2, 9]])
    np.testing.assert_array_equal(np.asarray(ut), np.asarray(u)[:, [5, 2, 9]])
    np.testing.assert_array_equal(np.asarray(vht), np.asarray(vh)[[5, 2, 9], :])


def test_lowrank_factors_match_reference_svdlinear(rng):
    """sigma_fuse='UV' fusion must match reference SVDLinear weight init."""
    import modeling_grasp as ref_mod

    w = rng.standard_normal((24, 40)).astype(np.float32)
    u, s, vh = torch.linalg.svd(torch.from_numpy(w), full_matrices=False)
    keep = [0, 3, 7, 1]
    u_k, s_k, vh_k = u[:, keep], s[keep], vh[keep, :]

    ref_layer = ref_mod.SVDLinear(U=u_k, S=s_k, Vh=vh_k, bias=None, sigma_fuse="UV")
    in_kernel, out_kernel = lowrank_factors(
        jnp.asarray(u_k.numpy()), jnp.asarray(s_k.numpy()), jnp.asarray(vh_k.numpy()), "UV"
    )
    # reference InLinear.weight = sqrt(S) * Vh  ([r, in]); ours is its transpose
    np.testing.assert_allclose(
        np.asarray(in_kernel), ref_layer.InLinear.weight.detach().numpy().T, rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out_kernel), ref_layer.OutLinear.weight.detach().numpy().T, rtol=1e-5, atol=1e-6
    )

    # end-to-end forward parity
    x = rng.standard_normal((2, 3, 40)).astype(np.float32)
    y_ref = ref_layer(torch.from_numpy(x)).detach().numpy()
    y_ours = np.asarray(lowrank_apply(jnp.asarray(x), in_kernel, out_kernel))
    np.testing.assert_allclose(y_ours, y_ref, rtol=1e-4, atol=1e-5)


def test_svd_apply_matches_reference_grasplayer(rng):
    """Trainable-S forward (no W materialization) == reference GRASPLayer."""
    import modeling_grasp as ref_mod

    w = rng.standard_normal((24, 40)).astype(np.float32)
    u, s, vh = torch.linalg.svd(torch.from_numpy(w), full_matrices=False)
    ref_layer = ref_mod.GRASPLayer(U=u, S=s, Vh=vh, bias=None, compression_ratio=None)

    x = rng.standard_normal((2, 3, 40)).astype(np.float32)
    y_ref = ref_layer(torch.from_numpy(x)).detach().numpy()
    y_ours = np.asarray(
        svd_apply(jnp.asarray(x), jnp.asarray(u.numpy()), jnp.asarray(s.numpy()), jnp.asarray(vh.numpy()))
    )
    np.testing.assert_allclose(y_ours, y_ref, rtol=1e-4, atol=1e-5)


def test_svd_apply_gradient_wrt_s_matches_torch(rng):
    """dL/dS of our factored forward == torch autograd through W = U diag(S) Vh."""
    import jax

    w = rng.standard_normal((16, 20)).astype(np.float32)
    u_t, s_t, vh_t = torch.linalg.svd(torch.from_numpy(w), full_matrices=False)
    x = rng.standard_normal((2, 4, 20)).astype(np.float32)

    # torch: reconstruct W and take loss = sum(y^2)
    s_param = s_t.clone().requires_grad_(True)
    w_rec = u_t @ torch.diag(s_param) @ vh_t
    y = torch.from_numpy(x).reshape(-1, 20) @ w_rec.t()
    loss = (y ** 2).sum()
    loss.backward()
    grad_torch = s_param.grad.numpy()

    def loss_fn(s):
        y = svd_apply(jnp.asarray(x), jnp.asarray(u_t.numpy()), s, jnp.asarray(vh_t.numpy()))
        return jnp.sum(y ** 2)

    grad_ours = np.asarray(jax.grad(loss_fn)(jnp.asarray(s_t.numpy())))
    np.testing.assert_allclose(grad_ours, grad_torch, rtol=1e-3, atol=1e-3)


def test_merge_mode_matches_reference_compile(rng):
    w = rng.standard_normal((16, 16)).astype(np.float32)
    u, s, vh = torch.linalg.svd(torch.from_numpy(w), full_matrices=False)
    keep = [0, 1, 2, 5]
    w_ref = (u[:, keep] @ torch.diag(s[keep]) @ vh[keep, :]).numpy()
    w_ours = np.asarray(
        merge_svd(jnp.asarray(u[:, keep].numpy()), jnp.asarray(s[keep].numpy()), jnp.asarray(vh[keep, :].numpy()))
    )
    np.testing.assert_allclose(w_ours, w_ref, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# Gram-eigh SVD (the TPU auto path for large matrices)
# ---------------------------------------------------------------------------


def _spectrum_matrix(rng, out_f, in_f, decay=0.9):
    """A matrix with a known well-separated geometric spectrum (avoids the
    tie-flakiness of raw gaussian matrices whose spectra cluster)."""
    k = min(out_f, in_f)
    a = rng.normal(size=(out_f, k)).astype(np.float32)
    b = rng.normal(size=(k, in_f)).astype(np.float32)
    u, _ = np.linalg.qr(a)
    vt, _ = np.linalg.qr(b.T)
    s = decay ** np.arange(k, dtype=np.float32)
    return (u * s) @ vt.T, s


@pytest.mark.parametrize("shape", [(48, 80), (80, 48), (64, 64)])
def test_gram_svd_top_singulars_match_exact(rng, shape):
    w, s_true = _spectrum_matrix(rng, *shape)
    u, s, vh = svd(jnp.asarray(w), method="gram")
    k = len(s_true) // 2  # GRASP keeps the top of the spectrum
    np.testing.assert_allclose(np.asarray(s)[:k], s_true[:k], rtol=1e-3)
    # truncated reconstruction matches the exact-SVD truncation
    ue, se, vhe = svd(jnp.asarray(w), method="device")
    rec_g = (np.asarray(u)[:, :k] * np.asarray(s)[:k]) @ np.asarray(vh)[:k]
    rec_e = (np.asarray(ue)[:, :k] * np.asarray(se)[:k]) @ np.asarray(vhe)[:k]
    np.testing.assert_allclose(rec_g, rec_e, rtol=2e-3, atol=2e-3)


def test_gram_svd_selects_same_indices_as_exact(rng):
    """The saliency top-k selection (what GRASP actually consumes) is
    identical between the gram and exact factorizations."""
    from grasp_tpu.ops.saliency import select_topk, svd_saliency
    from grasp_tpu.ops.svd import sigma_gradients

    w, _ = _spectrum_matrix(rng, 96, 64)
    grad_w = jnp.asarray(rng.normal(size=w.shape).astype(np.float32))
    k = 20
    idx = {}
    for method in ("device", "gram"):
        u, s, vh = svd(jnp.asarray(w), method=method)
        sal = svd_saliency(sigma_gradients(u, vh, grad_w), s, "taylor")
        idx[method] = np.asarray(select_topk(sal, k))
    np.testing.assert_array_equal(idx["gram"], idx["device"])


def test_gram_svd_batched(rng):
    w0, _ = _spectrum_matrix(rng, 40, 56)
    w1, _ = _spectrum_matrix(rng, 40, 56)
    u, s, vh = svd(jnp.stack([jnp.asarray(w0), jnp.asarray(w1)]), method="gram")
    for i, w in enumerate((w0, w1)):
        rec = (np.asarray(u[i]) * np.asarray(s[i])) @ np.asarray(vh[i])
        np.testing.assert_allclose(rec, w, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("shape", [(48, 80), (96, 64)])
def test_gram_device_svd_matches_gram(rng, shape):
    """Fully on-device Gram SVD (fp32 eigh): same saliency top-k selection as
    the host-eigh gram path and the exact factorization, plus truncated
    reconstruction parity — the validation gate for using gram_device on the
    7B bench shapes."""
    from grasp_tpu.ops.saliency import select_topk, svd_saliency
    from grasp_tpu.ops.svd import sigma_gradients

    w, s_true = _spectrum_matrix(rng, *shape)
    grad_w = jnp.asarray(rng.normal(size=w.shape).astype(np.float32))
    k = min(*shape) // 3
    idx = {}
    for method in ("device", "gram_device"):
        u, s, vh = svd(jnp.asarray(w), method=method)
        sal = svd_saliency(sigma_gradients(u, vh, grad_w), s, "taylor")
        idx[method] = np.asarray(select_topk(sal, k))
    np.testing.assert_array_equal(idx["gram_device"], idx["device"])

    u, s, vh = svd(jnp.asarray(w), method="gram_device")
    np.testing.assert_allclose(np.asarray(s)[:k], s_true[:k], rtol=1e-3)
    rec = (np.asarray(u)[:, :k] * np.asarray(s)[:k]) @ np.asarray(vh)[:k]
    ue, se, vhe = svd(jnp.asarray(w), method="device")
    rec_e = (np.asarray(ue)[:, :k] * np.asarray(se)[:k]) @ np.asarray(vhe)[:k]
    np.testing.assert_allclose(rec, rec_e, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("shape,metric", [
    ((48, 80), "taylor"), ((80, 48), "taylor"), ((64, 64), "taylor"),
    ((48, 80), "gradient"),
])
def test_ufree_gram_selection_matches_full(rng, shape, metric):
    """U-free gram selection (|diag(B^T (W^T G) B)| with u_i = W v_i / s_i
    substituted — no large-factor materialization) picks the same top-k as
    the full-SVD saliency path, and its truncated product reconstructs the
    same low-rank matrix. This is the gate for the 7B select path."""
    from grasp_tpu.ops.saliency import select_topk, svd_saliency
    from grasp_tpu.ops.svd import (
        gram_basis,
        sigma_gradients,
        ufree_sigma_saliency,
        ufree_truncate,
    )

    w, _ = _spectrum_matrix(rng, *shape)
    grad_w = jnp.asarray(rng.normal(size=w.shape).astype(np.float32))
    k = min(*shape) // 3

    u, s, vh = svd(jnp.asarray(w), method="device")
    sal_full = svd_saliency(sigma_gradients(u, vh, grad_w), s, metric)
    idx_full = np.asarray(select_topk(sal_full, k))

    s2, basis, side = gram_basis(jnp.asarray(w))
    sal = ufree_sigma_saliency(jnp.asarray(w), grad_w, s2, basis, side, metric)
    idx = np.asarray(select_topk(sal, k))
    np.testing.assert_array_equal(idx, idx_full)

    ut, st, vht = ufree_truncate(jnp.asarray(w), s2, basis, side, jnp.asarray(idx))
    assert ut.shape == (shape[0], k) and vht.shape == (k, shape[1])
    rec = (np.asarray(ut) * np.asarray(st)) @ np.asarray(vht)
    uf, sf, vhf = truncate_svd(u, s, vh, jnp.asarray(idx_full))
    rec_full = (np.asarray(uf) * np.asarray(sf)) @ np.asarray(vhf)
    np.testing.assert_allclose(rec, rec_full, rtol=2e-3, atol=2e-3)
    # orthonormality of the reconstructed thin factor
    large = np.asarray(ut) if side == "v" else np.asarray(vht).T
    np.testing.assert_allclose(large.T @ large, np.eye(k), atol=2e-3)

    # the fused kernel-layout path (what the engine dispatches at 7B:
    # native [in, out] kernel, transpose/cast in-graph, one primed jit)
    # must agree with the eager torch-layout reference above
    from grasp_tpu.ops.svd import ufree_select, ufree_truncate_kernel

    kernel = jnp.asarray(w).T  # jax [in, out] layout
    s3, basis3, side3, sal3 = ufree_select(kernel, grad_w.T, metric)
    assert side3 == side
    np.testing.assert_allclose(np.asarray(s3), np.asarray(s2), rtol=1e-5, atol=1e-5)
    idx3 = np.asarray(select_topk(sal3, k))
    np.testing.assert_array_equal(idx3, idx_full)
    ut3, st3, vht3 = ufree_truncate_kernel(kernel, s3, basis3, side3, jnp.asarray(idx3))
    rec3 = (np.asarray(ut3) * np.asarray(st3)) @ np.asarray(vht3)
    np.testing.assert_allclose(rec3, rec_full, rtol=2e-3, atol=2e-3)
