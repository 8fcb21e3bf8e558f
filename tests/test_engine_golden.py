"""Golden end-to-end parity: our GraspEngine vs the reference GRASP pipeline.

The reference (read-only at /root/reference) is executed on a tiny random-init
HF Llama on CPU with synthetic calibration data; our engine runs on identical
weights/data. BI scores, redundant-layer choice, selected singular indices,
compiled low-rank factors, and final logits must agree (fp32 tolerance —
BASELINE.json acceptance gate).
"""

import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, "/root/reference")

import jax
import jax.numpy as jnp
from transformers import LlamaConfig, LlamaForCausalLM

import modeling_grasp as ref_mod
from grasp_tpu.configs import GraspConfig
from grasp_tpu.core.engine import GraspEngine, module_name
from grasp_tpu.models.hf_io import config_from_hf, params_from_state_dict
from grasp_tpu.models.llama import forward

torch.manual_seed(0)

HF_CFG = dict(
    vocab_size=128,
    hidden_size=48,
    intermediate_size=128,
    num_hidden_layers=4,
    num_attention_heads=4,
    num_key_value_heads=2,
    max_position_embeddings=128,
    rms_norm_eps=1e-5,
    tie_word_embeddings=False,
)
SEQ, NBATCH, BATCH = 16, 4, 2


def make_batches(rng):
    """Synthetic calibration batches with the reference's pre-shift quirk
    (dataset/loader.py:33-36): input=seq[:-1], labels=seq[1:]."""
    seqs = rng.integers(0, HF_CFG["vocab_size"], size=(NBATCH, BATCH, SEQ))
    return [{"input_ids": s[:, :-1], "labels": s[:, 1:]} for s in seqs]


class _ListLoader:
    """Minimal stand-in for torch DataLoader over dict batches."""

    def __init__(self, batches, to_torch):
        self.batches = batches
        self.to_torch = to_torch

    def __iter__(self):
        for b in self.batches:
            if self.to_torch:
                yield {k: torch.from_numpy(np.asarray(v)) for k, v in b.items()}
            else:
                yield {k: jnp.asarray(v) for k, v in b.items()}

    def __len__(self):
        return len(self.batches)


@pytest.fixture(scope="module")
def setup():
    # local deterministic rng: the shared session rng's state depends on test
    # execution order, and data-dependent fp ties at the top-k boundary would
    # make exact-index parity flaky
    rng = np.random.default_rng(1234)
    hf_model = LlamaForCausalLM(LlamaConfig(**HF_CFG)).eval().float()
    config = config_from_hf(hf_model.config)
    params = jax.tree.map(jnp.asarray, params_from_state_dict(hf_model.state_dict(), config))
    batches = make_batches(rng)
    return hf_model, config, params, batches


def run_reference(hf_model, batches, num_prune=2, ratio=0.2, metric="taylor", merge=False,
                  threshold_ratio=None):
    """Drive the reference pipeline exactly as grasp.py main() does (:61-126)."""
    import copy

    gm = ref_mod.GRASPModel(model=copy.deepcopy(hf_model))
    loader = _ListLoader(batches, to_torch=True)
    importances, layers_id = gm.compute_bi(
        num_prune_layers=num_prune, calibration_dataloader=loader, angular=False, device="cpu"
    )
    gm.redundant_layers = layers_id
    layers_id = sorted(layers_id, reverse=True)
    indices_log = {}
    for layer_id in layers_id:
        for block_type, targets in (
            ("mlp", ["down_proj", "up_proj", "gate_proj"]),
            ("attention", ["q_proj", "k_proj", "v_proj", "o_proj"]),
        ):
            skip = gm.compress_block(layer_id=layer_id, block_type=block_type,
                                     target_layer_types=targets, device="cpu")
            if skip:
                continue
            grads = gm.get_svdlayer_gradients(loader, "cpu")
            idx = gm.dynamic_svd_selection(
                grads, metric=metric, compression_ratio=ratio, threshold_ratio=threshold_ratio
            )
            # reference returns torch tensors (topk mode) or python lists (adaptive)
            indices_log.update({
                k: (v.detach().numpy().copy() if hasattr(v, "detach") else np.asarray(v))
                for k, v in idx.items()
            })
            gm.compile_grasp_model(idx, merge=merge, device="cpu")
    return gm, importances, gm.redundant_layers, indices_log


def run_ours(config, params, batches, num_prune=2, ratio=0.2, metric="taylor", merge=False,
             threshold_ratio=None, sweep="sequential", grad_mode="svd",
             sweep_chunk_layers=None):
    import copy

    engine = GraspEngine(jax.tree.map(jnp.asarray, copy.deepcopy(jax.tree.map(np.asarray, params))), config)
    jbatches = [{k: jnp.asarray(v) for k, v in b.items()} for b in batches]
    cfg = GraspConfig(
        layers_id=None, num_prune_layers=num_prune, metric=metric,
        compression_ratio=ratio, threshold_ratio=threshold_ratio, merge=merge, sweep=sweep,
        grad_mode=grad_mode, sweep_chunk_layers=sweep_chunk_layers,
    )
    summary = engine.run(jbatches, cfg)
    return engine, summary


@pytest.fixture(scope="module")
def golden(setup):
    hf_model, config, params, batches = setup
    ref = run_reference(hf_model, batches)
    ours = run_ours(config, params, batches)
    return ref, ours


def test_dense_grad_mode_indices_match_reference(setup, golden):
    """The dense-gradient fast path (dL/ds_i = u_i^T dL/dW v_i, SVD overlapped
    with the sweep) must select the same indices as the reference pipeline."""
    hf_model, config, params, batches = setup
    (_, _, _, ref_idx), _ = golden
    engine, _ = run_ours(config, params, batches, grad_mode="dense")
    assert set(ref_idx) == set(engine.indices_log)
    for name in ref_idx:
        np.testing.assert_array_equal(engine.indices_log[name], ref_idx[name], err_msg=name)


def test_dense_parallel_sweep_selects_sane_ranks(setup):
    """Parallel one-sweep mode: documented divergence from sequential order,
    but ranks and structure must be identical and the model must stay sound."""
    hf_model, config, params, batches = setup
    eng_seq, _ = run_ours(config, params, batches, grad_mode="dense")
    eng_par, _ = run_ours(config, params, batches, grad_mode="dense", sweep="parallel")
    assert eng_seq.rank_dict == eng_par.rank_dict
    assert set(eng_seq.indices_log) == set(eng_par.indices_log)
    ids = np.arange(10)[None, :] % config.vocab_size
    out = forward(eng_par.params, jnp.asarray(ids), config=config, plan=eng_par.plan)
    assert bool(jnp.isfinite(out["logits"]).all())


def test_dense_parallel_chunked_sweep(setup):
    """sweep_chunk_layers bounds the fast path's grad-accumulator residency
    (engine._sweep_chunks). chunk >= n_layers must take the identical one-
    sweep code path (bit-exact indices); chunk=1 sweeps per layer — later
    chunks see earlier compressions, so semantics tighten toward sequential:
    ranks/structure identical, selected indices may differ, model sound."""
    hf_model, config, params, batches = setup
    eng_one, _ = run_ours(config, params, batches, grad_mode="dense",
                          sweep="parallel", sweep_chunk_layers=0)
    eng_big, _ = run_ours(config, params, batches, grad_mode="dense",
                          sweep="parallel", sweep_chunk_layers=99)
    assert set(eng_one.indices_log) == set(eng_big.indices_log)
    for name in eng_one.indices_log:
        np.testing.assert_array_equal(
            eng_big.indices_log[name], eng_one.indices_log[name], err_msg=name)

    eng_c1, _ = run_ours(config, params, batches, grad_mode="dense",
                         sweep="parallel", sweep_chunk_layers=1)
    assert eng_c1.rank_dict == eng_one.rank_dict
    assert set(eng_c1.indices_log) == set(eng_one.indices_log)
    ids = np.arange(10)[None, :] % config.vocab_size
    out = forward(eng_c1.params, jnp.asarray(ids), config=config, plan=eng_c1.plan)
    assert bool(jnp.isfinite(out["logits"]).all())


def test_bi_importances_match(golden):
    (_, ref_imp, _, _), (engine, _) = golden
    np.testing.assert_allclose(
        np.asarray(engine.layer_importances)[: len(ref_imp)], ref_imp, rtol=1e-4, atol=1e-5
    )


def test_redundant_layers_match(golden):
    (_, _, ref_layers, _), (engine, _) = golden
    assert sorted(engine.redundant_layers) == sorted(ref_layers)


def test_selected_indices_match(golden):
    (_, _, _, ref_idx), (engine, _) = golden
    assert set(ref_idx) == set(engine.indices_log), "module coverage differs"
    for name in ref_idx:
        np.testing.assert_array_equal(
            engine.indices_log[name], ref_idx[name], err_msg=f"indices differ for {name}"
        )


def _sign_normalize(in_k, out_k):
    """SVD factors are unique only up to a per-triplet sign flip (U[:,j], Vh[j,:])
    -> canonicalize by making each rank component's largest-|.| in_kernel entry
    positive, flipping the paired out_kernel row to preserve the product."""
    flat = np.argmax(np.abs(in_k), axis=0)
    signs = np.sign(in_k[flat, np.arange(in_k.shape[1])])
    signs[signs == 0] = 1.0
    return in_k * signs[None, :], out_k * signs[:, None]


def test_compiled_lowrank_factors_match(golden):
    (gm, _, _, _), (engine, _) = golden
    for name in engine.rank_dict:
        ref_layer = gm.model.get_submodule(name)
        ref_in = ref_layer.InLinear.weight.detach().numpy().T
        ref_out = ref_layer.OutLinear.weight.detach().numpy().T
        our_in = np.asarray(engine._get_proj(name)["in_kernel"])
        our_out = np.asarray(engine._get_proj(name)["out_kernel"])

        # the low-rank operator itself must match exactly
        np.testing.assert_allclose(
            our_in @ our_out, ref_in @ ref_out, rtol=1e-3, atol=1e-4, err_msg=f"product {name}"
        )
        # individual factors match after canonicalizing the arbitrary SVD signs
        a_in, a_out = _sign_normalize(our_in, our_out)
        b_in, b_out = _sign_normalize(ref_in, ref_out)
        np.testing.assert_allclose(a_in, b_in, rtol=1e-3, atol=1e-4, err_msg=f"in_kernel {name}")
        np.testing.assert_allclose(a_out, b_out, rtol=1e-3, atol=1e-4, err_msg=f"out_kernel {name}")


def test_compressed_logits_match(golden, rng):
    (gm, _, _, _), (engine, _) = golden
    ids = rng.integers(0, HF_CFG["vocab_size"], size=(2, 11))
    with torch.no_grad():
        ref_logits = gm.model(torch.from_numpy(ids)).logits.numpy()
    got = np.asarray(
        forward(engine.params, jnp.asarray(ids), config=engine.config, plan=engine.plan)["logits"]
    )
    np.testing.assert_allclose(got, ref_logits, rtol=2e-3, atol=2e-3)


def test_param_reduction(golden, setup):
    _, config, params, _ = setup
    (_, ours) = golden[1], golden[1]
    engine, summary = golden[1]
    orig = sum(x.size for x in jax.tree.leaves(params))
    now = sum(x.size for x in jax.tree.leaves(engine.params))
    assert now < orig
    assert summary["rank_dict"], "rank_dict should be populated"


def test_merge_mode_matches_reference(setup):
    hf_model, config, params, batches = setup
    gm, _, _, _ = run_reference(hf_model, batches, merge=True)
    engine, _ = run_ours(config, params, batches, merge=True)
    for name, k in engine.rank_dict.items():
        ref_w = gm.model.get_submodule(name).weight.detach().numpy()
        ours_w = np.asarray(engine._get_proj(name)["kernel"]).T
        np.testing.assert_allclose(ours_w, ref_w, rtol=1e-3, atol=1e-4, err_msg=name)


def test_reference_angular_bi_is_broken():
    """Document a reference bug: compute_bi(angular=True) ALWAYS crashes with
    UnboundLocalError — `num_prune_layers = 1` inside compute_bi_hiddens
    (modeling_grasp.py:151-152) makes the name function-local, so the angular
    branch reads it unassigned (:154). Angular mode is therefore unusable in
    the reference; we implement the *intended* ShortGPT semantics instead
    (validated below and in test_saliency.py)."""
    import copy

    hf_model = LlamaForCausalLM(LlamaConfig(**HF_CFG)).eval().float()
    gm = ref_mod.GRASPModel(model=copy.deepcopy(hf_model))
    loader = _ListLoader(make_batches(np.random.default_rng(0)), to_torch=True)
    with pytest.raises(UnboundLocalError):
        gm.compute_bi(num_prune_layers=2, calibration_dataloader=loader,
                      angular=True, device="cpu")


def test_angular_bi_intended_semantics(setup):
    """Angular BI vs a faithful inline fix of the reference loop
    (modeling_grasp.py:150-193 with the scoping bug corrected): last-token-only
    angular distance between h[i] and h[i+n], contiguous-window argmin."""
    hf_model, config, params, batches = setup
    import tools.utils_func as ref_utils
    import torch as _torch

    n = 2
    n_layers = config.num_hidden_layers
    ref_imp = [0.0] * n_layers
    with _torch.no_grad():
        for b in batches:
            out = hf_model(_torch.from_numpy(np.asarray(b["input_ids"])), output_hidden_states=True)
            hiddens = out.hidden_states
            for i in range(len(hiddens) - n):
                ref_imp[i] += ref_utils.block_influence(
                    hiddens[i][:, -1:], hiddens[i + n][:, -1:], angular=True
                ).mean().item()
    start = int(np.argsort(np.array(ref_imp[: -n + 1]))[0])
    ref_layers = list(range(start, start + n))

    engine = GraspEngine(jax.tree.map(jnp.asarray, params), config)
    jbatches = [{k: jnp.asarray(v) for k, v in b.items()} for b in batches]
    imp, layers = engine.compute_bi(n, jbatches, angular=True)
    np.testing.assert_allclose(np.asarray(imp)[: len(ref_imp) - n], ref_imp[:-n], rtol=1e-4, atol=1e-5)
    assert list(layers) == ref_layers


def test_mistral_gqa_shapes_end_to_end(rng):
    """GQA (num_kv_heads < num_heads) exercises non-square batched SVD shapes
    (BASELINE.json config 3) — full pipeline parity vs the reference."""
    hf_cfg = dict(HF_CFG)
    hf_cfg.update(hidden_size=64, num_attention_heads=8, num_key_value_heads=2,
                  intermediate_size=96, num_hidden_layers=3)
    hf_model = LlamaForCausalLM(LlamaConfig(**hf_cfg)).eval().float()
    config = config_from_hf(hf_model.config)
    assert config.kv_dim != config.hidden_size  # genuinely non-square k/v
    params = jax.tree.map(jnp.asarray, params_from_state_dict(hf_model.state_dict(), config))
    batches = make_batches(rng)

    _, _, ref_layers, ref_idx = run_reference(hf_model, batches, num_prune=1, ratio=0.3)
    engine, _ = run_ours(config, params, batches, num_prune=1, ratio=0.3, grad_mode="dense")
    assert sorted(engine.redundant_layers) == sorted(ref_layers)
    for name in ref_idx:
        np.testing.assert_array_equal(engine.indices_log[name], ref_idx[name], err_msg=name)


def test_adaptive_threshold_mode_matches_reference(setup):
    hf_model, config, params, batches = setup
    _, _, _, ref_idx = run_reference(hf_model, batches, ratio=None, threshold_ratio=0.6)
    engine, _ = run_ours(config, params, batches, ratio=None, threshold_ratio=0.6)
    for name in ref_idx:
        np.testing.assert_array_equal(engine.indices_log[name], ref_idx[name], err_msg=name)
