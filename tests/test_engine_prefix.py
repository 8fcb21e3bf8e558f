"""Prefix-split sequential sweeps: identical selection to monolithic graphs.

cfg.prefix starts every round's gradient graph at the lowest-redundant-layer
boundary (layers below it are never modified across sequential rounds —
reference grasp.py:75-126 compresses descending layer ids). "recompute" runs
the prefix per batch through a once-compiled fn; "cache" keeps the boundary
activations on device across rounds. Both must reproduce the monolithic
("off") pipeline exactly: same selected indices, same compiled factors.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from grasp_tpu.configs import GraspConfig, ModelConfig
from grasp_tpu.core.engine import GraspEngine
from grasp_tpu.models import init_params


@pytest.fixture(autouse=True)
def _loop_sweep(monkeypatch):
    """This module pins the per-batch LOOP path's prefix machinery; the fused
    one-dispatch sweep (tests/test_fused_sweep.py) recomputes the prefix
    inside its scan body and would bypass everything under test here."""
    monkeypatch.setenv("GRASP_FUSED_SWEEP", "0")


@pytest.fixture(scope="module")
def tiny():
    config = ModelConfig.tiny(num_hidden_layers=6, hidden_size=64, num_attention_heads=4,
                              num_key_value_heads=2, intermediate_size=128)
    params = init_params(jax.random.PRNGKey(0), config)
    return config, params


def _batches(config, n=2, rows=4, seq=17):
    rng = np.random.default_rng(7)
    out = []
    for _ in range(n):
        ids = rng.integers(0, config.vocab_size, size=(rows, seq))
        out.append({
            "input_ids": jnp.asarray(ids[:, :-1]),
            "labels": jnp.asarray(ids[:, 1:]),
        })
    return out


def _run(tiny, prefix, svd_method="auto"):
    config, params = tiny
    engine = GraspEngine(jax.tree.map(jnp.array, params), config, svd_method=svd_method)
    cfg = GraspConfig(layers_id=[5, 4], compression_ratio=0.5, metric="taylor",
                      grad_mode="dense", sweep="sequential", prefix=prefix)
    engine.run(_batches(config), cfg)
    return engine


@pytest.mark.parametrize("prefix", ["recompute", "cache", "cache_host"])
def test_prefix_split_matches_monolithic(tiny, prefix):
    base = _run(tiny, "off")
    split = _run(tiny, prefix)
    assert base.rank_dict == split.rank_dict
    assert set(base.indices_log) == set(split.indices_log)
    for name in base.indices_log:
        np.testing.assert_array_equal(
            base.indices_log[name], split.indices_log[name],
            err_msg=f"selected indices diverged for {name} under prefix={prefix}",
        )
    # compiled low-rank factors bit-identical (prefix computes the same
    # boundary values the monolithic graph computes inline)
    for li in (4, 5):
        for group in ("self_attn", "mlp"):
            for proj, mod in base.params["layers"][li][group].items():
                if "in_kernel" in mod:
                    other = split.params["layers"][li][group][proj]
                    np.testing.assert_allclose(
                        np.asarray(mod["in_kernel"]), np.asarray(other["in_kernel"]),
                        rtol=0, atol=0, err_msg=f"layer {li} {group}.{proj}",
                    )


def test_prefix_ufree_gram_device_matches(tiny):
    """The 7B execution shape: gram_device SVD + U-free selection + prefix
    split, vs the default pipeline — rank parity and index agreement (fp32
    gram vs LAPACK can differ on near-ties, so indices compare as SETS per
    module with >= 90% overlap; tiny random models have clustered spectra)."""
    base = _run(tiny, "off")
    dev = _run(tiny, "recompute", svd_method="gram_device")
    assert base.rank_dict == dev.rank_dict
    for name in base.indices_log:
        a = set(np.asarray(base.indices_log[name]).tolist())
        b = set(np.asarray(dev.indices_log[name]).tolist())
        overlap = len(a & b) / max(len(a), 1)
        assert overlap >= 0.9, f"{name}: index overlap {overlap:.2f}"


def test_parallel_precomputed_bases_match_sequential_single_round(tiny):
    """The fast path's precomputed-bases selection (gram eighs BEFORE the
    sweep, bases parked on host — engine._precompute_gram_bases) is the same
    math as the sequential after-sweep path: with a single (layer, block)
    round the two modes' sweeps see identical params, so selected indices
    and compiled factors must be BIT-identical (eigh is row-independent;
    bases don't depend on grads)."""
    config, params = tiny

    def run(sweep):
        engine = GraspEngine(jax.tree.map(jnp.array, params), config,
                             svd_method="gram_device")
        cfg = GraspConfig(layers_id=[5], compression_ratio=0.5, metric="taylor",
                          grad_mode="dense", sweep=sweep,
                          attn_target_layer_types=None)
        engine.run(_batches(config), cfg)
        return engine

    seq, par = run("sequential"), run("parallel")
    assert seq.rank_dict == par.rank_dict
    assert set(seq.indices_log) == set(par.indices_log)
    for name in seq.indices_log:
        np.testing.assert_array_equal(
            seq.indices_log[name], par.indices_log[name], err_msg=name)
    for proj, mod in seq.params["layers"][5]["mlp"].items():
        if "in_kernel" in mod:
            other = par.params["layers"][5]["mlp"][proj]
            np.testing.assert_array_equal(
                np.asarray(mod["in_kernel"]), np.asarray(other["in_kernel"]),
                err_msg=f"mlp.{proj}")


def test_parallel_no_parking_matches_parked(tiny, monkeypatch):
    """GRASP_PARK_BASES=0 forces the parallel fast path's sick-d2h fallback:
    per-chunk after-sweep U-free selection with grads and bases on device
    (engine._should_park_bases) instead of host-parked precomputed bases.
    Same sweeps, same eigh math — indices and factors must be BIT-identical
    to the parked path. (On TPU the engine picks between them by MEASURED
    d2h bandwidth: the tunnel's directions are independently sick.)"""
    config, params = tiny

    def run(park):
        monkeypatch.setenv("GRASP_PARK_BASES", park)
        engine = GraspEngine(jax.tree.map(jnp.array, params), config,
                             svd_method="gram_device")
        cfg = GraspConfig(layers_id=[5, 4], compression_ratio=0.5,
                          metric="taylor", grad_mode="dense", sweep="parallel")
        engine.run(_batches(config), cfg)
        return engine

    parked, onchip = run("1"), run("0")
    assert parked.rank_dict == onchip.rank_dict
    assert set(parked.indices_log) == set(onchip.indices_log)
    for name in parked.indices_log:
        np.testing.assert_array_equal(
            parked.indices_log[name], onchip.indices_log[name], err_msg=name)
    for li in (4, 5):
        for group in ("self_attn", "mlp"):
            for proj, mod in parked.params["layers"][li][group].items():
                if "in_kernel" in mod:
                    other = onchip.params["layers"][li][group][proj]
                    np.testing.assert_array_equal(
                        np.asarray(mod["in_kernel"]),
                        np.asarray(other["in_kernel"]),
                        err_msg=f"layer {li} {group}.{proj}")


def test_gram_stacked_selection_matches_per_matrix(tiny, monkeypatch):
    """Same-(shape, ratio) modules of a round run ONE [G]-batched gram eigh
    (engine._select_compile_group_ufree) instead of G serial ones. Batched
    eigh is row-independent, so selected indices and compiled factors are
    bit-identical to the per-matrix path (GRASP_GRAM_STACK=0)."""
    monkeypatch.setenv("GRASP_GRAM_STACK", "0")
    per = _run(tiny, "recompute", svd_method="gram_device")
    monkeypatch.setenv("GRASP_GRAM_STACK", "1")
    stacked = _run(tiny, "recompute", svd_method="gram_device")
    assert per.rank_dict == stacked.rank_dict
    assert set(per.indices_log) == set(stacked.indices_log)
    for name in per.indices_log:
        np.testing.assert_array_equal(
            per.indices_log[name], stacked.indices_log[name], err_msg=name
        )
    for li in (4, 5):
        for group in ("self_attn", "mlp"):
            for proj, mod in per.params["layers"][li][group].items():
                if "in_kernel" in mod:
                    other = stacked.params["layers"][li][group][proj]
                    np.testing.assert_allclose(
                        np.asarray(mod["in_kernel"]), np.asarray(other["in_kernel"]),
                        rtol=0, atol=0, err_msg=f"layer {li} {group}.{proj}",
                    )


def test_compile_prefetch_identical_results(tiny, monkeypatch):
    """The background compile prefetcher (engine._start_compile_prefetch)
    only warms compile caches — selected indices and compiled factors are
    bit-identical with it forced on (it is off by default on CPU)."""
    monkeypatch.setenv("GRASP_COMPILE_PREFETCH", "0")
    base = _run(tiny, "recompute", svd_method="gram_device")
    monkeypatch.setenv("GRASP_COMPILE_PREFETCH", "1")
    pre = _run(tiny, "recompute", svd_method="gram_device")
    assert base.rank_dict == pre.rank_dict
    for name in base.indices_log:
        np.testing.assert_array_equal(
            base.indices_log[name], pre.indices_log[name], err_msg=name
        )
    for li in (4, 5):
        for group in ("self_attn", "mlp"):
            for proj, mod in base.params["layers"][li][group].items():
                if "in_kernel" in mod:
                    other = pre.params["layers"][li][group][proj]
                    np.testing.assert_allclose(
                        np.asarray(mod["in_kernel"]), np.asarray(other["in_kernel"]),
                        rtol=0, atol=0, err_msg=f"layer {li} {group}.{proj}",
                    )


def test_prefix_recompute_compiles_once(tiny):
    """The prefix forward must not retrace as rounds compress the suffix.

    The jitted prefix fn takes ONLY the prefix params slice (embed +
    layers[:sl]); the full-params treedef changes after every round
    (kernel -> in_kernel/out_kernel), and jitting over it would force a
    fresh trace+remote-compile per round — serial ~30 s compiles through
    the axon tunnel that prefix="recompute" exists to avoid."""
    config, params = tiny
    engine = GraspEngine(jax.tree.map(jnp.array, params), config)
    seen = []
    orig = engine._get_prefix_fn
    engine._get_prefix_fn = lambda: seen.append(orig()) or seen[-1]
    cfg = GraspConfig(layers_id=[5, 4], compression_ratio=0.5, metric="taylor",
                      grad_mode="dense", sweep="sequential", prefix="recompute")
    engine.run(_batches(config), cfg)
    assert seen, "prefix fn never used"
    assert all(f is seen[0] for f in seen)  # one python fn across rounds
    # one traced/compiled signature for the whole 2-round x 2-batch run
    assert seen[0]._cache_size() == 1


def test_prefix_auto_uses_measured_bandwidth(tiny, monkeypatch):
    """prefix="auto" must weigh the MEASURED h2d bandwidth: on a slow
    transfer path (this container's axon tunnel: ~40 MB/s) re-uploading the
    boundary per sweep batch costs more than recomputing the prefix forward
    on-chip, so auto must pick "recompute"; on a healthy PCIe host
    (~10 GB/s) the same sizes must pick "cache_host". A fixed 'host RAM is
    free' policy cost +750 s on the 7B bench."""
    config, params = tiny
    engine = GraspEngine(jax.tree.map(jnp.array, params), config)
    batches = _batches(config)

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(
        "grasp_tpu.perf.device_memory",
        lambda device=None: {"bytes_in_use": 14 * 2**30,
                             "peak_bytes_in_use": 14 * 2**30},
    )

    p_min = config.num_hidden_layers - 2
    engine._h2d_bw = 1.0  # pathologically slow transfers
    engine._d2h_bw = 1e15
    assert engine._choose_prefix_cache(batches, p_min) == "recompute"
    engine._h2d_bw = 1e15  # effectively free transfers
    assert engine._choose_prefix_cache(batches, p_min) == "cache_host"
    # the two tunnel directions fail INDEPENDENTLY (measured 2026-08-20:
    # h2d 389 MB/s while d2h read 1.7 MB/s): a sick d2h makes the one-time
    # boundary capture dominate, so auto must recompute even with free h2d
    engine._d2h_bw = 1.0
    assert engine._choose_prefix_cache(batches, p_min) == "recompute"


def test_prefix_cache_host_self_demotes(tiny):
    """In auto mode, cache_host demotes itself to recompute once measured
    uploads are slower than the measured prefix forward (the tunnel's
    effective bandwidth mid-run is unpredictable from any pre-run probe);
    explicit modes never demote."""
    config, params = tiny
    engine = GraspEngine(jax.tree.map(jnp.array, params), config)

    engine._set_prefix(4, "cache_host", auto=True)
    for _ in range(2):
        engine._note_prefix_cost("fwd", 0.1)
    for _ in range(8):
        engine._note_prefix_cost("upload", 0.5)
    assert engine._prefix_mode == "recompute"
    assert engine._prefix_cache is None

    # explicit (non-auto) cache_host must never be overridden
    engine._set_prefix(4, "cache_host", auto=False)
    for _ in range(2):
        engine._note_prefix_cost("fwd", 0.1)
    for _ in range(8):
        engine._note_prefix_cost("upload", 0.5)
    assert engine._prefix_mode == "cache_host"

    # fast uploads (PCIe-class) stay cache_host in auto mode
    engine._set_prefix(4, "cache_host", auto=True)
    for _ in range(2):
        engine._note_prefix_cost("fwd", 0.1)
    for _ in range(8):
        engine._note_prefix_cost("upload", 0.001)
    assert engine._prefix_mode == "cache_host"


def test_sweep_chunks_end_aligned(tiny):
    """Chunks are END-aligned: the remainder chunk comes FIRST ([1,2,2,2]
    for 7 layers at N=2), because the first chunk's on-device selection
    runs its eigh arena next to the FULL uncompressed model (engine
    _sweep_chunks). Layer order is preserved across the boundary shift."""
    config, params = tiny
    engine = GraspEngine(jax.tree.map(jnp.array, params), config)
    layer_names = [(i, [f"model.layers.{i}.mlp.gate_proj"]) for i in range(7)]
    cfg = GraspConfig(layers_id=list(range(7)), compression_ratio=0.5,
                      sweep="parallel", sweep_chunk_layers=2)
    chunks = engine._sweep_chunks(layer_names, cfg, park=False)
    assert [len(c) for c in chunks] == [1, 2, 2, 2]
    assert [lid for c in chunks for lid, _ in c] == list(range(7))
    # exact division stays full-size; single-sweep and oversize unchanged
    chunks8 = engine._sweep_chunks(layer_names + [(7, ["x"])], cfg, park=False)
    assert [len(c) for c in chunks8] == [2, 2, 2, 2]
    cfg0 = GraspConfig(layers_id=list(range(7)), compression_ratio=0.5,
                       sweep="parallel", sweep_chunk_layers=0)
    assert engine._sweep_chunks(layer_names, cfg0, park=False) == [layer_names]


def test_parallel_no_parking_multichunk_matches_parked(tiny, monkeypatch):
    """The TPU-default on-device selection path with MULTIPLE sweep chunks
    (sweep_chunk_layers=1, the 7B shape of the run) is bit-identical to the
    host-parked path under the same chunking — same sweeps, same eigh math,
    different residency only."""
    config, params = tiny

    def run(park):
        monkeypatch.setenv("GRASP_PARK_BASES", park)
        engine = GraspEngine(jax.tree.map(jnp.array, params), config,
                             svd_method="gram_device")
        cfg = GraspConfig(layers_id=[5, 4, 3], compression_ratio=0.5,
                          metric="taylor", grad_mode="dense", sweep="parallel",
                          sweep_chunk_layers=1)
        engine.run(_batches(config), cfg)
        return engine

    parked, onchip = run("1"), run("0")
    assert parked.rank_dict == onchip.rank_dict
    assert set(parked.indices_log) == set(onchip.indices_log)
    for name in parked.indices_log:
        np.testing.assert_array_equal(
            parked.indices_log[name], onchip.indices_log[name], err_msg=name)
    for li in (3, 4, 5):
        for group in ("self_attn", "mlp"):
            for proj, mod in parked.params["layers"][li][group].items():
                if "in_kernel" in mod:
                    other = onchip.params["layers"][li][group][proj]
                    np.testing.assert_array_equal(
                        np.asarray(mod["in_kernel"]),
                        np.asarray(other["in_kernel"]),
                        err_msg=f"layer {li} {group}.{proj}")


def test_grow_sweep_chunks_sizes(tiny):
    """On-device selection chunk sizes grow as compiled layers shed bytes:
    with a synthetic limit that fits exactly one layer's grads next to the
    full model, later chunks absorb the shed params (engine
    _grow_sweep_chunks). merge mode sheds nothing -> fixed sizes."""
    config, params = tiny
    engine = GraspEngine(jax.tree.map(jnp.array, params), config)
    layer_names = [
        (i, [f"model.layers.{i}.{g}.{p}"
             for g, p in (("self_attn", "q_proj"), ("self_attn", "k_proj"),
                          ("self_attn", "v_proj"), ("self_attn", "o_proj"),
                          ("mlp", "gate_proj"), ("mlp", "up_proj"),
                          ("mlp", "down_proj"))])
        for i in range(6)
    ]
    cfg = GraspConfig(layers_id=list(range(6)), compression_ratio=0.9,
                      sweep="parallel")
    per_layer = sum(
        engine._get_proj(n)["kernel"].size
        * engine._get_proj(n)["kernel"].dtype.itemsize
        for n in layer_names[0][1])
    params_b = sum(x.size * x.dtype.itemsize
                   for x in jax.tree.leaves(engine.params))
    from grasp_tpu.core.engine import _EIGH_ARENA_BUDGET
    reserve = max(1.0 * 2**30, _EIGH_ARENA_BUDGET) + 1.2 * 2**30
    # limit: full model + reserve + exactly 1.2 layers of grads
    limit = params_b + reserve + 1.2 * per_layer
    sizes = engine._grow_sweep_chunks(layer_names, cfg, limit_bytes=limit,
                                      params_bytes=params_b)
    assert sizes is not None and sizes[0] == 1
    assert sum(sizes) == 6
    assert sizes == sorted(sizes) or max(sizes) > 1  # monotone growth overall
    assert len(sizes) < 6  # fewer sweeps than per-layer chunks
    # merge mode sheds nothing: every chunk stays at the initial size
    cfg_m = GraspConfig(layers_id=list(range(6)), compression_ratio=0.9,
                        sweep="parallel", merge=True)
    sizes_m = engine._grow_sweep_chunks(layer_names, cfg_m, limit_bytes=limit,
                                        params_bytes=params_b)
    assert sizes_m == [1] * 6
    # roomy limit -> single sweep
    assert engine._grow_sweep_chunks(layer_names, cfg,
                                     limit_bytes=params_b + reserve + 7 * per_layer,
                                     params_bytes=params_b) is None
