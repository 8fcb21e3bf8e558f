"""The GRASP compression engine — TPU-native re-design of the reference's
GRASPModel (modeling_grasp.py:82-469).

The reference mutates an nn.Module in place; here the engine owns an immutable
params pytree plus a static per-projection *plan* (see grasp_tpu.models.llama)
and every stage is a pure, jit-compiled function:

  - :meth:`compute_bi`              — block-influence layer scoring in ONE fused
                                      pass over all layers per batch
                                      (vs reference per-pair loop, modeling_grasp.py:150-167)
  - :meth:`compress_block`          — swap dense kernels for full-SVD factors
                                      (reference replace_with_GRASPLayer, :225-242),
                                      batched: same-shape weights SVD'd in one call
  - :meth:`get_svdlayer_gradients`  — dL/dS for all current SVD modules via a single
                                      jax.value_and_grad over the S-subtree
                                      (reference loss.backward() loop, :331-370)
  - :meth:`dynamic_svd_selection`   — gradient/taylor saliency + top-k or adaptive
                                      rank selection (:372-421)
  - :meth:`compile_grasp_model`     — truncate + fuse into two-matmul low-rank
                                      kernels or merged dense (:423-469)
  - :meth:`run`                     — the full pipeline (reference grasp.py:29-152),
                                      sequential-faithful by default with a
                                      `parallel` one-sweep fast mode.

Gradients: the reference *sums* S-gradients across calibration batches
(modeling_grasp.py:356-363) — we match. Because grads are taken only w.r.t.
S leaves, XLA dead-code-eliminates the backward pass below the earliest SVD
layer automatically.
"""

from __future__ import annotations

import dataclasses
import logging
import os
import time
from functools import partial
from typing import Any, Dict, Iterable, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from grasp_tpu.configs import GraspConfig, ModelConfig
from grasp_tpu.models.llama import (
    ATTN_PROJS,
    MLP_PROJS,
    ModelPlan,
    Params,
    default_plan,
    forward,
    hf_causal_lm_loss,
    plan_set,
)
from grasp_tpu.models.moe import MOE_PARTS
from grasp_tpu.ops.saliency import (
    adaptive_rank_selection,
    bi_from_hiddens,
    choose_prune_layers,
    preserve_rank,
    select_topk,
    svd_saliency,
)
from grasp_tpu.ops.svd import (
    lowrank_factors,
    merge_svd,
    sigma_gradients,
    svd,
    truncate_svd,
    ufree_select,
    ufree_truncate_kernel,
)

logger = logging.getLogger("grasp_tpu")

Batch = Dict[str, jax.Array]


def _scan_in_grads() -> bool:
    """Whether gradient graphs may scan over stacked layers.

    Forward-only graphs always scan (big compile-time win). The axon TPU
    remote-compile helper crashes on large scan-*backward* graphs (HTTP 500,
    observed on the 1.1B bench), so gradient graphs unroll on that backend
    unless GRASP_SCAN_GRAD=1 overrides (for standard TPU toolchains where
    scanned grads are the norm).
    """
    import os

    if os.environ.get("GRASP_SCAN_GRAD") == "1":
        return True
    return jax.default_backend() == "cpu"


@jax.jit
def _first_elem_jit(x):
    return jax.lax.reshape(x, (x.size,))[0]


_done_primed: set = set()


def _force_done(tree) -> None:
    """Honest completion barrier: fetch one real element of every leaf.

    jax.block_until_ready returns early for some graphs through the axon
    tunnel (CLAUDE.md); an actual device->host byte transfer cannot lie.
    The element is extracted INSIDE a primed jit — an eager ravel/slice on
    a big device array is its own compile-dispatch, and that path retains a
    persistent copy of the argument on axon (the documented dispatch-copy
    trap) plus a full-size flattened temporary.
    """
    for leaf in jax.tree.leaves(tree):
        if not isinstance(leaf, jax.Array) or leaf.size == 0:
            np.asarray(leaf)
            continue
        key = (tuple(leaf.shape), str(leaf.dtype))
        if key not in _done_primed:
            try:
                _first_elem_jit.lower(
                    jax.ShapeDtypeStruct(leaf.shape, leaf.dtype)
                ).compile()
                _done_primed.add(key)  # only on success (retry on 500s)
            except Exception:  # pragma: no cover - backend quirks
                pass
        np.asarray(jax.device_get(_first_elem_jit(leaf)))


def _prime(fn, *args, **kwargs) -> None:
    """AOT-compile a jitted fn before its first dispatch.

    On the axon TPU runtime the jit compile-dispatch path retains a
    PERSISTENT copy of every large argument (measured: a full second
    12.55 GiB of model params alive after the first 7B sweep dispatch,
    which then OOMed the per-round on-device SVD). Lowering + compiling
    ahead of time populates the same dispatch cache — the subsequent call
    is a cache hit with no copies. Priming is an optimization: any failure
    falls back to normal dispatch.
    """
    try:
        fn.lower(*args, **kwargs).compile()
    except Exception as e:  # pragma: no cover - depends on backend quirks
        logger.debug("prime failed (falling back to dispatch): %s", e)


def _resolve_targets(defaults: List[str], targets) -> List[str]:
    """Target list vs a block's defaults, translating reference dense-MLP
    names to Mixtral expert parts on MoE blocks (gate_proj->w1, up_proj->w3,
    down_proj->w2 — the HF naming correspondence) so reference-style configs
    run unchanged on MoE models."""
    tg = list(targets) if targets else list(defaults)
    if list(defaults) == list(MOE_PARTS) and all(t in MLP_PROJS for t in tg):
        m = {"gate_proj": "w1", "down_proj": "w2", "up_proj": "w3"}
        tg = [m[t] for t in tg]
    return tg


def _prime_strict(fn, *args, **kwargs) -> None:
    """AOT-compile, surfacing failures (background-prefetch worker logs them)."""
    fn.lower(*args, **kwargs).compile()


def _prime_ufree_pair(prime_sel, prime_trunc, kern_sds, metric, idx_shape, side):
    prime_sel(kern_sds, kern_sds, metric)
    prime_trunc(kern_sds, idx_shape, side)


# Stacked-eigh arena model, measured via perf.executable_memory on
# (G, 4096, 4096) fp32 builds: peak = (17.6 + 2.7*G) n^2-sized fp32
# temporaries (QDWH workspace) -> G=1: 1.36 GiB, G=2: 1.67, G=4: 2.05.
# Post-sweep 7B headroom is ~2 GiB (G=4 OOMed on chip, G=2 ran), so chunk
# stacks to keep one eigh executable's arena under _EIGH_ARENA_BUDGET.
_EIGH_ARENA_BASE = 18.0   # intercept, in n^2 fp32 temporaries
_EIGH_ARENA_SLOPE = 3.0   # per stacked matrix
_EIGH_ARENA_BUDGET = float(
    __import__("os").environ.get("GRASP_EIGH_BUDGET", 1_700_000_000)
)


def _gram_select_groups(names, shape_of, ratio_of, hbm_free=None):
    """Group same-(kernel shape, ratio) modules of one round for ONE batched
    gram EIGH: TPU eigh is iteration-bound, so a [G]-stacked eigh costs
    ~one serial eigh (measured 9.7 s per serial 4096^2 eigh on the 7B select
    stage — qkvo rounds stack 4x, gate/up 2x). Only the eigh is batched
    (_select_compile_group_ufree); the gram/saliency matmuls stay per-matrix
    so the stacked working set is G gram-sized fp32 buffers, not G full
    kernels+grads. Stacking needs a common rank (fixed ratio);
    GRASP_GRAM_STACK=0 forces the per-matrix path (parity pinned by tests).

    hbm_free (bytes, optional): measured headroom next to whatever else is
    resident. When given, the stack size is additionally capped so that the
    G gram inputs + G basis outputs that coexist with the QDWH arena fit:
    per*(2G + BASE + SLOPE*G) <= hbm_free. The r4 7B precompute OOM
    (params 12.55 GiB resident, G=2 arena + 0.5 GiB of gram/pending fp32
    buffers ~= 14.7 GiB > the chip's ~14.6 GiB effective ceiling) is the
    measurement behind this cap."""
    import os

    by: Dict[Tuple, List[str]] = {}
    order: List[Tuple] = []
    for n in names:
        key = (tuple(shape_of(n)), ratio_of(n))
        if key not in by:
            by[key] = []
            order.append(key)
        by[key].append(n)
    allow = os.environ.get("GRASP_GRAM_STACK") != "0"
    out = []
    for shape, ratio in order:
        group = by[(shape, ratio)]
        m = min(shape[-2:])
        lead = int(np.prod(shape[:-2], dtype=np.int64)) if len(shape) > 2 else 1
        if not (allow and len(group) > 1 and ratio is not None):
            out.append((group, shape, ratio, False))
            continue
        # Chunk so one stacked-eigh executable's arena fits the headroom
        # (see _EIGH_ARENA_* above); chunks of 1 take the per-matrix path.
        per = lead * m * m * 4
        cmax = max(
            1, int((_EIGH_ARENA_BUDGET / per - _EIGH_ARENA_BASE)
                   // _EIGH_ARENA_SLOPE)
        )
        if hbm_free is not None:
            cmax = max(1, min(cmax, int(
                (hbm_free / per - _EIGH_ARENA_BASE)
                // (_EIGH_ARENA_SLOPE + 2.0))))
        for i in range(0, len(group), cmax):
            chunk = group[i:i + cmax]
            out.append((chunk, shape, ratio, len(chunk) > 1))
    return out


def _gram_eigh_batches(names, shape_of, ratio_of, hbm_free=None):
    """Batch one round's gram EIGHs by GRAM shape, not kernel shape.

    The eigh input is the small-side gram (lead + (m, m)), so modules whose
    kernels differ only in the LARGE dimension — MoE parts w1/w3 [E, h, f]
    and w2 [E, f, h], or a dense layer's qkvo [d, d] next to its mlp
    [d, 4d]/[4d, d] — share ONE [G]-stacked eigh call (row-independent, so
    per-module results are bit-identical to unbatched calls; pinned by
    tests/test_engine_prefix.py::test_gram_stacked_selection_matches_per_matrix
    and test_moe_compress.py). Fewer eigh graphs to compile (the MoE bench
    was compile-bound: its three same-gram expert parts each paid a separate
    remote eigh-multi compile) and fewer iteration-bound dispatches at
    m <= 2048. Per-module gram/importance/truncation matmuls stay per-matrix
    exactly as in _select_compile_group_ufree.

    Returns [(names, gram_shape, stacked)]. Stacks are chunked by the QDWH
    arena model (see _EIGH_ARENA_*) and the measured hbm_free cap, same
    formula as _gram_select_groups. Adaptive-ratio modules (no fixed rank)
    and GRASP_GRAM_STACK=0 take per-matrix entries."""
    import os

    by: Dict[Tuple, List[str]] = {}
    order: List[Tuple] = []
    for n in names:
        shape = tuple(shape_of(n))
        m = int(min(shape[-2:]))
        key = (shape[:-2] + (m, m), ratio_of(n) is not None)
        if key not in by:
            by[key] = []
            order.append(key)
        by[key].append(n)
    allow = os.environ.get("GRASP_GRAM_STACK") != "0"
    out = []
    for gshape, stackable in order:
        group = by[(gshape, stackable)]
        if not (allow and stackable and len(group) > 1):
            out.append((group, gshape, False))
            continue
        m = gshape[-1]
        lead = int(np.prod(gshape[:-2], dtype=np.int64)) if len(gshape) > 2 else 1
        per = lead * m * m * 4
        cmax = max(
            1, int((_EIGH_ARENA_BUDGET / per - _EIGH_ARENA_BASE)
                   // _EIGH_ARENA_SLOPE)
        )
        if hbm_free is not None:
            cmax = max(1, min(cmax, int(
                (hbm_free / per - _EIGH_ARENA_BASE)
                // (_EIGH_ARENA_SLOPE + 2.0))))
        for i in range(0, len(group), cmax):
            chunk = group[i:i + cmax]
            out.append((chunk, gshape, len(chunk) > 1))
    return out


def module_name(layer_id: int, proj: str) -> str:
    """Reference-compatible module path, e.g. 'model.layers.3.self_attn.q_proj'.

    Stacked MoE expert parts (w1/w2/w3, models.moe) live under the HF Mixtral
    group name: 'model.layers.3.block_sparse_moe.w1' — ONE module per part
    covering all experts (the [E] axis is batched, not enumerated)."""
    if proj in MOE_PARTS:
        group = "block_sparse_moe"
    else:
        group = "self_attn" if proj in ATTN_PROJS else "mlp"
    return f"model.layers.{layer_id}.{group}.{proj}"


def parse_module_name(name: str) -> Tuple[int, str, str]:
    parts = name.split(".")
    return int(parts[2]), parts[3], parts[4]


class GraspEngine:
    """Holds (params, plan, config) and runs the compression stages."""

    def __init__(
        self,
        params: Params,
        config: ModelConfig,
        plan: Optional[ModelPlan] = None,
        svd_method: str = "auto",
        remat: bool = False,
        mesh=None,
        scan_fwd: Optional[bool] = None,
    ):
        """mesh: optional jax.sharding.Mesh("data","model"). When given, the
        WHOLE pipeline runs mesh-parallel (SURVEY.md §7 step 5): params are
        Megatron-TP sharded over "model" for the BI and gradient sweeps,
        calibration batches shard over "data" (XLA inserts the grad psums from
        the NamedShardings), and per-shape device-SVD stacks fan out across all
        devices. Selected indices are identical to the single-device run
        (tests/test_parallel_engine.py)."""
        self.mesh = mesh
        if mesh is not None:
            from grasp_tpu.parallel.mesh import shard_params

            params = shard_params(params, mesh, config)
        self.params = params
        self.config = config
        self.plan = plan or default_plan(config)
        self.svd_method = svd_method
        self.remat = remat
        # Scanning over stacked layer groups cuts trace+compile time ~10x,
        # but the stacks are runtime COPIES of the layer params — at 7B that
        # doubles 12.5 GiB of weights and OOMs a single chip. Default: scan
        # unless the per-layer params are too big to double alongside
        # everything else (the 1.1B stacks ~2 GiB and still profits).
        if scan_fwd is None:
            layer_bytes = sum(
                x.size * jnp.dtype(x.dtype).itemsize
                for x in jax.tree.leaves(params["layers"])
            )
            scan_fwd = layer_bytes < 6e9
        self.scan_fwd = scan_fwd

        self.redundant_layers: List[int] = []
        self.layer_importances: List[float] = []
        # wall-clock per pipeline stage (bi_sweep / grad_sweep / svd /
        # select_compile), accumulated across rounds. svd runs in a worker
        # thread overlapped with grad_sweep in the dense path, so stage times
        # can sum to more than the e2e wall — report both (bench_7b.py).
        self.stage_times: Dict[str, float] = {}
        self.stage_counts: Dict[str, int] = {}
        # per-module compression-ratio overrides, honored during selection
        # (reference: module.compression_ratio attr, modeling_grasp.py:399-400)
        self.module_ratios: Dict[str, float] = {}
        self.indices_dict: Dict[str, np.ndarray] = {}
        self.indices_log: Dict[str, np.ndarray] = {}   # accumulated across run() rounds
        self.rank_dict: Dict[str, int] = {}
        self.grasp_values_dict: Dict[str, Dict[str, list]] = {}
        self.grasp_layer_grads: Dict[str, jax.Array] = {}

        self._bi_fns: Dict[Tuple, Any] = {}
        self._grad_fns: Dict[Tuple, Any] = {}
        self._done_rounds: set = set()   # crash-resume bookkeeping (run())
        self._resume_dir: Optional[str] = None
        self._h2d_bw: Optional[float] = None  # measured once, _h2d_bandwidth
        self._d2h_bw: Optional[float] = None  # measured once, _d2h_bandwidth
        self._set_prefix(0, "off")

    def _stage(self, name: str, dt: float) -> None:
        self.stage_times[name] = self.stage_times.get(name, 0.0) + dt
        self.stage_counts[name] = self.stage_counts.get(name, 0) + 1
        # stage boundaries are the natural HBM sampling points on runtimes
        # without allocator stats (perf.device_memory high-water fallback)
        if jax.default_backend() not in ("cpu",):
            from grasp_tpu.perf import device_memory

            device_memory()

    # ------------------------------------------------------------------
    # param-tree helpers
    # ------------------------------------------------------------------

    def _get_proj(self, name: str) -> Params:
        layer_id, group, proj = parse_module_name(name)
        if group == "block_sparse_moe":
            # stacked-expert parts are raw arrays in the experts dict; present
            # them through the same {"kernel": ...} / {"in_kernel": ...}
            # contract the rest of the engine speaks (view, not a copy)
            ex = self.params["layers"][layer_id]["moe"]["experts"]
            if proj in ex:
                return {"kernel": ex[proj]}
            view: Params = {}
            if proj + "_a" in ex:
                view["in_kernel"] = ex[proj + "_a"]
                view["out_kernel"] = ex[proj + "_b"]
            return view
        return self.params["layers"][layer_id][group][proj]

    def _set_proj(self, name: str, new_params: Params, kind: str) -> None:
        layer_id, group, proj = parse_module_name(name)
        if group == "block_sparse_moe":
            # compressed experts are params-keyed (like the quantized forms):
            # moe_apply dispatches on the presence of w*_a/w*_b — the static
            # plan tracks only dense-layer projections
            if self.mesh is not None:
                new_params = self._place_moe_part(new_params)
            ex = dict(self.params["layers"][layer_id]["moe"]["experts"])
            ex.pop(proj, None)
            if kind == "dense":
                ex[proj] = new_params["kernel"]
                ex.pop(proj + "_a", None)
                ex.pop(proj + "_b", None)
            else:
                ex[proj + "_a"] = new_params["in_kernel"]
                ex[proj + "_b"] = new_params["out_kernel"]
            self.params["layers"][layer_id]["moe"]["experts"] = ex
            return
        if self.mesh is not None:
            new_params = self._place_proj(proj, new_params)
        self.params["layers"][layer_id][group][proj] = new_params
        self.plan = plan_set(self.plan, layer_id, proj, kind)

    def _place_moe_part(self, new_params: Params) -> Params:
        """Expert-parallel placement: shard the leading [E] axis over the
        model axis when it divides (parallel.mesh.moe_specs semantics)."""
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        from grasp_tpu.parallel.mesh import MODEL_AXIS

        placed = {}
        for key, value in new_params.items():
            ok = value.shape[0] % self.mesh.shape[MODEL_AXIS] == 0
            spec = P(MODEL_AXIS, *([None] * (value.ndim - 1))) if ok else P()
            placed[key] = jax.device_put(value, NamedSharding(self.mesh, spec))
        return placed

    def _place_proj(self, proj: str, new_params: Params) -> Params:
        """Place a freshly-built projection subtree on the mesh (TP spec for
        dense kernels when dims divide, replicated otherwise — low-rank/svd
        factors replicate by design, see parallel.mesh)."""
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        from grasp_tpu.parallel.mesh import _proj_spec

        specs = _proj_spec(proj, new_params)
        placed = {}
        for key, value in new_params.items():
            spec = specs[key]
            ok = all(
                ax is None or value.shape[i] % self.mesh.shape[ax] == 0
                for i, ax in enumerate(spec)
            )
            placed[key] = jax.device_put(
                value, NamedSharding(self.mesh, spec if ok else P())
            )
        return placed

    def _place_batch(self, batch: Batch) -> Batch:
        """Shard a calibration batch's rows over the mesh "data" axis
        (replicate when the row count doesn't divide)."""
        if self.mesh is None:
            return batch
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        dp = self.mesh.shape["data"]
        out: Batch = {}
        for k, v in batch.items():
            if v is None:
                out[k] = v
                continue
            v = jnp.asarray(v)
            spec = P("data") if v.ndim >= 1 and v.shape[0] % dp == 0 else P()
            out[k] = jax.device_put(v, NamedSharding(self.mesh, spec))
        return out

    def svd_module_names(self) -> List[str]:
        """All module paths currently in full-SVD (trainable-S) form.

        Reference check_exists_grasp_layer (modeling_grasp.py:319-329).
        """
        names = []
        for li, layer_plan in enumerate(self.plan):
            for proj, kind in zip(ATTN_PROJS + MLP_PROJS, layer_plan):
                if kind == "svd":
                    names.append(module_name(li, proj))
        return names

    def param_counts(self) -> Tuple[int, int]:
        """(total, trainable) — trainable = S leaves of svd modules."""
        total = sum(x.size for x in jax.tree.leaves(self.params))
        trainable = sum(self._get_proj(n)["s"].size for n in self.svd_module_names())
        return total, trainable

    def print_trainable_params(self) -> None:
        """Reference GRASPModel.print_trainable_params (modeling_grasp.py:128-133)."""
        total, trainable = self.param_counts()
        logger.info(
            "trainable params: %d || all params: %d || trainable: %.2f%%",
            trainable, total, 100.0 * trainable / max(total, 1),
        )

    # ------------------------------------------------------------------
    # Stage 1 — block influence
    # ------------------------------------------------------------------

    def compute_bi(
        self,
        num_prune_layers: int = 1,
        calibration_batches: Optional[Iterable[Batch]] = None,
        hiddens: Optional[Sequence[jax.Array]] = None,
        angular: bool = False,
    ) -> Tuple[List[float], List[int]]:
        """Score layers by block influence; pick the `num_prune_layers` least important.

        Reference modeling_grasp.py:135-193, vectorized: one jitted forward per
        batch emits all per-layer scores at once.
        """
        logger.info("=======> Compute Block Influence")
        t_stage = time.time()
        n_layers = self.config.num_hidden_layers
        importances = np.zeros(n_layers, dtype=np.float64)

        if hiddens is not None:
            scores = np.asarray(bi_from_hiddens(hiddens, num_prune_layers, angular))
            importances[: len(scores)] += scores
        else:
            assert calibration_batches is not None, (
                "please provide hidden_states or calibration batches to compute block influence"
            )
            scores_nb = None
            if self._fused_sweep_ok(calibration_batches):
                # ONE dispatch for the whole BI sweep: scan over the stacked
                # batches, per-batch scores out as stacked ys. The per-batch
                # loop paid a dispatch tax + a synchronous device_get round-
                # trip per batch (~1.5 s/batch of the 7B bench's 97.7 s
                # bi_sweep against ~0.07 s of chip time). Scores come back
                # per batch and accumulate on host row by row, fp64 — the
                # identical order and dtype as the loop.
                try:
                    scores_nb = self._fused_bi_scores(
                        calibration_batches, num_prune_layers, angular)
                except Exception as e:  # pragma: no cover - compiler-dependent
                    logger.warning("fused BI failed (%s: %s) — falling back "
                                   "to the per-batch loop", type(e).__name__, e)
            if scores_nb is not None:
                for row in scores_nb:
                    importances[: len(row)] += row
            else:
                key = ("bi", angular, num_prune_layers, self.plan)
                if key not in self._bi_fns:

                    @partial(jax.jit, static_argnames=("plan",))
                    def bi_step(params, input_ids, attention_mask, *, plan):
                        out = forward(
                            params,
                            input_ids,
                            config=self.config,
                            plan=plan,
                            attention_mask=attention_mask,
                            output_hidden_states=True,
                            remat=self.remat,
                            scan_layers=self.scan_fwd,
                        )
                        return bi_from_hiddens(out["hidden_states"], num_prune_layers, angular)

                    self._bi_fns[key] = bi_step
                bi_step = self._bi_fns[key]
                primed = False
                for batch in calibration_batches:
                    batch = self._place_batch(batch)
                    if not primed:
                        t_c = time.time()
                        _prime(bi_step, self.params, batch["input_ids"],
                               batch.get("attention_mask"), plan=self.plan)
                        primed = True
                        self._stage("bi_compile", time.time() - t_c)
                    scores = np.asarray(
                        bi_step(self.params, batch["input_ids"], batch.get("attention_mask"), plan=self.plan)
                    )
                    importances[: len(scores)] += scores

        # scores exist for indices [0, L+1-n); the reference keeps a fixed-size
        # list with zeros beyond that (modeling_grasp.py:146)
        self.layer_importances = importances.tolist()
        layers_to_remove = choose_prune_layers(importances, num_prune_layers, angular)
        self.redundant_layers = layers_to_remove
        self._stage("bi_sweep", time.time() - t_stage)
        return self.layer_importances, layers_to_remove

    def _fused_bi_scores(self, batches, num_prune_layers: int, angular: bool) -> np.ndarray:
        """[N, L'] per-batch BI scores from one scanned dispatch (see
        compute_bi's fused branch)."""
        config, remat, scan_fwd = self.config, self.remat, self.scan_fwd
        key = ("bif", angular, num_prune_layers, self.plan,
               batches[0].get("attention_mask") is not None)
        if key not in self._bi_fns:

            @partial(jax.jit, static_argnames=("plan", "with_mask"))
            def bi_sweep_fn(params, ids, mask, *, plan, with_mask):
                def body(_, xs):
                    input_ids = xs[0]
                    attention_mask = xs[1] if with_mask else None
                    out = forward(
                        params, input_ids, config=config, plan=plan,
                        attention_mask=attention_mask,
                        output_hidden_states=True, remat=remat,
                        scan_layers=scan_fwd,
                    )
                    return 0, bi_from_hiddens(
                        out["hidden_states"], num_prune_layers, angular)
                xs = (ids, mask) if with_mask else (ids,)
                _, scores = jax.lax.scan(body, 0, xs)
                return scores

            self._bi_fns[key] = bi_sweep_fn
        fn = self._bi_fns[key]
        ids, mask, _ = self._fused_batch_stacks(batches)
        t_c = time.time()
        _prime(fn, self.params, ids, mask, plan=self.plan,
               with_mask=mask is not None)
        self._stage("bi_compile", time.time() - t_c)
        return np.asarray(jax.device_get(
            fn(self.params, ids, mask, plan=self.plan,
               with_mask=mask is not None)))

    def remove_layers(
        self,
        layers_to_remove: Optional[List[int]] = None,
        angular: bool = False,
        num_prune_layers: Optional[int] = None,
    ) -> List[int]:
        """Physically delete whole transformer layers (ShortGPT-style).

        Reference public API modeling_grasp.py:195-216 (never called from its
        pipelines but part of the surface). Functional version: rebuilds
        params/plan/config without the removed layers and updates the engine
        in place. Returns the removed layer ids.
        """
        import dataclasses

        if not layers_to_remove:
            if angular:
                assert self.layer_importances, "Need to compute importances with compute_bi()"
                assert num_prune_layers, "Need number of layers to prune"
                layers_to_remove = choose_prune_layers(
                    np.asarray(self.layer_importances), num_prune_layers, angular=True
                )
            else:
                layers_to_remove = choose_prune_layers(
                    np.asarray(self.layer_importances), num_prune_layers
                )

        keep = [i for i in range(self.config.num_hidden_layers) if i not in set(layers_to_remove)]
        self.params = {**self.params, "layers": [self.params["layers"][i] for i in keep]}
        self.plan = tuple(self.plan[i] for i in keep)
        self.config = dataclasses.replace(self.config, num_hidden_layers=len(keep))
        self._bi_fns.clear()
        self._grad_fns.clear()
        return list(layers_to_remove)

    # ------------------------------------------------------------------
    # Stage 2 — SVD-ify a block
    # ------------------------------------------------------------------

    def _block_targets(self, layer_id: int, block_type: str) -> List[str]:
        """Default target projections of one block.

        "mlp" on a Mixtral-family layer resolves to the stacked MoE expert
        parts (w1/w2/w3) — a beyond-reference extension: the reference's
        target names are hardcoded to dense gate/up/down_proj
        (modeling_grasp.py:248)."""
        if block_type == "attention":
            return list(ATTN_PROJS)
        if block_type == "mlp":
            if "moe" in self.params["layers"][layer_id]:
                return list(MOE_PARTS)
            return list(MLP_PROJS)
        raise NotImplementedError(f"block type {block_type} not supported")

    def compress_block(
        self,
        layer_id: int,
        block_type: str,
        target_layer_types: Optional[Union[List[str], str]] = None,
    ) -> bool:
        """Replace each target projection of one block with its full SVD.

        Reference compress_block + replace_with_GRASPLayer
        (modeling_grasp.py:244-309, 225-242). Weights are factored in torch
        layout W=[out,in] so U/S/Vh match the reference bit-for-bit; same-shape
        weights are stacked and SVD'd in one batched call.

        Returns True ("skip") when target_layer_types is None, mirroring the
        reference's skip-flag contract (modeling_grasp.py:261-262).
        """
        if layer_id is None:
            raise ValueError("Layer id should be given, but got None")
        if target_layer_types is None:
            return True

        if block_type == "mlp" and "moe" in self.params["layers"][layer_id]:
            raise NotImplementedError(
                "SVD-module (grad_mode='svd') compression of sparse-MoE "
                "expert MLPs is not supported — the dense-gradient path "
                "(grad_mode='dense', the default) compresses stacked experts "
                "batched over the [E] axis (see compress_round)"
            )
        defaults = self._block_targets(layer_id, block_type)

        targets = _resolve_targets(defaults, target_layer_types)
        if not all(t in defaults for t in targets):
            raise ValueError(f"values in target layer types not valid, should be one of {defaults}")

        # group same-shape kernels for one batched SVD per shape
        by_shape: Dict[Tuple[int, int], List[str]] = {}
        for proj in targets:
            name = module_name(layer_id, proj)
            kernel = self._get_proj(name)["kernel"]  # [in, out]
            by_shape.setdefault(tuple(kernel.shape), []).append(name)

        for shape, names in by_shape.items():
            stack = jnp.stack([self._get_proj(n)["kernel"].T.astype(jnp.float32) for n in names])
            u, s, vh = svd(stack, method=self.svd_method, mesh=self.mesh)
            u, s, vh = jax.device_get((u, s, vh))
            for i, n in enumerate(names):
                old = self._get_proj(n)
                new: Params = {
                    "u": jnp.asarray(u[i]),
                    "s": jnp.asarray(s[i]),
                    "vh": jnp.asarray(vh[i]),
                }
                if "bias" in old:
                    new["bias"] = old["bias"]
                self._set_proj(n, new, "svd")
        return False

    # ------------------------------------------------------------------
    # Stage 3 — gradient collection
    # ------------------------------------------------------------------

    def _make_grad_fn(self, plan: ModelPlan, split_layers: Tuple[int, ...] = ()):
        config, remat = self.config, self.remat
        scan_g = _scan_in_grads() and self.scan_fwd

        def loss_from_s(s_dict: Dict[str, jax.Array], params: Params, input_ids, attention_mask, labels):
            # graft trainable S leaves into the frozen tree
            layers = list(params["layers"])
            for name, s in s_dict.items():
                li, group, proj = parse_module_name(name)
                layer = dict(layers[li])
                grp = dict(layer[group])
                mod = dict(grp[proj])
                mod["s"] = s
                grp[proj] = mod
                layer[group] = grp
                layers[li] = layer
            params = {**params, "layers": layers}
            logits = forward(
                params, input_ids, config=config, plan=plan,
                attention_mask=attention_mask, remat=remat,
                scan_layers=scan_g,
                split_layers=split_layers,
            )["logits"]
            return hf_causal_lm_loss(logits, labels)

        return jax.jit(jax.value_and_grad(loss_from_s))

    def get_svdlayer_gradients(
        self, calibration_batches: Iterable[Batch]
    ) -> Dict[str, jax.Array]:
        """Sum of dL/dS over all calibration batches for every SVD module.

        Reference get_svdlayer_gradients (modeling_grasp.py:331-370): full
        forward+backward per batch, grads summed not averaged. Here one jitted
        value_and_grad handles every SVD module simultaneously, and XLA prunes
        backward work below the earliest SVD layer (only S leaves are
        differentiated).
        """
        names = self.svd_module_names()
        if not names:
            raise RuntimeError(
                "no SVD modules found — call compress_block first (reference "
                "modeling_grasp.py:334-335 contract)"
            )
        split = tuple(sorted({parse_module_name(n)[0] for n in names}))
        key = ("grad", self.plan, split)
        if key not in self._grad_fns:
            self._grad_fns[key] = self._make_grad_fn(self.plan, split)
        grad_fn = self._grad_fns[key]

        s_dict = {n: self._get_proj(n)["s"] for n in names}
        # strip S leaves from the frozen tree? not needed: grafted values shadow
        totals: Dict[str, jax.Array] = {}
        total_loss = 0.0
        nbatches = 0
        for batch in calibration_batches:
            batch = self._place_batch(batch)
            if nbatches == 0:
                _prime(grad_fn, s_dict, self.params, batch["input_ids"],
                       batch.get("attention_mask"), batch["labels"])
            loss, grads = grad_fn(
                s_dict, self.params, batch["input_ids"], batch.get("attention_mask"), batch["labels"]
            )
            total_loss += float(loss)
            nbatches += 1
            for n, g in grads.items():
                totals[n] = g if n not in totals else totals[n] + g
        logger.info("gradient sweep: %d batches, mean loss %.4f", nbatches, total_loss / max(nbatches, 1))
        self.grasp_layer_grads = totals
        return totals

    # ------------------------------------------------------------------
    # Stage 3b — dense-gradient fast path (TPU-native)
    # ------------------------------------------------------------------
    #
    # Mathematically identical alternative to compress_block +
    # get_svdlayer_gradients: with W = U diag(S) Vh the chain rule gives
    # dL/dsigma_i = u_i^T (dL/dW) vh_i, so the sweep can differentiate w.r.t.
    # the *dense* kernels (model untouched -> no plan change during the sweep)
    # while the host SVD runs concurrently in a worker thread; sigma-gradients
    # are then projected on the MXU (ops.svd.sigma_gradients). Validated
    # bit-for-bit on selected indices against the reference path in
    # tests/test_engine_golden.py.

    def _kernel_swapped_loss(
        self,
        plan: ModelPlan,
        split_layers: Tuple[int, ...] = (),
        start_layer: int = 0,
    ):
        """loss(k_dict, params, hidden_in, input_ids, attention_mask, labels)
        with the named dense kernels swapped in from k_dict — the shared
        differentiand of the per-batch grad fn and the fused one-dispatch
        sweep."""
        config, remat = self.config, self.remat
        scan_g = _scan_in_grads() and self.scan_fwd

        def loss_from_kernels(k_dict: Dict[str, jax.Array], params: Params, hidden_in, input_ids, attention_mask, labels):
            layers = list(params["layers"])
            for name, kern in k_dict.items():
                li, group, proj = parse_module_name(name)
                layer = dict(layers[li])
                if group == "block_sparse_moe":
                    moe = dict(layer["moe"])
                    moe["experts"] = {**moe["experts"], proj: kern}
                    layer["moe"] = moe
                else:
                    grp = dict(layer[group])
                    mod = dict(grp[proj])
                    mod["kernel"] = kern
                    grp[proj] = mod
                    layer[group] = grp
                layers[li] = layer
            params = {**params, "layers": layers}
            # split_layers keeps the trainable layers out of the scan stacks —
            # a trainable layer inside a stack turns the whole stack
            # differentiable and the backward materializes model-sized zero
            # gradients (compile-time OOM at 7B; see models.llama.forward)
            logits = forward(
                params, input_ids, config=config, plan=plan,
                attention_mask=attention_mask, remat=remat,
                scan_layers=scan_g,
                split_layers=split_layers,
                start_layer=start_layer,
                hidden_in=hidden_in,
            )["logits"]
            return hf_causal_lm_loss(logits, labels)

        return loss_from_kernels

    def _make_dense_grad_fn(
        self,
        plan: ModelPlan,
        split_layers: Tuple[int, ...] = (),
        start_layer: int = 0,
    ):
        loss_from_kernels = self._kernel_swapped_loss(
            plan, split_layers, start_layer)

        # fused accumulation: grads sum into a DONATED running total inside
        # the graph, so the sweep's steady state is ONE accumulator copy —
        # the eager `totals[n] + g` pattern held totals + the fresh grads +
        # the sum simultaneously (3x the chunk's grad bytes transiently),
        # which OOMed the parallel fast path's multi-layer chunks at 7B
        # (2x chunk grads live + the dispatch working set > 15.75 GiB).
        # Same per-batch add order as the eager loop -> bit-identical sums.
        def step(k_dict, params, hidden_in, input_ids, attention_mask, labels, totals):
            loss, grads = jax.value_and_grad(loss_from_kernels)(
                k_dict, params, hidden_in, input_ids, attention_mask, labels)
            return loss, jax.tree.map(jnp.add, totals, grads)

        return jax.jit(step, donate_argnums=(6,))

    # -- fused one-dispatch sweeps: a lax.scan over the stacked calibration
    # batches replaces the per-batch dispatch loop. On the axon runtime every
    # dispatched call pays ~35-40 ms of tunnel tax and every host sync a full
    # round-trip — at the 7B paper config the per-batch loop spent ~0.49 s/
    # batch against ~0.09 s of chip time (BENCH_7B.json r4: grad_sweep 443 s
    # for ~80 s of compute). One dispatch per round makes the sweep cost pure
    # chip time. Accumulation order (sequential adds, same dtypes) is
    # identical to the loop, so sums are bit-exact
    # (tests/test_fused_sweep.py). GRASP_FUSED_SWEEP=0 restores the loop.

    def _fused_sweep_ok(self, batches) -> bool:
        """The fused path needs an indexable, shape-uniform batch list and a
        single-device engine (mesh runs keep the loop: stacking would need
        per-axis shardings and the dp sweep already divides the work)."""
        if os.environ.get("GRASP_FUSED_SWEEP") == "0":
            return False
        if self.mesh is not None:
            return False
        if not isinstance(batches, (list, tuple)) or len(batches) < 2:
            return False
        b0 = batches[0]
        if not isinstance(b0, dict) or "input_ids" not in b0 or "labels" not in b0:
            return False
        ids0, lab0 = jnp.shape(b0["input_ids"]), jnp.shape(b0["labels"])
        m0 = b0.get("attention_mask")
        for b in batches[1:]:
            if jnp.shape(b["input_ids"]) != ids0 or jnp.shape(b["labels"]) != lab0:
                return False
            m = b.get("attention_mask")
            if (m is None) != (m0 is None):
                return False
            if m is not None and jnp.shape(m) != jnp.shape(m0):
                return False
        return True

    def _fused_batch_stacks(self, batches):
        """[N, ...] device stacks of the calibration batches, built once per
        batch list (host np.stack -> ONE device_put per field: an eager
        jnp.stack of device arrays leaks persistent dispatch copies on axon,
        and N uploads would pay N tunnel latencies)."""
        key = (id(batches), len(batches), jnp.shape(batches[0]["input_ids"]))
        cached = getattr(self, "_fused_stack_cache", None)
        if cached is not None and cached[0] == key:
            return cached[1]

        def stack(field):
            vals = [b.get(field) for b in batches]
            if vals[0] is None:
                return None
            return jnp.asarray(
                np.stack([np.asarray(jax.device_get(v)) for v in vals]))

        stacks = (stack("input_ids"), stack("attention_mask"), stack("labels"))
        self._fused_stack_cache = (key, stacks)
        return stacks

    def _make_fused_sweep_fn(self, plan: ModelPlan, split_layers, with_mask: bool):
        """ONE-dispatch calibration sweep: scan over the stacked batches with
        the grad accumulators as carry (donated -> aliased in place, same
        single-copy steady state as the per-batch fn). The body is monolithic
        (start_layer=0): the prefix layers must be recomputed inside the scan
        body — parking 64 boundary activations (~2.1 GiB at 7B) next to the
        params does not fit, and they are not differentiated either way (the
        loss depends on k_dict only through the suffix, XLA DCEs the prefix
        backward)."""
        loss_from_kernels = self._kernel_swapped_loss(plan, split_layers, 0)
        grad = jax.value_and_grad(loss_from_kernels)

        if with_mask:
            def sweep(k_dict, params, ids, mask, labels, totals):
                def body(carry, xs):
                    loss, g = grad(k_dict, params, None, xs[0], xs[1], xs[2])
                    return jax.tree.map(jnp.add, carry, g), loss
                totals, losses = jax.lax.scan(body, totals, (ids, mask, labels))
                return losses, totals
            return jax.jit(sweep, donate_argnums=(5,))

        def sweep(k_dict, params, ids, labels, totals):
            def body(carry, xs):
                loss, g = grad(k_dict, params, None, xs[0], None, xs[1])
                return jax.tree.map(jnp.add, carry, g), loss
            totals, losses = jax.lax.scan(body, totals, (ids, labels))
            return losses, totals
        return jax.jit(sweep, donate_argnums=(4,))

    def _fused_dense_sweep(self, split, k_dict, batches, after_dispatch=None):
        """get_dense_gradients via the fused one-dispatch sweep."""
        ids, mask, labels = self._fused_batch_stacks(batches)
        with_mask = mask is not None
        key = ("fsweep", self.plan, split, with_mask)
        if key not in self._grad_fns:
            self._grad_fns[key] = self._make_fused_sweep_fn(
                self.plan, split, with_mask)
        fn = self._grad_fns[key]
        totals = {n: jnp.zeros(k.shape, k.dtype) for n, k in k_dict.items()}
        args = ((k_dict, self.params, ids, mask, labels, totals) if with_mask
                else (k_dict, self.params, ids, labels, totals))
        t0 = time.time()
        _prime(fn, *args)
        self._stage("grad_compile", time.time() - t0)
        t0 = time.time()
        losses, totals = fn(*args)
        if after_dispatch is not None:
            after_dispatch()  # sweep in flight: overlap transfers with it
        _force_done(totals)
        self._stage("grad_sweep", time.time() - t0)
        logger.info(
            "fused gradient sweep: %d batches in one dispatch, mean loss %.4f",
            len(batches), float(np.mean(np.asarray(jax.device_get(losses)))))
        return totals

    # -- prefix split (cfg.prefix): sequential rounds never modify layers
    # below min(redundant) — run them once per batch (or once per run with
    # "cache") through a fn compiled ONCE, so each round's grad graph covers
    # only the compressed tail. See configs.GraspConfig.prefix.

    def _set_prefix(self, layer: int, mode: str, auto: bool = False) -> None:
        self._prefix_layer = 0 if mode == "off" else layer
        self._prefix_mode = mode
        self._prefix_auto = auto   # auto-chosen modes may self-demote
        self._prefix_costs: Dict[str, float] = {}
        in_cache = mode in ("cache", "cache_host")
        self._prefix_cache = {} if (in_cache and self._prefix_layer) else None
        self._prefix_pending: List[Tuple[int, Any]] = []
        self._prefix_fns: Dict[Any, Any] = {}

    def _prefix_params(self, params=None):
        """The sub-pytree the prefix forward actually reads: embed_tokens +
        layers[:prefix_layer]. Jitting over ONLY this slice keeps the traced
        structure round-invariant — the full params treedef changes every
        round (kernel -> in_kernel/out_kernel on layers >= sl), which would
        force a fresh trace+remote-compile of the prefix graph per round in
        prefix="recompute" mode, serially re-paying the compile the feature
        exists to avoid. Leaves are references, not copies."""
        p = self.params if params is None else params
        return {"embed_tokens": p["embed_tokens"],
                "layers": list(p["layers"][: self._prefix_layer])}

    def _get_prefix_fn(self):
        sl = self._prefix_layer
        # only layers < sl are traced; key on their plans (suffix plans are
        # irrelevant to the compiled graph)
        plan_key = self.plan[:sl]
        if plan_key not in self._prefix_fns:
            config, remat, scan_g = self.config, self.remat, self.scan_fwd
            full_plan = plan_key + default_plan(self.config)[sl:]

            @jax.jit
            def prefix_fn(prefix_params, input_ids, attention_mask):
                return forward(
                    prefix_params, input_ids, config=config, plan=full_plan,
                    attention_mask=attention_mask, remat=remat,
                    scan_layers=scan_g, stop_layer=sl,
                )["hidden"]

            self._prefix_fns[plan_key] = prefix_fn
        return self._prefix_fns[plan_key]

    def _prefix_hidden(self, i: int, batch: Batch, primed: bool):
        """Boundary activation for batch i.

        "cache" keeps it on device across rounds; "cache_host" parks it in
        host RAM (np array, bit-exact bf16 round trip) and re-uploads per
        use — for 7B scale, where the full boundary set (~2.1 GiB at the
        paper config) does not fit next to the sweep's HBM peak but trivially
        fits the 125 GB host. Either way the prefix forward runs ONCE per
        batch for the whole run instead of once per batch per round.

        Self-correcting placement: when the mode came from prefix="auto",
        both the re-upload and the prefix forward are timed in situ, and if
        uploads measure slower than recomputing (this container's tunnel
        degrades from ~900 MB/s idle to an effective ~35 MB/s mid-run —
        unpredictable from any pre-run probe; measured +750 s on the 7B
        bench), cache_host demotes itself to recompute at the next batch.
        The values are bit-identical either way (tests/test_engine_prefix.py)
        so the switch is purely a placement change."""
        if self._prefix_cache is not None and i not in self._prefix_cache:
            self._flush_prefix_pending()  # async-parked entries land lazily
        if self._prefix_cache is not None and i in self._prefix_cache:
            h = self._prefix_cache[i]
            if not isinstance(h, np.ndarray):
                return h
            t0 = time.time()
            h_dev = jax.device_put(h)
            # timing sync only while auto may still demote (needs >=8 timed
            # uploads); once the decision is stable, stop blocking so the
            # uploads pipeline behind the sweep's device compute — the block
            # serialized 0.39 s/batch x 64 batches x rounds at 7B
            if self._prefix_auto and self._prefix_costs.get("upload_n", 0) < 16:
                jax.block_until_ready(h_dev)
                self._note_prefix_cost("upload", time.time() - t0)
            return h_dev
        fn = self._get_prefix_fn()
        pp = self._prefix_params()
        if not primed:
            _prime(fn, pp, batch["input_ids"], batch.get("attention_mask"))
        t0 = time.time()
        h0 = fn(pp, batch["input_ids"], batch.get("attention_mask"))
        if self._prefix_auto:
            jax.block_until_ready(h0)
            self._note_prefix_cost("fwd", time.time() - t0)
        if self._prefix_cache is not None:
            if self._prefix_mode == "cache_host":
                # park asynchronously: kick the D2H now, np-convert on a later
                # call once the copy has had a batch's compute time to land
                # (a blocking device_get cost 0.4 s/batch on the fill sweep)
                try:
                    h0.copy_to_host_async()
                except Exception:  # pragma: no cover - backend-dependent
                    pass
                self._flush_prefix_pending(keep_last=1)
                self._prefix_pending.append((i, h0))
            else:
                self._prefix_cache[i] = h0
        return h0

    def _flush_prefix_pending(self, keep_last: int = 0) -> None:
        """Materialize queued async host-parks into the prefix cache (see
        _prefix_hidden). keep_last=1 leaves the newest entry in flight so its
        D2H keeps overlapping the current batch's compute."""
        q = self._prefix_pending
        while len(q) > keep_last:
            j, h = q.pop(0)
            self._prefix_cache[j] = np.asarray(jax.device_get(h))

    def _note_prefix_cost(self, kind: str, dt: float) -> None:
        """EWMA of measured per-batch prefix costs; demote cache_host ->
        recompute once uploads are measured slower than recomputing (only
        for prefix="auto" — explicit modes are never overridden)."""
        prev = self._prefix_costs.get(kind)
        self._prefix_costs[kind] = dt if prev is None else 0.7 * prev + 0.3 * dt
        self._prefix_costs[kind + "_n"] = self._prefix_costs.get(kind + "_n", 0) + 1
        if (self._prefix_auto and self._prefix_mode == "cache_host"
                and self._prefix_costs.get("upload_n", 0) >= 8
                and self._prefix_costs.get("fwd_n", 0) >= 2
                and self._prefix_costs["upload"] > self._prefix_costs["fwd"]):
            logger.info(
                "prefix cache_host demoted to recompute: measured upload "
                "%.3fs/batch > prefix forward %.3fs/batch",
                self._prefix_costs["upload"], self._prefix_costs["fwd"])
            self._prefix_mode = "recompute"
            self._prefix_cache = None
            self._prefix_pending = []

    def _h2d_bandwidth(self) -> float:
        """Measured host->device bandwidth in bytes/s (one 32 MiB probe,
        cached). On a healthy PCIe host this is ~10 GB/s; through this
        container's axon tunnel it measures ~40 MB/s — a 250x spread that
        flips the cache_host-vs-recompute decision, so it must be measured,
        not assumed."""
        if self._h2d_bw is None:
            probe = np.zeros((32 << 20,), np.uint8)
            jax.block_until_ready(jax.device_put(probe[: 1 << 20]))  # warm path
            t0 = time.time()
            jax.block_until_ready(jax.device_put(probe))
            self._h2d_bw = probe.nbytes / max(time.time() - t0, 1e-9)
            logger.info("measured h2d bandwidth: %.1f MB/s", self._h2d_bw / 2**20)
        return self._h2d_bw

    def _d2h_bandwidth(self) -> float:
        """Measured device->host bandwidth in bytes/s (one 8 MiB probe,
        cached). NOT the mirror of _h2d_bandwidth: through this container's
        tunnel the two directions are INDEPENDENTLY sick — measured h2d
        389 MB/s while d2h read 1.7 MB/s in the same minute (2026-08-20),
        which turned the parallel path's ~3.2 GB gram-basis host-parking
        into the critical path. 8 MiB keeps the probe itself cheap when the
        direction is sick (~5 s at 1.7 MB/s vs ~19 s for 32 MiB)."""
        if self._d2h_bw is None:
            probe = jax.device_put(np.zeros((8 << 20,), np.uint8))
            warm = jax.device_put(np.zeros((1 << 20,), np.uint8))
            np.asarray(jax.device_get(warm))  # warm the d2h path
            del warm
            t0 = time.time()
            np.asarray(jax.device_get(probe))
            self._d2h_bw = probe.nbytes / max(time.time() - t0, 1e-9)
            del probe
            logger.info("measured d2h bandwidth: %.1f MB/s", self._d2h_bw / 2**20)
        return self._d2h_bw

    def _choose_prefix_cache(self, batches, p_min: int = 0) -> str:
        """Pick the prefix mode for prefix="auto" by where the boundary
        activations fit AND what they cost to move: on device ("cache" —
        also saves the prefix FLOPs every round); else compare host RAM
        ("cache_host": prefix FLOPs once, but one boundary re-upload per
        sweep batch) against "recompute" (prefix forward every batch every
        round, no transfers) using the MEASURED h2d bandwidth — through this
        container's tunnel an upload of one 33 MB boundary costs ~0.9 s,
        more than re-running a 25-layer 7B prefix forward on the MXU, which
        a naive "host RAM is free" policy got wrong by +750 s on the 7B
        bench. Identical selection either way (pinned by
        tests/test_engine_prefix.py); this is purely a placement decision."""
        import os

        if jax.default_backend() == "cpu":
            # correctness runs; recompute keeps tests' memory flat and the
            # parity tests exercise cache/cache_host explicitly
            return "recompute"
        try:
            from grasp_tpu.perf import device_memory

            rows = sum(int(b["input_ids"].shape[0]) for b in batches)
            seq = int(batches[0]["input_ids"].shape[-1])
            itemsize = jnp.dtype(self.config.dtype).itemsize
            need = rows * seq * self.config.hidden_size * itemsize
            pool = float(os.environ.get("GRASP_HBM_GIB", 15.75)) * 2**30
            live = device_memory()["bytes_in_use"]
            # leave room for the sweep's grad arena + select-phase eigh
            # (both ~1.3-1.7 GiB beyond params at 7B) plus slack
            if need < pool - live - 6 * 2**30:
                return "cache"
            host_free = os.sysconf("SC_AVPHYS_PAGES") * os.sysconf("SC_PAGE_SIZE")
            if need < 0.5 * host_free:
                # steady-state cost per sweep batch: re-upload (cache_host)
                # vs prefix forward (recompute), at a conservative 40% MFU
                batch_rows = int(batches[0]["input_ids"].shape[0])
                boundary_bytes = batch_rows * seq * self.config.hidden_size * itemsize
                upload_s = boundary_bytes / self._h2d_bandwidth()
                # cache_host also pays a ONE-TIME d2h capture of every
                # boundary, amortized over the sweep passes that reuse it
                # (>=4 everywhere: 4+ chunks parallel, 14 rounds sequential).
                # The d2h direction is independently sick on this tunnel
                # (1.7 MB/s measured against 389 MB/s h2d) — at that rate the
                # capture alone is ~19 s/batch and recompute must win.
                capture_s = boundary_bytes / self._d2h_bandwidth() / 4.0
                p_prefix = sum(
                    int(np.prod(a.shape)) for lp in self.params["layers"][:p_min]
                    for a in jax.tree.leaves(lp)
                )
                prefix_flops = 2.0 * p_prefix * batch_rows * seq
                recompute_s = prefix_flops / (0.4 * 197e12)
                logger.info(
                    "prefix auto: upload %.3fs + amortized capture %.3fs vs "
                    "recompute %.3fs per batch", upload_s, capture_s,
                    recompute_s)
                if upload_s + capture_s < recompute_s:
                    return "cache_host"
        except Exception as e:  # pragma: no cover - backend quirks
            logger.debug("prefix auto sizing failed: %s", e)
        return "recompute"

    def get_dense_gradients(
        self, names: List[str], calibration_batches: Iterable[Batch],
        after_dispatch=None,
    ) -> Dict[str, jax.Array]:
        """Sum over batches of dL/d(kernel) for the named dense projections.

        after_dispatch: optional callable invoked once the sweep is IN FLIGHT
        on the device (fused path: right after the one dispatch; loop path:
        after the first batch) — the hook for queueing transfers that should
        ride the tunnel while the chip computes (issuing them *before* the
        sweep would delay the sweep's own dispatch behind them)."""
        for n in names:
            if "kernel" not in self._get_proj(n):
                raise ValueError(f"{n} is not a dense projection")
        split = tuple(sorted({parse_module_name(n)[0] for n in names}))
        if self._fused_sweep_ok(calibration_batches):
            k_dict = {n: self._get_proj(n)["kernel"] for n in names}
            try:
                return self._fused_dense_sweep(split, k_dict, calibration_batches,
                                               after_dispatch)
            except Exception as e:  # pragma: no cover - compiler-dependent
                # the axon remote compiler is known to 500 on some large scan
                # graphs — the per-batch loop below computes the identical
                # sums, just slower
                logger.warning("fused sweep failed (%s: %s) — falling back "
                               "to the per-batch loop", type(e).__name__, e)
        sl = self._prefix_layer if all(li >= self._prefix_layer for li in split) else 0
        key = ("dgrad", self.plan, split, sl)
        if key not in self._grad_fns:
            self._grad_fns[key] = self._make_dense_grad_fn(self.plan, split, sl)
        grad_fn = self._grad_fns[key]

        k_dict = {n: self._get_proj(n)["kernel"] for n in names}
        # accumulators ride the graph as a donated arg (see
        # _make_dense_grad_fn): XLA aliases them in place, so the sweep keeps
        # exactly ONE grad-sized copy per module. 0 + g == g in bf16/fp32, so
        # the zero init is fp-exact vs the old first-batch assignment.
        totals: Dict[str, jax.Array] = {
            n: jnp.zeros(k.shape, k.dtype) for n, k in k_dict.items()}
        t_stage = time.time()
        first_batch = True
        prev_sync = None
        for i, batch in enumerate(calibration_batches):
            batch = self._place_batch(batch)
            h0 = self._prefix_hidden(i, batch, not first_batch) if sl else None
            if first_batch:
                _prime(grad_fn, k_dict, self.params, h0, batch["input_ids"],
                       batch.get("attention_mask"), batch["labels"], totals)
            loss_out, totals = grad_fn(
                k_dict, self.params, h0, batch["input_ids"],
                batch.get("attention_mask"), batch["labels"], totals
            )
            if first_batch:
                # first dispatch per plan includes the jit compile — record it
                # separately so per-stage tables can split compile vs sweep
                _force_done(totals)
                self._stage("grad_first_batch", time.time() - t_stage)
                first_batch = False
                if after_dispatch is not None:
                    after_dispatch()  # sweep under way: overlap transfers
            elif prev_sync is not None:
                # one-deep pipeline: batch i's prefix upload (issued above,
                # async) rides the tunnel while batch i-1 computes; syncing on
                # the PREVIOUS loss bounds in-flight boundary buffers to two
                # (an unthrottled loop would queue all 64 x 33 MB uploads into
                # HBM next to the 7B params)
                _force_done(prev_sync)
            prev_sync = loss_out
        # block_until_ready can LIE through the axon tunnel (returns before
        # the queued work drains, CLAUDE.md) — fetch a real element so the
        # stage boundary is honest and the next stage isn't billed for the
        # sweep's tail
        _force_done(totals)
        self._stage("grad_sweep", time.time() - t_stage)
        return totals

    def _start_compile_prefetch(self, units, calibration_batches, cfg: GraspConfig):
        """Compile every sweep unit's graphs AHEAD of their first dispatch.

        The gram_device 7B run is compile-bound: each of the 14 rounds pays a
        ~30 s remote compile for its suffix grad graph (the plan changes every
        round) plus per-shape selection/truncation compiles — 420 s +
        most of 527 s of the 1301 s e2e, all serial with the chip idle.
        Both are fully determined BEFORE any sweep runs when ranks come from
        a fixed compression_ratio: round r's plan is round r-1's plan with
        its targets switched to rank-k low-rank (k = preserve_rank), and the
        param tree evolves shape-deterministically. So: build every round's
        jit fn (main thread, cheap tracing closures) and hand ShapeDtypeStruct
        lowering + compilation to a daemon worker — the XLA client compiles on
        the host/compile service while the TPU runs earlier rounds' sweeps.
        The sweep's own _prime then hits a warm cache.

        units: list of (split_layers, names) in execution order — one entry
        per sequential (layer, block) round OR per parallel-mode sweep chunk
        (the fast path's chunks are multi-layer sweep units; same plan
        evolution, same primes).

        Returns a stop() callable (sets a flag the worker checks between
        tasks). No-ops (returns None) for adaptive selection (ranks unknown
        upfront), mesh runs (lowering would need shardings), or empty rounds.
        """
        import os
        import threading

        if self.mesh is not None or cfg.compression_ratio is None or not units:
            return None
        # On CPU the compiles are local and the worker would fight the main
        # loop for the same cores (this container has ONE) — prefetch only
        # pays when compilation happens off-thread (remote service / TPU
        # toolchain). GRASP_COMPILE_PREFETCH=1/0 overrides for tests.
        knob = os.environ.get("GRASP_COMPILE_PREFETCH")
        if knob == "0" or (knob != "1" and jax.default_backend() == "cpu"):
            return None
        try:
            batch0 = calibration_batches[0]
        except (TypeError, IndexError, KeyError):
            return None

        sds = jax.ShapeDtypeStruct
        as_sds = lambda x: sds(jnp.shape(x), x.dtype)  # noqa: E731
        ids_sds = as_sds(batch0["input_ids"])
        labels_sds = as_sds(batch0["labels"])
        mask = batch0.get("attention_mask")
        mask_sds = as_sds(mask) if mask is not None else None

        sim = jax.tree.map(as_sds, self.params)
        plan = self.plan
        sl = self._prefix_layer
        fused = self._fused_sweep_ok(calibration_batches)
        if fused:
            # the sweep will take the fused one-dispatch path — prime THOSE
            # graphs (scan over the [N, ...] stacks, monolithic body)
            n_b = len(calibration_batches)
            stk = lambda s: sds((n_b,) + tuple(s.shape), s.dtype)  # noqa: E731
            ids_stk, labels_stk = stk(ids_sds), stk(labels_sds)
            mask_stk = stk(mask_sds) if mask_sds is not None else None
        h0_sds = None
        if not fused and sl and all(min(split) >= sl for split, _ in units):
            try:
                h0_sds = jax.eval_shape(self._get_prefix_fn(),
                                        self._prefix_params(sim), ids_sds,
                                        mask_sds)
            except Exception as e:  # pragma: no cover - backend-dependent
                logger.debug("prefix eval_shape failed, no compile prefetch: %s", e)
                return None

        tasks: List[Tuple[str, Any]] = []
        seen_primes = set()
        for split, names in units:
            k_sds = {}
            for n in names:
                li, group, proj = parse_module_name(n)
                if group == "block_sparse_moe":
                    k_sds[n] = sim["layers"][li]["moe"]["experts"][proj]
                else:
                    k_sds[n] = sim["layers"][li][group][proj]["kernel"]
            if fused:
                with_mask = mask_stk is not None
                key = ("fsweep", plan, split, with_mask)
                if key not in self._grad_fns:
                    self._grad_fns[key] = self._make_fused_sweep_fn(
                        plan, split, with_mask)
                gf = self._grad_fns[key]
                args = ((k_sds, sim, ids_stk, mask_stk, labels_stk, k_sds)
                        if with_mask
                        else (k_sds, sim, ids_stk, labels_stk, k_sds))
            else:
                this_sl = sl if min(split) >= sl else 0
                key = ("dgrad", plan, split, this_sl)
                if key not in self._grad_fns:
                    self._grad_fns[key] = self._make_dense_grad_fn(plan, split, this_sl)
                gf = self._grad_fns[key]
                args = (k_sds, sim, h0_sds if this_sl else None, ids_sds,
                        mask_sds, labels_sds, k_sds)  # totals: k_dict shapes
            tasks.append((f"dgrad L{'.'.join(map(str, split))}",
                          partial(_prime_strict, gf, *args)))

            # selection/truncation primes (mirroring compress_round's
            # gram-shape eigh batching) + simulate this round's compression
            for g_names, gshape, stacked in _gram_eigh_batches(
                names,
                lambda n: k_sds[n].shape,
                lambda n: self.module_ratios.get(n, cfg.compression_ratio),
            ):
                for n in g_names:
                    shape = tuple(k_sds[n].shape)
                    in_f, out_f = shape[-2], shape[-1]
                    ratio = self.module_ratios.get(n, cfg.compression_ratio)
                    k = preserve_rank(in_f, out_f, ratio)
                    if self.svd_method == "gram_device" and not cfg.merge:
                        from grasp_tpu.ops.svd import (
                            ufree_prime_select,
                            ufree_prime_truncate,
                        )

                        kern = sds(shape, k_sds[n].dtype)
                        side = "u" if out_f <= in_f else "v"
                        idx_shape = shape[:-2] + (k,)
                        pkey = (shape, str(kern.dtype), k, cfg.metric)
                        if pkey not in seen_primes:
                            seen_primes.add(pkey)
                            tasks.append((
                                f"ufree {shape} k={k}",
                                partial(_prime_ufree_pair, ufree_prime_select,
                                        ufree_prime_truncate, kern, cfg.metric,
                                        idx_shape, side),
                            ))
                    sim, plan = self._sim_compress_shapes(sim, plan, n, k, cfg.merge)
                if (stacked and self.svd_method == "gram_device"
                        and not cfg.merge):
                    from grasp_tpu.ops.svd import ufree_prime_eigh_multi

                    g_sds = sds(gshape, jnp.float32)
                    ekey = ("eigh", len(g_names), g_sds.shape)
                    if ekey not in seen_primes:
                        seen_primes.add(ekey)
                        tasks.append((
                            f"ufree eigh x{len(g_names)} {g_sds.shape}",
                            partial(ufree_prime_eigh_multi, g_sds,
                                    len(g_names)),
                        ))

        stop = {"flag": False}

        def _worker():
            for desc, task in tasks:
                if stop["flag"]:
                    return
                try:
                    task()
                except Exception as e:  # pragma: no cover - backend quirks
                    logger.debug("compile prefetch failed (%s): %s", desc, e)

        th = threading.Thread(target=_worker, daemon=True, name="grasp-compile-prefetch")
        th.start()

        def _stop():
            stop["flag"] = True

        return _stop

    def _sim_compress_shapes(self, sim, plan, name: str, k: int, merge: bool):
        """Advance the ShapeDtypeStruct param tree + plan past one module's
        compression (mirrors _compile_truncated/_set_proj exactly)."""
        sds = jax.ShapeDtypeStruct
        li, group, proj = parse_module_name(name)
        layers = list(sim["layers"])
        layer = dict(layers[li])
        if group == "block_sparse_moe":
            moe = dict(layer["moe"])
            ex = dict(moe["experts"])
            kern = ex.pop(proj)
            lead, (in_f, out_f), dt = kern.shape[:-2], kern.shape[-2:], kern.dtype
            if merge:
                ex[proj] = kern
            else:
                ex[proj + "_a"] = sds(lead + (in_f, k), dt)
                ex[proj + "_b"] = sds(lead + (k, out_f), dt)
            moe["experts"] = ex
            layer["moe"] = moe
        else:
            grp = dict(layer[group])
            mod = dict(grp[proj])
            kern = mod.pop("kernel")
            (in_f, out_f), dt = kern.shape, kern.dtype
            if merge:
                mod["kernel"] = kern
            else:
                mod["in_kernel"] = sds((in_f, k), dt)
                mod["out_kernel"] = sds((k, out_f), dt)
            grp[proj] = mod
            layer[group] = grp
            plan = plan_set(plan, li, proj, "dense" if merge else "lowrank")
        layers[li] = layer
        return {**sim, "layers": layers}, plan

    def _svd_of_dense(self, names: List[str]) -> Dict[str, Tuple[jax.Array, jax.Array, jax.Array]]:
        """Host SVD of the named dense kernels (torch [out,in] layout), grouped
        by shape for batched factorization."""
        t_stage = time.time()
        by_shape: Dict[Tuple[int, int], List[str]] = {}
        for n in names:
            kernel = self._get_proj(n)["kernel"]
            by_shape.setdefault(tuple(kernel.shape), []).append(n)
        out: Dict[str, Tuple[jax.Array, jax.Array, jax.Array]] = {}
        for shape, group in by_shape.items():
            t_shape = time.time()
            # gram_device on big matrices: one matrix at a time — an fp32
            # stack of three 4096x11008 kernels plus its eigh workspace spikes
            # HBM ~1.8 GiB, which a 7B run cannot spare; the per-matrix eigh
            # is MXU-efficient at these sizes anyway
            unstacked = (
                self.svd_method == "gram_device"
                and min(shape[-2:]) * max(shape[-2:]) >= 2048 * 2048
            )
            if unstacked:
                for n in group:
                    w = jnp.swapaxes(self._get_proj(n)["kernel"], -1, -2).astype(jnp.float32)
                    try:
                        u, s, vh = svd(w, method=self.svd_method, mesh=self.mesh)
                        _force_done([s])
                    except Exception as e:
                        # transient HBM pressure (allocator fragmentation
                        # right after a sweep): free what we can and retry
                        # once before surfacing
                        logger.warning("svd retry for %s after %s", n, e)
                        import gc

                        gc.collect()
                        u, s, vh = svd(w, method=self.svd_method, mesh=self.mesh)
                        _force_done([s])
                    out[n] = (u, s, vh)
            else:
                stack = jnp.stack(
                    [jnp.swapaxes(self._get_proj(n)["kernel"], -1, -2).astype(jnp.float32) for n in group]
                )
                u, s, vh = svd(stack, method=self.svd_method, mesh=self.mesh)
                for i, n in enumerate(group):
                    out[n] = (u[i], s[i], vh[i])
            _force_done([out[n][1] for n in group])  # honest stage boundary
            self._stage(f"svd_{shape[-1]}x{shape[-2]}", time.time() - t_shape)
        self._stage("svd", time.time() - t_stage)
        return out

    def compress_round(
        self,
        layer_id: int,
        block_type: str,
        target_layer_types: Optional[Union[List[str], str]],
        calibration_batches: Sequence[Batch],
        cfg: GraspConfig,
        svd_future=None,
        svd_after: bool = False,
    ) -> bool:
        """One (layer, block) compression round via the dense-gradient path,
        with the host SVD overlapped with the TPU gradient sweep.

        svd_future: optional concurrent.futures.Future resolving to
        {name: (u, s, vh)} — supplied by run()'s cross-round prefetcher (every
        SVD factors *original* dense weights, so they can all start at t=0).
        svd_after: run the SVD inline AFTER the sweep instead of overlapped —
        for all-on-device SVD (gram_device) at 7B scale, where fp32 factors
        resident during the sweep push HBM past the limit (the sweep alone
        peaks at 13.8 of 15.75 GiB)."""
        if target_layer_types is None:
            return True
        defaults = self._block_targets(layer_id, block_type)
        targets = _resolve_targets(defaults, target_layer_types)
        if not all(t in defaults for t in targets):
            raise ValueError(f"values in target layer types not valid, should be one of {defaults}")

        names = [module_name(layer_id, p) for p in targets]
        logger.info("compress round: layer %d %s (%d targets)",
                    layer_id, block_type, len(names))

        if svd_future is not None:
            grads = self.get_dense_gradients(names, calibration_batches)
            svd_out = svd_future.result()
        elif svd_after:
            grads = self.get_dense_gradients(names, calibration_batches)
            self._select_compile_after_sweep(names, grads, cfg)
            return False
        else:
            svd_out, grads = self._svd_overlapping_grads(names, calibration_batches)

        self._select_compile_many(names, svd_out, grads, cfg)
        return False

    def _sweep_chunks(
        self, layer_names: List[Tuple[int, List[str]]], cfg: GraspConfig,
        park: bool = True,
    ) -> List[List[Tuple[int, List[str]]]]:
        """Split the parallel fast path's layer list into per-sweep chunks.

        See GraspConfig.sweep_chunk_layers: int N = N layers per chunk,
        0 = single sweep, None = auto (largest N whose resident grad
        accumulators fit next to live params and the sweep/selection
        working sets). park: whether selection will run from host-parked
        bases (grads never meet the eigh arena) or on device (they do —
        tighter auto budget, see _auto_sweep_chunk).

        Chunks are END-aligned (remainder FIRST: [1,2,2,2] for 7 layers at
        N=2, not [2,2,2,1]): the first chunk's on-device selection runs its
        eigh arena next to the FULL uncompressed model, while every later
        chunk sees already-compressed layers (~90% lighter at typical
        ratios) — so the first chunk must carry the smallest grad/eigh
        footprint. Layer order within the list is preserved."""
        n = cfg.sweep_chunk_layers
        if n is None and not park and jax.default_backend() == "tpu":
            # on-device selection: chunk sizes GROW as compression sheds
            # params ([1,2,3,1] at 7B instead of 7x[1] — each chunk's sweep
            # pays a ~25 s full-prefix forward, so fewer sweeps is wall-clock)
            sizes = self._grow_sweep_chunks(layer_names, cfg)
            if sizes is None:
                return [layer_names]
            out, i = [], 0
            for m in sizes:
                out.append(layer_names[i:i + m])
                i += m
            return out
        if n is None:
            n = self._auto_sweep_chunk(layer_names, park)
        if not n or n <= 0 or n >= len(layer_names):
            return [layer_names]
        out = []
        i = len(layer_names)
        while i > 0:
            take = min(n, i)
            out.append(layer_names[i - take:i])
            i -= take
        out.reverse()
        return out

    def _grow_sweep_chunks(
        self, layer_names: List[Tuple[int, List[str]]], cfg: GraspConfig,
        limit_bytes: Optional[float] = None,
        params_bytes: Optional[float] = None,
    ) -> Optional[List[int]]:
        """Growing chunk sizes for the on-device selection path.

        Constraint per chunk (see _auto_sweep_chunk park=False): live params
        + the chunk's grad accumulators + the QDWH arena must clear the
        chip's effective ceiling. Live params SHRINK as chunks compile
        (~90% of a layer's bytes at the paper ratio), so later chunks can
        sweep more layers per full-prefix forward. Shed is estimated from
        preserve_rank per module (0 for merge mode — merged modules keep
        their dense shape — and for adaptive ratios, whose rank is unknown
        upfront: both degenerate to fixed-size chunks). Returns chunk sizes
        front-to-back, or None when one sweep holds everything."""
        limit = limit_bytes if limit_bytes is not None else self._hbm_limit_bytes()
        params_now = params_bytes if params_bytes is not None else sum(
            x.size * x.dtype.itemsize for x in jax.tree.leaves(self.params))
        reserve = max(1.0 * 2**30, _EIGH_ARENA_BUDGET) + 1.2 * 2**30
        grads_b, shed_b = [], []
        for _, nn in layer_names:
            g = s = 0.0
            for n in nn:
                kern = self._get_proj(n)["kernel"]
                in_f, out_f = int(kern.shape[-2]), int(kern.shape[-1])
                lead = int(np.prod(kern.shape[:-2], dtype=np.int64)) if len(
                    kern.shape) > 2 else 1
                kb = float(kern.size * kern.dtype.itemsize)
                g += kb
                ratio = self.module_ratios.get(n, cfg.compression_ratio)
                if ratio is not None and not cfg.merge:
                    k = preserve_rank(in_f, out_f, ratio)
                    kept = lead * (in_f * k + k * out_f) * kern.dtype.itemsize
                    s += max(kb - kept, 0.0)
            grads_b.append(g)
            shed_b.append(s)
        if limit - params_now - reserve >= sum(grads_b):
            return None  # one sweep holds everything
        sizes: List[int] = []
        i = 0
        while i < len(layer_names):
            budget = limit - params_now - reserve
            m, acc = 0, 0.0
            while i + m < len(layer_names) and (
                    m == 0 or acc + grads_b[i + m] <= budget):
                acc += grads_b[i + m]
                m += 1
            params_now -= sum(shed_b[i:i + m])
            sizes.append(m)
            i += m
        return sizes

    def _auto_sweep_chunk(
        self, layer_names: List[Tuple[int, List[str]]], park: bool = True
    ) -> int:
        """Largest layers-per-sweep that keeps grad accumulators resident.

        The one-sweep fast path holds a kernel-sized (kernel-dtype) grad
        accumulator per target module for the whole sweep, and the post-sweep
        gram selection holds the unconsumed accumulators next to the eigh
        arena. Budget: HBM limit − live params − reserve. 0 = everything
        fits in one sweep (always, off-TPU: virtual CPU devices have host
        RAM).

        park=True (host-parked bases): grads coexist with the sweep working
        set (~1.0 GiB measured at 7B via executable_memory) OR the eigh
        arena — never both (all eighs run before any sweep) — reserve
        max(1.0 GiB, arena) + 0.5 GiB slack.

        park=False (on-device after-sweep selection, the TPU default): the
        chunk's unconsumed grads ARE resident under the QDWH arena, and the
        chip's EFFECTIVE ceiling is ~1.15 GiB below the nominal limit (the
        r4 OOM at 14.6 GiB computed demand on a 15.75 GiB chip) — reserve
        arena + 1.2 GiB. At 7B this yields 1-layer chunks (12.55 params +
        0.39 grads + 1.36 arena = 14.3 GiB < 14.6): three more ~25 s sweeps
        than the parked path's 2-layer chunks, in exchange for ZERO tunnel
        transfer."""
        if jax.default_backend() != "tpu":
            return 0
        limit = self._hbm_limit_bytes()
        params_bytes = sum(
            x.size * x.dtype.itemsize for x in jax.tree.leaves(self.params))
        if park:
            reserve = max(1.0 * 2**30, _EIGH_ARENA_BUDGET) + 0.5 * 2**30
        else:
            reserve = max(1.0 * 2**30, _EIGH_ARENA_BUDGET) + 1.2 * 2**30
        budget = limit - params_bytes - reserve
        per_layer = max(
            sum(int(np.prod(self._get_proj(n)["kernel"].shape))
                * self._get_proj(n)["kernel"].dtype.itemsize
                for n in nn)
            for _, nn in layer_names
        )
        if budget >= per_layer * len(layer_names):
            return 0
        return max(1, int(budget // per_layer))

    def _hbm_limit_bytes(self) -> float:
        """Per-chip HBM capacity: backend-reported when available, else the
        GRASP_HBM_GIB override (default 15.75 — axon's memory_stats is None)."""
        try:
            stats = jax.devices()[0].memory_stats()
            if stats and stats.get("bytes_limit"):
                return float(stats["bytes_limit"])
        except Exception:  # pragma: no cover - backend-dependent
            pass
        return float(os.environ.get("GRASP_HBM_GIB", 15.75)) * 2**30

    def _should_park_bases(self, names: List[str]) -> bool:
        """Park gram bases in host RAM (parallel fast path) or keep selection
        on-device per chunk?

        Parking buys arena-friendly ordering (every eigh runs before any grad
        accumulator exists, so 2-layer sweep chunks fit at 7B) at the price
        of a full basis round-trip over the tunnel (~3.2 GB fp32 each way at
        7B — 108.9 s of sel_importance re-uploads alone in the r4 612.6 s
        run, and the two tunnel directions fail independently). On-device
        after-sweep selection moves ZERO bytes: with end-aligned 1-layer
        chunks (see _auto_sweep_chunk park=False) the chunk grads fit next
        to the eigh arena under the full model, costing only ~3 extra ~25 s
        sweeps at 7B — strictly cheaper than the parking legs at any tunnel
        bandwidth this container has ever measured. TPU default is therefore
        ON-DEVICE; GRASP_PARK_BASES=1 restores host parking (kept
        bit-identical by tests/test_engine_prefix.py::
        test_parallel_no_parking_matches_parked). Off-TPU (virtual CPU
        meshes) parking stays the default: transfers are host memcpys and
        the single-chunk sweep keeps test behavior unchanged.
        """
        env = os.environ.get("GRASP_PARK_BASES")
        if env is not None:
            return env != "0"
        if jax.default_backend() != "tpu":
            return True  # virtual CPU meshes: host RAM, transfers are memcpy
        logger.info("bases parking: off (on-device after-sweep selection; "
                    "GRASP_PARK_BASES=1 restores host parking)")
        return False

    def _precompute_gram_bases(self, names: List[str]) -> Dict[str, tuple]:
        """Stacked gram eighs for every target BEFORE any sweep; bases parked
        in host RAM.

        The gram basis depends only on the ORIGINAL dense kernel, which the
        fast path never modifies before the module's own compile — so the
        eigh stage (a 1.4-1.9 GiB QDWH arena per executable) runs while NO
        grad accumulators are resident. Running it after a chunk's sweep
        put arena + params + chunk grads past the chip's effective ceiling
        (~14.6 GiB observed: the r3 G=4 OOM and this round's G=2-with-grads
        OOM bracket it). (s, basis) go to host as each stack completes
        (async D2H overlapped with the next stack's eigh; ~64 MB fp32 per
        4096-dim module) and re-upload per module at selection time.
        Returns {name: (s_np, basis_np)}.
        """
        from grasp_tpu.ops.svd import ufree_eigh_multi, ufree_gram

        t0 = time.time()
        hbm_free = None
        if jax.default_backend() == "tpu":
            # everything resident right now (the full model at 7B: 12.55 GiB)
            # stays resident under the arena; 1.3 GiB slack covers axon
            # dispatch-copy quirks + allocator fragmentation (the r4 attempt-3
            # OOM at ~14.6 GiB computed demand calibrates it)
            live = sum(
                x.size * x.dtype.itemsize for x in jax.tree.leaves(self.params))
            hbm_free = self._hbm_limit_bytes() - live - 1.3 * 2**30
        groups = _gram_select_groups(
            names,
            lambda n: self._get_proj(n)["kernel"].shape,
            # group by shape only: the eigh doesn't depend on the ratio, and
            # a constant key lets disparate-ratio modules share stacks
            lambda n: 0.0,
            hbm_free=hbm_free,
        )
        pending: List[Tuple[str, jax.Array, jax.Array]] = []
        out: Dict[str, tuple] = {}

        def _drain():
            while pending:
                n, s_d, b_d = pending.pop(0)
                out[n] = (np.asarray(s_d), np.asarray(b_d))

        for g_names, _, _, stacked in groups:
            grams = [ufree_gram(self._get_proj(n)["kernel"]) for n in g_names]
            # previous stack's async D2H gets the gram-build time to fly, then
            # must be OFF-DEVICE before this stack's arena spins up — keeping
            # the pending fp32 bases resident under the eigh is what tipped
            # the r4 7B precompute over the HBM ceiling
            _drain()
            if len(grams) > 1:
                s_list, b_list = map(list, ufree_eigh_multi(*grams))
            else:
                from grasp_tpu.ops.svd import ufree_eigh

                s1, b1 = ufree_eigh(grams[0])
                s_list, b_list = [s1], [b1]
            del grams
            _force_done(s_list[-1])
            for i, n in enumerate(g_names):
                try:  # overlap D2H with the next stack's eigh
                    s_list[i].copy_to_host_async()
                    b_list[i].copy_to_host_async()
                except Exception:  # pragma: no cover - backend-dependent
                    pass
                pending.append((n, s_list[i], b_list[i]))
                s_list[i] = b_list[i] = None
        _drain()
        self._stage("sel_eigh", time.time() - t0)
        return out

    def _select_compile_from_bases(
        self,
        names: List[str],
        grads: Dict[str, jax.Array],
        bases: Dict[str, tuple],
        cfg: GraspConfig,
    ) -> None:
        """Selection+truncation+compile from host-parked gram bases (see
        _precompute_gram_bases). Per module: upload basis (one 64 MB H2D,
        prefetched one module ahead so it hides behind the previous module's
        truncate/compile), importance from the resident grads, top-k select,
        U-free truncate, compile, free."""
        from grasp_tpu.ops.svd import ufree_importance, ufree_truncate_kernel

        t_stage = time.time()
        indices_dict: Dict[str, np.ndarray] = {}
        dev = {}

        def _upload(n):
            s_np, b_np = bases.pop(n)
            dev[n] = (jax.device_put(jnp.asarray(s_np)),
                      jax.device_put(jnp.asarray(b_np)))

        if names:
            _upload(names[0])
        for i, n in enumerate(names):
            t_m = time.time()
            if i + 1 < len(names):
                _upload(names[i + 1])  # prefetch next module's basis
            kernel = self._get_proj(n)["kernel"]
            s, basis = dev.pop(n)
            side = "u" if kernel.shape[-1] <= kernel.shape[-2] else "v"
            t1 = time.time()
            importance = ufree_importance(
                kernel, grads.pop(n), s, basis, cfg.metric)
            indices = self._select_indices(
                n, importance, s, kernel.shape[-2], kernel.shape[-1], cfg,
                indices_dict)
            self._stage("sel_importance", time.time() - t1)
            t1 = time.time()
            ut, st, vht = ufree_truncate_kernel(
                kernel, s, basis, side, jnp.asarray(indices))
            del s, basis
            self._compile_truncated(n, ut, st, vht, cfg)
            self._stage("sel_truncate", time.time() - t1)
            self._stage("svd_select_one", time.time() - t_m)

        self.indices_dict = indices_dict
        self.indices_log.update(indices_dict)
        self._stage("select_compile", time.time() - t_stage)
        if cfg.verbose:
            for n, idx in indices_dict.items():
                logger.info("%s: %s", n, idx[:128].tolist())

    def _select_compile_after_sweep(
        self, names: List[str], grads: Dict[str, jax.Array], cfg: GraspConfig
    ) -> None:
        """Select+truncate+compile `names` from already-collected dense grads.

        Used when the SVD must run AFTER the sweep (gram_device at 7B: fp32
        factors resident during the sweep push HBM past the limit) and by the
        parallel fast path's per-chunk selection.
        """
        t_stage = time.time()
        indices_dict: Dict[str, np.ndarray] = {}
        if self.svd_method == "gram_device":
            # U-free gram selection: the large singular factor is never
            # materialized (see _select_compile_one_ufree), so the whole
            # per-matrix working set is ~4 gram-sized fp32 buffers — the
            # summed grads can stay on device (no host offload round-trip,
            # which cost 176 s through this container's tunnel at 7B).
            hbm_free = None
            if jax.default_backend() == "tpu":
                # the chunk's unconsumed grad accumulators are resident next
                # to the QDWH arena here (the r4 G=2-with-grads OOM) — cap
                # eigh stacks by the MEASURED headroom, not the static budget
                try:
                    from grasp_tpu.perf import device_memory

                    hbm_free = (self._hbm_limit_bytes()
                                - device_memory()["bytes_in_use"]
                                - 1.3 * 2**30)
                except Exception:  # pragma: no cover - telemetry quirks
                    pass
            sel_groups = _gram_eigh_batches(
                names,
                lambda n: self._get_proj(n)["kernel"].shape,
                lambda n: self.module_ratios.get(n, cfg.compression_ratio),
                hbm_free=hbm_free,
            )
            for g_names, _, stacked in sel_groups:
                t_m = time.time()
                if stacked:
                    self._select_compile_group_ufree(
                        g_names, grads, cfg, indices_dict
                    )
                else:
                    for n in g_names:
                        self._select_compile_one_ufree(
                            n, grads.pop(n), cfg, indices_dict
                        )
                self._stage("svd_select_one", time.time() - t_m)
        else:
            # park the summed grads on the host during the SVD — the
            # on-device eigh needs every spare HBM byte next to 12.55 GiB
            # of 7B params
            t_off = time.time()
            grads = {k: np.asarray(jax.device_get(v)) for k, v in grads.items()}
            self._stage("grad_offload", time.time() - t_off)
            # fully per-matrix pipeline: factor -> project -> truncate ->
            # compile -> FREE before touching the next matrix. Keeping even
            # one finished matrix's fp32 factors (~0.43 GiB) resident
            # during the next eigh (1.6 GiB workspace) OOMed the 7B run.
            for n in names:
                t_m = time.time()
                out_one = self._svd_of_dense([n])
                u, s, vh = out_one.pop(n)
                self._select_compile_one(n, u, s, vh, jnp.swapaxes(grads.pop(n), -1, -2), cfg, indices_dict)
                del u, s, vh
                self._stage("svd_select_one", time.time() - t_m)
        self.indices_dict = indices_dict
        self.indices_log.update(indices_dict)
        self._stage("select_compile", time.time() - t_stage)
        if cfg.verbose:
            for n, idx in indices_dict.items():
                logger.info("%s: %s", n, idx[:128].tolist())

    def _svd_overlapping_grads(
        self, names: List[str], calibration_batches: Sequence[Batch]
    ) -> Tuple[Dict[str, Any], Dict[str, jax.Array]]:
        """Host SVD of `names` in a worker thread, overlapped with the TPU
        gradient sweep; worker exceptions surface after join."""
        import threading

        svd_out: Dict[str, Any] = {}
        err: List[BaseException] = []

        def _worker():
            try:
                svd_out.update(self._svd_of_dense(names))
            except BaseException as e:  # surfaced after join
                err.append(e)

        th = threading.Thread(target=_worker)
        th.start()
        grads = self.get_dense_gradients(names, calibration_batches)
        th.join()
        if err:
            raise err[0]
        return svd_out, grads

    def _select_compile_many(
        self,
        names: List[str],
        svd_out: Dict[str, Any],
        grads: Dict[str, jax.Array],
        cfg: GraspConfig,
    ) -> None:
        """Select+truncate+compile every module in `names`; records
        indices_dict/indices_log and the select_compile stage time."""
        t_stage = time.time()
        indices_dict: Dict[str, np.ndarray] = {}
        for n in names:
            u, s, vh = svd_out.pop(n)
            # dL/dkernel [in,out] -> torch-layout dL/dW [out,in]
            self._select_compile_one(n, u, s, vh, jnp.swapaxes(grads.pop(n), -1, -2), cfg, indices_dict)
            del u, s, vh

        self.indices_dict = indices_dict
        self.indices_log.update(indices_dict)
        self._stage("select_compile", time.time() - t_stage)
        if cfg.verbose:
            for n, idx in indices_dict.items():
                logger.info("%s: %s", n, idx[:128].tolist())

    def _maybe_enable_flash_sweep(self, calibration_batches: Sequence[Batch]) -> None:
        """Route long-sequence calibration sweeps through the Pallas flash
        attention kernel.

        At seq >= ~1k the XLA attention path materializes the [S, S] score
        matrix per head (O(S^2) HBM traffic); the flash kernel streams KV
        tiles through VMEM instead — 2.1x on the isolated op at 4k, a wash
        at 512 (CLAUDE.md), so the switch keys on the calibration sequence
        length. TPU-only (the kernel has no CPU path) and off for models that
        explicitly set use_flash_attention. GRASP_FLASH_SWEEP=0 disables;
        flash reorders the softmax reductions, so sweeps' gradients differ
        from the XLA path at float tolerance (kernel fwd/bwd parity is pinned
        by the TPU-gated tests in tests/test_pallas_attention.py)."""
        import os

        if (
            os.environ.get("GRASP_FLASH_SWEEP", "1") != "0"
            and not self.config.use_flash_attention
            and jax.default_backend() == "tpu"
            and calibration_batches
            and calibration_batches[0]["input_ids"].shape[-1] >= 1024
        ):
            self.config = dataclasses.replace(self.config, use_flash_attention=True)
            logger.info(
                "calibration seq >= 1024 on TPU: sweeps use flash attention"
            )

    def _select_indices(
        self,
        n: str,
        importance: jax.Array,
        s: jax.Array,
        in_f: int,
        out_f: int,
        cfg: GraspConfig,
        indices_dict: Dict[str, np.ndarray],
    ) -> np.ndarray:
        """Rank selection (fixed ratio or adaptive) + inspection bookkeeping."""
        ratio = self.module_ratios.get(n, cfg.compression_ratio)
        if ratio is not None:
            k = preserve_rank(in_f, out_f, ratio)
            # batched importance ([E, m], stacked MoE experts): per-expert
            # top-k in one lax.top_k over the last axis — same tie order
            indices = np.asarray(select_topk(importance, k))
        else:
            assert cfg.threshold_ratio, "Please provide Taylor threshold to select rank adaptively"
            if np.ndim(importance) > 1:
                raise NotImplementedError(
                    "adaptive (threshold_ratio) rank selection over stacked "
                    "MoE experts is not supported — per-expert ranks would be "
                    "ragged; use a fixed compression_ratio"
                )
            indices = np.asarray(adaptive_rank_selection(np.asarray(importance), cfg.threshold_ratio))
        indices_dict[n] = indices
        self.grasp_values_dict[n] = {
            "svd_importance": np.round(np.asarray(importance), 3).tolist(),
            "svd_value": np.round(np.asarray(s), 3).tolist(),
        }
        return indices

    def _compile_truncated(
        self, n: str, ut: jax.Array, st: jax.Array, vht: jax.Array, cfg: GraspConfig
    ) -> None:
        """Materialize the compiled module (merged dense or low-rank pair)."""
        self.rank_dict[n] = int(st.shape[-1])
        mod = self._get_proj(n)
        bias = mod.get("bias")
        # compiled factors take the ORIGINAL kernel's dtype: the SVD runs fp32
        # (so does the reference's — torch.linalg.svd has no half kernels) but
        # leaving fp32 factors inside a bf16 model silently upcasts every
        # compressed matmul to fp32 on the MXU (~2x slower). fp32 models are
        # untouched, so golden factor parity is unaffected.
        dt = mod["kernel"].dtype if "kernel" in mod else jnp.dtype(self.config.dtype)
        if cfg.merge:
            new: Params = {"kernel": jnp.swapaxes(merge_svd(ut, st, vht), -1, -2).astype(dt)}
            if bias is not None:
                new["bias"] = bias
            self._set_proj(n, new, "dense")
        else:
            in_kernel, out_kernel = lowrank_factors(ut, st, vht, cfg.sigma_fuse)
            new = {"in_kernel": in_kernel.astype(dt), "out_kernel": out_kernel.astype(dt)}
            if bias is not None:
                new["bias"] = bias
            self._set_proj(n, new, "lowrank")
        _force_done([self._get_proj(n).get("in_kernel", self._get_proj(n).get("kernel"))])

    def _select_compile_one(
        self,
        n: str,
        u: jax.Array,
        s: jax.Array,
        vh: jax.Array,
        grad_w,
        cfg: GraspConfig,
        indices_dict: Dict[str, np.ndarray],
    ) -> None:
        """Saliency-project, select, truncate, and compile ONE module."""
        sg = sigma_gradients(u, vh, jnp.asarray(grad_w))
        importance = svd_saliency(sg, s, cfg.metric)
        indices = self._select_indices(
            n, importance, s, vh.shape[-1], u.shape[-2], cfg, indices_dict
        )
        ut, st, vht = truncate_svd(u, s, vh, jnp.asarray(indices))
        self._compile_truncated(n, ut, st, vht, cfg)

    def _select_compile_one_ufree(
        self,
        n: str,
        grad_kernel: jax.Array,
        cfg: GraspConfig,
        indices_dict: Dict[str, np.ndarray],
    ) -> None:
        """Gram-path selection WITHOUT materializing the large singular factor.

        Saliency via the substitution u_i = W v_i / sigma_i (ops.svd
        ufree_select): only the gram eigh, two gram-sized matmuls, and
        a k-column reconstruction run — vs the full-U path's extra
        out_f x min-dim fp32 factor (180 MB at the 7B mlp shapes) and its
        projection einsum. Both dispatches operate on the NATIVE [in, out]
        kernel with transpose/cast in-graph and are AOT-primed — the eager
        torch-layout variant allocated ~900 MB of per-matrix device copies
        and OOMed the 7B run at 13.37 GiB live. Index agreement pinned by
        tests/test_svd.py::test_ufree_gram_selection_matches_full.
        grad_kernel: dL/d(kernel) in jax [in, out] layout.
        """
        from grasp_tpu.ops.svd import ufree_eigh, ufree_gram, ufree_importance

        kernel = self._get_proj(n)["kernel"]  # [in, out]
        # same three primed jits as ufree_select, opened up so the per-stage
        # table splits the serial eigh from the importance/truncate matmuls
        # (the 7B parallel on-device path runs per-matrix here for its
        # tightest-HBM chunks; _force_done syncs cost ~40 ms/module through
        # the tunnel — noise against a 4.4 s eigh)
        t1 = time.time()
        g = ufree_gram(kernel)
        s, basis = ufree_eigh(g)
        del g
        _force_done(s)
        self._stage("sel_eigh", time.time() - t1)
        side = "u" if kernel.shape[-1] <= kernel.shape[-2] else "v"
        t1 = time.time()
        importance = ufree_importance(kernel, grad_kernel, s, basis, cfg.metric)
        in_f, out_f = kernel.shape[-2], kernel.shape[-1]
        indices = self._select_indices(
            n, importance, s, in_f, out_f, cfg, indices_dict
        )
        self._stage("sel_importance", time.time() - t1)
        t1 = time.time()
        ut, st, vht = ufree_truncate_kernel(
            kernel, s, basis, side, jnp.asarray(indices)
        )
        del s, basis
        self._compile_truncated(n, ut, st, vht, cfg)
        self._stage("sel_truncate", time.time() - t1)

    def _select_compile_group_ufree(
        self,
        group: List[str],
        grads: Dict[str, jax.Array],
        cfg: GraspConfig,
        indices_dict: Dict[str, np.ndarray],
    ) -> None:
        """Batched-EIGH U-free selection for same-GRAM-shape modules of one
        round (kernel shapes may differ in the large dimension — the eigh
        stack only needs equal small-side grams; see _gram_eigh_batches).

        Only the eigh — the serial, iteration-bound stage (~9.7 s per 4096^2
        at 7B) — runs [G]-stacked; the gram/saliency/truncation matmuls stay
        per-matrix because their fp32 operands dominate the working set
        (stacking the full ufree_select put a ~2.3 GiB transient next to
        12.8 GiB of live 7B state and OOMed; the gram stack is 67 MB/matrix).
        eigh is row-independent, so results are bit-identical to the
        per-matrix path (tests/test_engine_prefix.py::
        test_gram_stacked_selection_matches_per_matrix). Every device op here
        is a primed jit — stack/slice live INSIDE _ufree_eigh_multi_jit
        because eager device ops on axon leak persistent argument copies."""
        from grasp_tpu.ops.svd import ufree_eigh_multi, ufree_gram, ufree_importance

        t0 = time.time()
        grams = [ufree_gram(self._get_proj(n)["kernel"]) for n in group]
        s_list, b_list = map(list, ufree_eigh_multi(*grams))
        # sync so the sub-stage split is honest (dispatch is async);
        # block_until_ready lies through the axon tunnel — fetch a byte
        _force_done(s_list[-1])
        del grams
        self._stage("sel_eigh", time.time() - t0)
        for i, n in enumerate(group):
            kernel = self._get_proj(n)["kernel"]  # [.., in, out]
            s, basis = s_list[i], b_list[i]
            s_list[i] = b_list[i] = None  # free as we go
            side = "u" if kernel.shape[-1] <= kernel.shape[-2] else "v"
            t1 = time.time()
            importance = ufree_importance(
                kernel, grads.pop(n), s, basis, cfg.metric
            )
            indices = self._select_indices(
                n, importance, s, kernel.shape[-2], kernel.shape[-1], cfg,
                indices_dict,
            )
            self._stage("sel_importance", time.time() - t1)
            t1 = time.time()
            ut, st, vht = ufree_truncate_kernel(
                kernel, s, basis, side, jnp.asarray(indices)
            )
            del s, basis
            self._compile_truncated(n, ut, st, vht, cfg)
            self._stage("sel_truncate", time.time() - t1)

    # ------------------------------------------------------------------
    # Stage 4 — rank selection
    # ------------------------------------------------------------------

    def dynamic_svd_selection(
        self,
        grasp_layer_grads: Optional[Dict[str, jax.Array]] = None,
        metric: str = "taylor",
        compression_ratio: Optional[float] = None,
        threshold_ratio: Optional[float] = None,
        verbose: bool = False,
    ) -> Dict[str, np.ndarray]:
        """Pick which singular triplets to keep per module.

        Reference dynamic_svd_selection (modeling_grasp.py:372-421). Index
        order matches torch.topk (descending importance, lower index on ties).
        """
        if not grasp_layer_grads:
            grasp_layer_grads = self.grasp_layer_grads
        if not grasp_layer_grads:
            raise ValueError("gradients of svd layers should be given, but got None")

        indices_dict: Dict[str, np.ndarray] = {}
        for name, grad in grasp_layer_grads.items():
            mod = self._get_proj(name)
            s = mod["s"]
            importance = svd_saliency(grad, s, metric)

            ratio = self.module_ratios.get(name, compression_ratio)
            if ratio is not None:
                in_f, out_f = mod["vh"].shape[1], mod["u"].shape[0]
                k = preserve_rank(in_f, out_f, ratio)
                indices = np.asarray(select_topk(importance, k))
            else:
                assert threshold_ratio, "Please provide Taylor threshold to select rank adaptively"
                indices = np.asarray(adaptive_rank_selection(np.asarray(importance), threshold_ratio))

            indices_dict[name] = indices
            self.grasp_values_dict[name] = {
                "svd_importance": np.round(np.asarray(importance), 3).tolist(),
                "svd_value": np.round(np.asarray(s), 3).tolist(),
            }

        if verbose:
            logger.info("+" * 100)
            for name, idx in indices_dict.items():
                logger.info("%s", name)
                logger.info("%s", idx[:128].tolist())
            logger.info("+" * 100)

        self.indices_dict = indices_dict
        self.indices_log.update(indices_dict)
        return indices_dict

    # ------------------------------------------------------------------
    # Stage 5 — compile
    # ------------------------------------------------------------------

    def compile_grasp_model(
        self,
        indices_dict: Optional[Dict[str, np.ndarray]] = None,
        merge: bool = False,
        sigma_fuse: str = "UV",
    ) -> None:
        """Truncate kept triplets and materialize the compiled module.

        Reference compile_grasp_model (modeling_grasp.py:423-469): low-rank
        two-matmul module with sqrt(S) fused into both factors ("UV"), or a
        merged dense kernel when merge=True.
        """
        if indices_dict is None:
            indices_dict = self.indices_dict

        for name, indices in indices_dict.items():
            mod = self._get_proj(name)
            u, s, vh = truncate_svd(mod["u"], mod["s"], mod["vh"], jnp.asarray(indices))
            self.rank_dict[name] = int(s.shape[0])
            bias = mod.get("bias")

            if merge:
                w = merge_svd(u, s, vh)  # [out, in]
                new: Params = {"kernel": w.T}
                if bias is not None:
                    new["bias"] = bias
                self._set_proj(name, new, "dense")
            else:
                in_kernel, out_kernel = lowrank_factors(u, s, vh, sigma_fuse)
                new = {"in_kernel": in_kernel, "out_kernel": out_kernel}
                if bias is not None:
                    new["bias"] = bias
                self._set_proj(name, new, "lowrank")

    # ------------------------------------------------------------------
    # Full pipeline
    # ------------------------------------------------------------------

    # -- crash-resume for long compressions --------------------------------
    def _mark_round_done(self, layer_id, block_type) -> None:
        self._done_rounds.add((layer_id, block_type))
        if self._resume_dir:
            self._snapshot_rounds(self._resume_dir)

    def _snapshot_rounds(self, resume_dir: str) -> None:
        """Write the engine's full compression state (params + plan + rank
        bookkeeping + completed-round list) as an Orbax checkpoint. Called
        after BI and after every completed (layer, block) round when
        ``run(resume_dir=...)`` is set — a killed run restarts at the next
        round instead of from scratch.

        Crash-safe by construction: params alternate between two slot dirs
        so the slot the committed meta points at is never touched, and the
        meta write itself is atomic (tmp + os.replace in
        checkpoints.save_checkpoint). A kill at ANY point leaves the
        previous (meta, params) pair consistent; the superseded slot is
        only deleted after the new meta is committed."""
        import shutil

        from grasp_tpu import checkpoints

        t = time.time()
        cur = getattr(self, "_snap_slot", None)
        nxt = "params-b" if cur == "params-a" else "params-a"
        checkpoints.save_checkpoint(
            resume_dir, self.params, self.config, self.plan,
            rank_dict=self.rank_dict, redundant_layers=self.redundant_layers,
            layer_importances=self.layer_importances,
            extra={"resume": "grasp_compression_v1",
                   "done_rounds": [list(r) for r in self._done_rounds]},
            params_dirname=nxt,
        )
        self._snap_slot = nxt
        if cur and cur != nxt:  # drop the superseded slot (kill here: harmless)
            shutil.rmtree(os.path.join(resume_dir, cur), ignore_errors=True)
        self._stage("resume_snapshot", time.time() - t)

    def _restore_rounds(self, resume_dir: str) -> bool:
        """Restore a ``_snapshot_rounds`` checkpoint if one exists; returns
        True when restored (params/plan/rank_dict/redundant_layers and the
        done-round set are replaced; BI is NOT recomputed). The caller must
        pass the same cfg and calibration data as the original run — rounds
        are identified by (layer_id, block_type) only."""
        import os as _os

        from grasp_tpu import checkpoints

        meta_path = _os.path.join(resume_dir, "grasp_meta.json")
        if not _os.path.exists(meta_path):
            return False
        params, config, plan, meta = checkpoints.load_checkpoint(resume_dir)
        if meta.get("extra", {}).get("resume") != "grasp_compression_v1":
            raise ValueError(f"{resume_dir} is not a compression-resume checkpoint")
        if config.to_json() != self.config.to_json():
            raise ValueError("resume checkpoint was written for a different model config")
        params = jax.tree.map(jnp.asarray, params)
        if self.mesh is not None:
            from grasp_tpu.parallel.mesh import shard_params

            params = shard_params(params, self.mesh, self.config)
        self.params = params
        self.plan = plan
        self.rank_dict = dict(meta.get("rank_dict", {}))
        self.redundant_layers = list(meta.get("redundant_layers", []))
        self.layer_importances = list(meta.get("layer_importances", []))
        self._done_rounds = {tuple(r) for r in meta["extra"].get("done_rounds", [])}
        # future snapshots must not overwrite the slot we just restored from
        self._snap_slot = meta.get("params_dir", "params")
        logger.info("=======> Resumed compression from %s (%d rounds done)",
                    resume_dir, len(self._done_rounds))
        return True

    def run(
        self,
        calibration_batches: Sequence[Batch],
        cfg: GraspConfig,
        resume_dir: Optional[str] = None,
    ) -> Dict[str, Any]:
        """End-to-end compression (reference grasp.py main(), :29-152).

        Sequential mode replays the reference exactly: per redundant layer
        (descending id), MLP block then attention block, each with its own
        calibration grad sweep. Parallel mode SVD-ifies every target first and
        does ONE sweep (TPU fast path; documented divergence — later layers
        see uncompressed earlier layers during gradient collection).

        resume_dir: optional directory for crash-resume snapshots. The engine
        checkpoints its full state there after BI and after every completed
        (layer, block) round; re-running with the same resume_dir (same cfg,
        same calibration data) restores and continues at the first unfinished
        round. The final state is identical to an uninterrupted run
        (tests/test_engine_resume.py). Beyond-reference: the torch pipeline
        restarts from zero on any failure (grasp.py:29-152).
        """
        t0 = time.time()
        self._maybe_enable_flash_sweep(calibration_batches)
        self._done_rounds: set = set()
        self._resume_dir = resume_dir
        resumed = bool(resume_dir) and self._restore_rounds(resume_dir)

        if resumed:
            layers_id = list(self.redundant_layers)
        else:
            layers_id = cfg.layers_id
            if layers_id is None:
                importances, layers_id = self.compute_bi(
                    num_prune_layers=cfg.num_prune_layers,
                    calibration_batches=calibration_batches,
                    angular=cfg.angular,
                )
                logger.info("Layer importance measure by BI:\n%s", importances)
            if isinstance(layers_id, int):
                layers_id = [layers_id]
        self.redundant_layers = list(layers_id)
        if resume_dir and not resumed:
            self._snapshot_rounds(resume_dir)  # BI done; rounds start empty

        layers_id = sorted(layers_id, reverse=True)
        logger.info("=======> Start Compressing model with GRASP")

        # None targets = skip that block entirely (reference skip-flag contract,
        # modeling_grasp.py:261-262)
        blocks = (
            ("mlp", tuple(cfg.mlp_target_layer_types) if cfg.mlp_target_layer_types is not None else None),
            ("attention", tuple(cfg.attn_target_layer_types) if cfg.attn_target_layer_types is not None else None),
        )

        if cfg.grad_mode == "dense":
            self._run_dense(layers_id, blocks, calibration_batches, cfg)
        elif cfg.sweep == "parallel":
            # one-shot sweep = a single resumable unit
            if ("all", "all") not in self._done_rounds:
                skipped_all = True
                for layer_id in layers_id:
                    for block_type, targets in blocks:
                        skip = self.compress_block(layer_id, block_type, targets)
                        skipped_all = skipped_all and bool(skip)
                if not skipped_all:
                    grads = self.get_svdlayer_gradients(calibration_batches)
                    indices = self.dynamic_svd_selection(
                        grads, metric=cfg.metric,
                        compression_ratio=cfg.compression_ratio,
                        threshold_ratio=cfg.threshold_ratio,
                        verbose=cfg.verbose,
                    )
                    self.compile_grasp_model(indices, merge=cfg.merge, sigma_fuse=cfg.sigma_fuse)
                self._mark_round_done("all", "all")
        else:
            for layer_id in layers_id:
                for block_type, targets in blocks:
                    if (layer_id, block_type) in self._done_rounds:
                        continue
                    skip = self.compress_block(layer_id, block_type, targets)
                    if skip:
                        logger.info("=======> Skip Compressing This Block")
                        self._mark_round_done(layer_id, block_type)
                        continue
                    grads = self.get_svdlayer_gradients(calibration_batches)
                    indices = self.dynamic_svd_selection(
                        grads, metric=cfg.metric,
                        compression_ratio=cfg.compression_ratio,
                        threshold_ratio=cfg.threshold_ratio,
                        verbose=cfg.verbose,
                    )
                    self.compile_grasp_model(indices, merge=cfg.merge, sigma_fuse=cfg.sigma_fuse)
                    self._mark_round_done(layer_id, block_type)

        wall = time.time() - t0
        logger.info("=======> Done! (%.1fs)", wall)
        return {
            "redundant_layers": self.redundant_layers,
            "rank_dict": dict(self.rank_dict),
            "layer_importances": list(self.layer_importances),
            "wall_clock_s": wall,
            "stage_times_s": {k: round(v, 2) for k, v in self.stage_times.items()},
        }

    def _run_dense(self, layers_id, blocks, calibration_batches, cfg: GraspConfig) -> None:
        """Dense-gradient pipeline body (see compress_round).

        sequential: per (layer, block) round in the reference's order — each
        round's sweep sees all previously compiled truncations, exactly like
        the reference (grasp.py:79-126).
        parallel:   ONE sweep collects dense grads for every target at once
        while every SVD factorizes host-side; then select+compile everything.
        """
        if cfg.sweep == "parallel":
            if ("all", "all") in self._done_rounds:
                return
            layer_names: List[Tuple[int, List[str]]] = []
            for layer_id in layers_id:
                nn: List[str] = []
                for block_type, targets in blocks:
                    if targets is None:
                        continue
                    defaults = self._block_targets(layer_id, block_type)
                    tg = _resolve_targets(defaults, targets)
                    if not all(t in defaults for t in tg):
                        raise ValueError(f"invalid targets {tg} for {block_type}")
                    nn += [module_name(layer_id, p) for p in tg]
                if nn:
                    layer_names.append((layer_id, nn))
            if not layer_names:
                return

            # prefix split applies to the fast path too: no chunk ever
            # modifies a layer below min(redundant), so every sweep graph can
            # start at that boundary (see GraspConfig.prefix)
            p_min = min(lid for lid, _ in layer_names)
            mode = cfg.prefix
            was_auto = cfg.prefix == "auto"
            if mode == "auto":
                if p_min < 4:
                    mode = "off"
                else:
                    mode = self._choose_prefix_cache(calibration_batches, p_min)
                    logger.info("prefix auto -> %s", mode)
            self._set_prefix(p_min, mode, auto=was_auto)
            stop_prefetch = None
            try:
                # parking decision BEFORE chunking: on-device after-sweep
                # selection holds the chunk grads under the eigh arena, so
                # its auto chunk size is tighter (1 layer at 7B vs 2 parked)
                park = (self.svd_method == "gram_device"
                        and self._should_park_bases(
                            [n for _, nn in layer_names for n in nn]))
                chunks = self._sweep_chunks(layer_names, cfg, park=park)
                if len(chunks) > 1:
                    logger.info(
                        "parallel sweep in %d chunks (HBM-bounded grad "
                        "accumulators): %s", len(chunks),
                        [[lid for lid, _ in c] for c in chunks],
                    )
                # compile every chunk's graphs ahead of dispatch (same plan-
                # evolution argument as the sequential daemon — each chunk is
                # one multi-layer sweep unit)
                stop_prefetch = self._start_compile_prefetch(
                    [(tuple(sorted(lid for lid, _ in c)),
                      [n for _, nn in c for n in nn]) for c in chunks],
                    calibration_batches, cfg,
                )
                todo = [c for c in chunks
                        if ("chunk", ".".join(str(lid) for lid, _ in c))
                        not in self._done_rounds]
                bases = None
                if park and todo:
                    # parked mode (GRASP_PARK_BASES=1 / off-TPU): all 49
                    # eighs run BEFORE any sweep (bases depend only on the
                    # original kernels; no grad accumulators resident next
                    # to the QDWH arena) — see _precompute_gram_bases. The
                    # TPU default is per-chunk after-sweep selection instead
                    # (everything stays on device, zero tunnel transfer; see
                    # _should_park_bases).
                    all_names = [n for c in todo for _, nn in c for n in nn]
                    bases = self._precompute_gram_bases(all_names)
                for chunk in todo:
                    ckey = ("chunk", ".".join(str(lid) for lid, _ in chunk))
                    names = [n for _, nn in chunk for n in nn]
                    if bases is not None:
                        # upload a bounded window of this chunk's bases WHILE
                        # its sweep is in flight (~67 MB fp32 per module, so
                        # selection starts with resident bases instead of
                        # paying ~1.4 s/module of H2D on the critical path —
                        # sel_importance was 108.9 s of the 612.6 s r4
                        # parallel run). Issued via after_dispatch: queued
                        # BEFORE the sweep they delay the sweep's own
                        # dispatch behind ~1 GiB of transfers (measured:
                        # grad_sweep 25 s/chunk vs ~10 s clean). BYTE-
                        # BOUNDED: a full 2-layer chunk's bases (~0.94 GiB)
                        # next to the sweep peak (13.41 GiB measured) would
                        # graze the ~14.6 GiB effective ceiling — default
                        # window 0.4 GiB, GRASP_BASES_PREFETCH_GB overrides,
                        # 0 disables.
                        def _prefetch_bases(names=names):
                            pf_budget = float(os.environ.get(
                                "GRASP_BASES_PREFETCH_GB", 0.4)) * 2**30
                            for n in names:
                                if pf_budget <= 0:
                                    break
                                if n in bases and not isinstance(
                                        bases[n][0], jax.Array):
                                    s_np, b_np = bases[n]
                                    pf_budget -= s_np.nbytes + b_np.nbytes
                                    bases[n] = (
                                        jax.device_put(jnp.asarray(s_np)),
                                        jax.device_put(jnp.asarray(b_np)))
                        grads = self.get_dense_gradients(
                            names, calibration_batches,
                            after_dispatch=_prefetch_bases)
                        self._select_compile_from_bases(names, grads, bases, cfg)
                    elif self.svd_method == "gram_device":
                        # parking rejected (sick d2h): per-chunk U-free
                        # selection with grads and bases on device throughout
                        grads = self.get_dense_gradients(
                            names, calibration_batches)
                        self._select_compile_after_sweep(names, grads, cfg)
                    else:
                        svd_out, grads = self._svd_overlapping_grads(
                            names, calibration_batches)
                        self._select_compile_many(names, svd_out, grads, cfg)
                    self._mark_round_done(*ckey)
            finally:
                if stop_prefetch is not None:
                    stop_prefetch()
                self._set_prefix(0, "off")
            self._mark_round_done("all", "all")
        else:
            # sequential with cross-round SVD prefetch: every SVD factors the
            # ORIGINAL dense weights, so all rounds' factorizations start at
            # t=0 on a single host worker while the TPU runs the sweeps in
            # reference order. Gradient sweeps still see previously-compiled
            # truncations exactly like the reference.
            from concurrent.futures import ThreadPoolExecutor

            rounds = []
            for layer_id in layers_id:
                for block_type, targets in blocks:
                    if targets is None:
                        logger.info("=======> Skip Compressing This Block")
                        continue
                    if (layer_id, block_type) in self._done_rounds:
                        continue  # crash-resume: round already compiled
                    defaults = self._block_targets(layer_id, block_type)
                    tg = _resolve_targets(defaults, targets)
                    rounds.append((layer_id, block_type, tg))

            # prefix split: rounds only ever modify layers >= p_min, so the
            # sweep graphs can start at that boundary (see GraspConfig.prefix)
            p_min = min((lid for lid, _, _ in rounds), default=0)
            mode = cfg.prefix
            was_auto = cfg.prefix == "auto"
            if mode == "auto":
                if p_min < 4:
                    mode = "off"
                else:
                    mode = self._choose_prefix_cache(calibration_batches, p_min)
                    logger.info("prefix auto -> %s", mode)
            self._set_prefix(p_min, mode, auto=was_auto)

            try:
                if self.svd_method == "gram_device":
                    # All-on-device SVD: prefetch-overlapping it with the TPU
                    # sweep would contend for HBM (at 7B the sweep alone peaks
                    # at 13.8 of 15.75 GiB — fp32 factors resident during the
                    # sweep OOMed the first 7B run) and for the chip itself. It
                    # costs seconds on the MXU — run it inline AFTER each
                    # round's sweep. Meanwhile a daemon worker compiles every
                    # LATER round's graphs (plan evolution is shape-
                    # deterministic under a fixed ratio) so per-round compiles
                    # overlap the sweeps instead of serializing with them.
                    stop_prefetch = self._start_compile_prefetch(
                        [((lid,), [module_name(lid, p) for p in tg])
                         for lid, bt, tg in rounds],
                        calibration_batches, cfg,
                    )
                    try:
                        for layer_id, block_type, tg in rounds:
                            self.compress_round(
                                layer_id, block_type, tg, calibration_batches, cfg,
                                svd_after=True,
                            )
                            self._mark_round_done(layer_id, block_type)
                    finally:
                        if stop_prefetch is not None:
                            stop_prefetch()
                    return

                with ThreadPoolExecutor(max_workers=1) as pool:
                    futures = [
                        pool.submit(self._svd_of_dense, [module_name(lid, p) for p in tg])
                        for lid, bt, tg in rounds
                    ]
                    for (layer_id, block_type, tg), fut in zip(rounds, futures):
                        self.compress_round(
                            layer_id, block_type, tg, calibration_batches, cfg, svd_future=fut
                        )
                        self._mark_round_done(layer_id, block_type)
            finally:
                self._set_prefix(0, "off")
