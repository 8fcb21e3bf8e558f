"""GPipe-style pipeline parallelism over a "pipe" mesh axis.

No reference counterpart (SURVEY.md §2: the reference has no parallelism of
any kind) — this is TPU-native beyond-parity scaling machinery, sitting next
to the ("data","model") DP/TP mesh (parallel/mesh.py) and sequence
parallelism (parallel/seq_parallel.py).

Design (the scaling-book recipe, hand-rolled with XLA collectives):

- layer params are stacked to ``[num_stages, depth, ...]`` and sharded on the
  "pipe" mesh axis — each device owns one contiguous stage of ``depth``
  layers (``to_pipeline_params`` / ``from_pipeline_params``);
- inside one ``shard_map``, activations circulate stage -> stage+1 through
  ``lax.ppermute`` while a ``lax.scan`` runs the M + S - 1 GPipe ticks for M
  microbatches over S stages; every device executes the same program
  (fill/drain bubbles compute on gated garbage — the standard SPMD trick);
- stage 0 embeds its incoming microbatch, the last stage applies the final
  norm + lm head and accumulates the CE sum under ``lax.cond`` (so the vocab
  matmul is skipped on every other stage);
- the loss is ``psum(ce) / psum(token_count)`` over "pipe" — exactly
  ``hf_causal_lm_loss`` of the whole batch, so pipeline training is
  numerically interchangeable with the single-device step;
- ``jax.value_and_grad`` differentiates straight through ppermute + scan:
  the reverse program is the mirrored pipeline (cotangents ride the reverse
  ring), with ``remat=True`` recomputing stage forwards to keep backward
  memory at O(depth) instead of O(ticks * depth).

The GPipe machinery requires a *uniform* per-layer plan/structure (layers
must stack/scan). Heterogeneous GRASP plans — the framework's actual product:
some layers dense, some low-rank with differing ranks — are made uniform by
``hybridize_layers``: every projection slot that mixes kinds becomes the
dual-slot sum form ``y = x@kernel + (x@in_kernel)@out_kernel`` where the
unused slot (and any rank padding up to the slot max) holds exact zeros, so
the forward is bit-equal to the heterogeneous model. ``hybrid_grad_mask``
freezes the structural zeros during training (pass as ``grad_mask`` to
``make_pp_train_step``), and ``dehybridize_layers`` recovers the original
heterogeneous tree for checkpoint interop. Memory cost: the zero dense slot
of compressed layers (~the dense size of the compressed layers, sharded over
the pipe axis) — far below merge=True's full dense re-materialization, with
no change to the stored checkpoint format.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from grasp_tpu.configs import ModelConfig
from grasp_tpu.models.llama import (
    LayerPlan,
    ModelPlan,
    Params,
    _causal_mask,
    _layer_forward,
    hf_causal_lm_loss_sum,
    rms_norm,
    rope_cos_sin,
)

PIPE_AXIS = "pipe"


def uniform_layer_plan(plan: ModelPlan) -> LayerPlan:
    """The single LayerPlan shared by every layer; raises if heterogeneous."""
    if any(p != plan[0] for p in plan[1:]):
        raise ValueError(
            "pipeline parallelism requires a uniform per-layer plan "
            f"(got {set(plan)}); compile GRASP models with merge=True or a "
            "uniform-rank low-rank plan"
        )
    return plan[0]


def _proj_group(proj: str) -> str:
    from grasp_tpu.models.llama import ATTN_PROJS

    return "self_attn" if proj in ATTN_PROJS else "mlp"


def hybridize_layers(params: Params, plan: ModelPlan):
    """Make a heterogeneous GRASP plan structurally uniform for pipelining.

    Per projection slot (q_proj ... gate_proj) across all layers:
      - all dense                      -> stays dense
      - all low-rank, equal ranks      -> stays low-rank
      - all low-rank, mixed ranks      -> low-rank zero-padded to the max rank
      - dense and low-rank mixed       -> HYBRID dual-slot sum form
    Zero columns/rows are exact, so the uniformized model's forward equals
    the heterogeneous model's bit-for-bit (pinned in tests/test_pipeline.py).

    Returns (new_params, layer_plan, spec) where layer_plan is the single
    per-layer plan shared by every layer and spec records each (layer, proj)'s
    original (kind, rank) for dehybridize_layers / hybrid_grad_mask.
    """
    from grasp_tpu.models.llama import DENSE, HYBRID, LOWRANK, PROJ_ORDER

    n = len(plan)
    resolved: List[Tuple[str, Optional[int]]] = []
    for j, proj in enumerate(PROJ_ORDER):
        kinds = {plan[i][j] for i in range(n)}
        if not kinds <= {DENSE, LOWRANK}:
            raise ValueError(
                f"hybridize_layers supports dense/lowrank plans, got {kinds} "
                f"for {proj} (compile svd modules first)"
            )
        if kinds == {DENSE}:
            resolved.append((DENSE, None))
            continue
        ranks = [
            params["layers"][i][_proj_group(proj)][proj]["in_kernel"].shape[1]
            for i in range(n)
            if plan[i][j] == LOWRANK
        ]
        r = max(ranks)
        resolved.append((HYBRID if DENSE in kinds else LOWRANK, r))

    spec = []  # per layer: list of (orig_kind, orig_rank or None)
    new_layers = []
    for i, layer in enumerate(params["layers"]):
        new_layer = {k: v for k, v in layer.items() if k not in ("self_attn", "mlp")}
        new_layer["self_attn"] = dict(layer["self_attn"])
        new_layer["mlp"] = dict(layer["mlp"])
        lspec = []
        for j, proj in enumerate(PROJ_ORDER):
            grp = _proj_group(proj)
            mod = layer[grp][proj]
            kind, r = resolved[j]
            orig = plan[i][j]
            if kind == DENSE:
                lspec.append((DENSE, None))
                continue
            if orig == LOWRANK:
                in_k, out_k = mod["in_kernel"], mod["out_kernel"]
                r0 = in_k.shape[1]
                lspec.append((LOWRANK, r0))
                if r0 < r:
                    in_k = jnp.pad(in_k, ((0, 0), (0, r - r0)))
                    out_k = jnp.pad(out_k, ((0, r - r0), (0, 0)))
                new_mod = {"in_kernel": in_k, "out_kernel": out_k}
                if kind == HYBRID:
                    in_f = in_k.shape[0]
                    out_f = out_k.shape[1]
                    new_mod["kernel"] = jnp.zeros((in_f, out_f), in_k.dtype)
            else:  # orig dense inside a hybrid slot
                lspec.append((DENSE, None))
                kern = mod["kernel"]
                new_mod = {
                    "kernel": kern,
                    "in_kernel": jnp.zeros((kern.shape[0], r), kern.dtype),
                    "out_kernel": jnp.zeros((r, kern.shape[1]), kern.dtype),
                }
            if "bias" in mod:
                new_mod["bias"] = mod["bias"]
            new_layer[grp][proj] = new_mod
        spec.append(lspec)
        new_layers.append(new_layer)

    layer_plan = tuple(kind for kind, _ in resolved)
    return {**params, "layers": new_layers}, layer_plan, spec


def dehybridize_layers(params: Params, spec) -> Params:
    """Inverse of hybridize_layers: strip zero slots and rank padding.

    Works on the params tree or any same-shaped tree (e.g. a gradient tree —
    structural-zero slots are simply dropped, padded ranks sliced off)."""
    from grasp_tpu.models.llama import DENSE, LOWRANK, PROJ_ORDER

    out_layers = []
    for i, layer in enumerate(params["layers"]):
        new_layer = {k: v for k, v in layer.items() if k not in ("self_attn", "mlp")}
        new_layer["self_attn"] = dict(layer["self_attn"])
        new_layer["mlp"] = dict(layer["mlp"])
        for j, proj in enumerate(PROJ_ORDER):
            grp = _proj_group(proj)
            mod = layer[grp][proj]
            kind, r = spec[i][j]
            if kind == DENSE:
                new_mod = {"kernel": mod["kernel"]}
            else:
                new_mod = {
                    "in_kernel": mod["in_kernel"][:, :r],
                    "out_kernel": mod["out_kernel"][:r, :],
                }
            if "bias" in mod:
                new_mod["bias"] = mod["bias"]
            new_layer[grp][proj] = new_mod
        out_layers.append(new_layer)
    return {**params, "layers": out_layers}


def hybrid_grad_mask(hparams: Params, spec) -> Params:
    """1/0 mask over a hybridized tree: 0 on structural zeros (unused dual
    slots and rank padding), 1 on real parameters. Multiply optimizer updates
    by this (make_pp_train_step(grad_mask=...)) so the zeros stay exact."""
    from grasp_tpu.models.llama import DENSE, PROJ_ORDER

    mask = jax.tree.map(jnp.ones_like, hparams)
    for i, lspec in enumerate(spec):
        for j, (kind, r) in enumerate(lspec):
            proj = PROJ_ORDER[j]
            grp = _proj_group(proj)
            mod = hparams["layers"][i][grp][proj]
            mmod = mask["layers"][i][grp][proj]
            if kind == DENSE:
                if "in_kernel" in mod:  # dense original inside a hybrid slot
                    mmod["in_kernel"] = jnp.zeros_like(mod["in_kernel"])
                    mmod["out_kernel"] = jnp.zeros_like(mod["out_kernel"])
            else:
                if "kernel" in mod:  # lowrank original inside a hybrid slot
                    mmod["kernel"] = jnp.zeros_like(mod["kernel"])
                full_r = mod["in_kernel"].shape[1]
                if r < full_r:
                    col = (jnp.arange(full_r) < r).astype(mod["in_kernel"].dtype)
                    mmod["in_kernel"] = jnp.broadcast_to(
                        col[None, :], mod["in_kernel"].shape
                    )
                    mmod["out_kernel"] = jnp.broadcast_to(
                        col[:, None], mod["out_kernel"].shape
                    )
    return mask


def to_pipeline_params(params: Params, num_stages: int) -> Dict[str, Any]:
    """Restructure flat params into the pipeline layout.

    layers[i] pytrees are stacked to leading [num_layers] then reshaped to
    [num_stages, depth, ...]; embed/norm/head stay as-is (replicated over the
    pipe axis; only stage 0 / the last stage touch them, so their gradient
    contributions from other stages are exactly zero).
    """
    layers = params["layers"]
    n = len(layers)
    if n % num_stages != 0:
        raise ValueError(f"{n} layers not divisible into {num_stages} stages")
    depth = n // num_stages
    structs = {jax.tree.structure(l) for l in layers}
    if len(structs) != 1:
        raise ValueError(
            "pipeline parallelism requires every layer to share one pytree "
            "structure (uniform plan); see uniform_layer_plan"
        )
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    stages = jax.tree.map(
        lambda x: x.reshape(num_stages, depth, *x.shape[1:]), stacked
    )
    out = {
        "embed_tokens": params["embed_tokens"],
        "stages": stages,
        "norm": params["norm"],
    }
    if "lm_head" in params:
        out["lm_head"] = params["lm_head"]
    return out


def from_pipeline_params(pparams: Dict[str, Any], num_layers: int) -> Params:
    """Inverse of to_pipeline_params (checkpoint interop / tests).

    Pulls to host first: eagerly reshaping a pipe-sharded leading dim aborts
    in the runtime, and this path is interop, not compute.
    """
    pparams = jax.tree.map(lambda x: np.asarray(jax.device_get(x)), pparams)
    stages = pparams["stages"]
    flat = jax.tree.map(lambda x: x.reshape(num_layers, *x.shape[2:]), stages)
    layers = [jax.tree.map(lambda x: x[i], flat) for i in range(num_layers)]
    out = {
        "embed_tokens": pparams["embed_tokens"],
        "layers": layers,
        "norm": pparams["norm"],
    }
    if "lm_head" in pparams:
        out["lm_head"] = pparams["lm_head"]
    return out


def pipeline_param_shardings(pparams, mesh: Mesh):
    """NamedShardings for the pipeline layout: stages on "pipe", rest replicated."""
    stage_sh = NamedSharding(mesh, P(PIPE_AXIS))
    repl = NamedSharding(mesh, P())
    return {
        k: jax.tree.map(lambda _: stage_sh if k == "stages" else repl, v)
        for k, v in pparams.items()
    }


def shard_pipeline_params(pparams, mesh: Mesh):
    shardings = pipeline_param_shardings(pparams, mesh)
    return jax.tree.map(jax.device_put, pparams, shardings)


def make_pipeline_loss(
    config: ModelConfig,
    layer_plan: LayerPlan,
    mesh: Mesh,
    num_microbatches: int,
    remat: bool = False,
) -> Callable:
    """Build loss(pparams, input_ids [B,S], labels [B,S]) -> scalar, computed
    through the GPipe schedule on mesh's "pipe" axis. B % num_microbatches == 0.

    The scalar equals hf_causal_lm_loss(forward(params), labels) on the whole
    batch (mean CE over valid shifted labels) to fp tolerance.
    """
    num_stages = mesh.shape[PIPE_AXIS]
    M = num_microbatches
    dtype = jnp.dtype(config.dtype)

    def pp_body(embed_w, stages, norm_w, head_k, ids_mb, labels_mb):
        # shapes: stages leaves [1, depth, ...] (this device's stage),
        # ids_mb/labels_mb [M, mb, S] replicated
        stage = jax.lax.axis_index(PIPE_AXIS)
        local = jax.tree.map(lambda x: x[0], stages)
        mb, s_len = ids_mb.shape[1], ids_mb.shape[2]

        positions = jnp.arange(s_len)[None, :]
        cos, sin = rope_cos_sin(positions, config.head_dim_, config.rope_theta,
                                scaling=config.rope_scaling)

        if config.layer_types is None:
            mask = _causal_mask(s_len, s_len, 0, window=config.sliding_window)

            def layer_body(h_, lp):
                return _layer_forward(lp, layer_plan, h_, cos, sin, mask, config)[0], None

            scan_body = jax.checkpoint(layer_body) if remat else layer_body

            def stage_fn(h):
                h_out, _ = jax.lax.scan(scan_body, h, local)
                return h_out
        else:
            # Gemma-2 per-layer sliding/full alternation: scan carries each
            # layer's window flag (a traced slice of the static [L] table at
            # this stage's global layer range — uniform SPMD program) and
            # selects between the two precomputed masks
            depth = jax.tree.leaves(local)[0].shape[0]
            mask_full = _causal_mask(s_len, s_len, 0)
            mask_win = _causal_mask(s_len, s_len, 0, window=config.sliding_window)
            win_table = jnp.asarray(
                [1 if t == "sliding_attention" else 0 for t in config.layer_types],
                jnp.int32)
            flags = jax.lax.dynamic_slice(
                win_table, (stage * depth,), (depth,))

            def layer_body(h_, xs):
                lp, flag = xs
                m = jnp.where(flag > 0, mask_win, mask_full)
                return _layer_forward(lp, layer_plan, h_, cos, sin, m, config)[0], None

            scan_body = jax.checkpoint(layer_body) if remat else layer_body

            def stage_fn(h):
                h_out, _ = jax.lax.scan(scan_body, h, (local, flags))
                return h_out

        def ce_and_count(h_out, m):
            lab = labels_mb[jnp.clip(m, 0, M - 1)]
            hn = rms_norm(h_out, norm_w, config.rms_norm_eps,
                          plus_one=config.norm_plus_one)
            logits = jnp.dot(hn, head_k, preferred_element_type=hn.dtype)
            cap = config.final_logit_softcapping
            if cap is not None:  # Gemma-2 (llama._lm_logits parity)
                logits = cap * jnp.tanh(logits / cap)
            ce = hf_causal_lm_loss_sum(logits, lab)
            cnt = (lab[:, 1:] != -100).sum()
            return ce, cnt

        is_last = stage == num_stages - 1
        perm = [(i, i + 1) for i in range(num_stages - 1)]

        def tick(carry, t):
            h_prev, ce_acc, n_acc = carry
            m = t - stage  # microbatch this stage processes at tick t
            ids_t = ids_mb[jnp.clip(t, 0, M - 1)]
            h_embed = embed_w[ids_t].astype(dtype)
            if config.scale_embeddings:  # Gemma: llama.embed_lookup parity
                h_embed = h_embed * jnp.asarray(config.hidden_size ** 0.5,
                                                h_embed.dtype)
            h_in = jnp.where(stage == 0, h_embed, h_prev)
            h_out = stage_fn(h_in)
            # gate with a predicate multiply, not lax.cond: per-device branch
            # divergence inside the scan deadlocks the CPU backend's collective
            # rendezvous in the backward pass (XLA CPU InProcessCommunicator),
            # and a select keeps the SPMD program identical on every stage.
            # Cost: non-last stages also run the head matmul during their
            # ticks; acceptable next to the pipeline bubble, and the compiler
            # is free to skip it where the result is provably unused.
            valid_last = is_last & (m >= 0) & (m < M)
            ce_raw, cnt_raw = ce_and_count(h_out, m)
            ce = jnp.where(valid_last, ce_raw, 0.0)
            cnt = jnp.where(valid_last, cnt_raw, 0)
            h_next = jax.lax.ppermute(h_out, PIPE_AXIS, perm)
            return (h_next, ce_acc + ce, n_acc + cnt), None

        h0 = jnp.zeros((mb, s_len, config.hidden_size), dtype)
        init = jax.lax.pvary(
            (h0, jnp.float32(0.0), jnp.int32(0)), (PIPE_AXIS,)
        )
        (_, ce_acc, n_acc), _ = jax.lax.scan(
            tick, init, jnp.arange(M + num_stages - 1)
        )
        total_ce = jax.lax.psum(ce_acc, PIPE_AXIS)
        total_n = jax.lax.psum(n_acc, PIPE_AXIS)
        return total_ce / jnp.maximum(total_n, 1).astype(jnp.float32)

    pp = jax.shard_map(
        pp_body,
        mesh=mesh,
        in_specs=(P(), P(PIPE_AXIS), P(), P(), P(), P()),
        out_specs=P(),
    )

    def loss_fn(pparams, input_ids, labels):
        b, s_len = input_ids.shape
        if b % M != 0:
            raise ValueError(f"batch {b} not divisible into {M} microbatches")
        ids_mb = input_ids.reshape(M, b // M, s_len)
        labels_mb = labels.reshape(M, b // M, s_len)
        embed_w = pparams["embed_tokens"]["weight"]
        # tied embeddings reuse embed^T as the head (llama._lm_logits parity)
        if "lm_head" in pparams and "kernel" not in pparams["lm_head"]:
            raise ValueError(
                "pipeline training requires a floating-point lm_head "
                f"(got keys {sorted(pparams['lm_head'])}); quantized heads "
                "(kernel_q/kernel_q4) are a serving-side format — dequantize "
                "before training"
            )
        head_k = (
            pparams["lm_head"]["kernel"]
            if "lm_head" in pparams
            else embed_w.T.astype(dtype)
        )
        return pp(embed_w, pparams["stages"], pparams["norm"]["weight"], head_k,
                  ids_mb, labels_mb)

    return loss_fn


def make_pp_train_step(
    config: ModelConfig,
    layer_plan: LayerPlan,
    optimizer,
    mesh: Mesh,
    num_microbatches: int,
    remat: bool = False,
    grad_mask: Optional[Params] = None,
) -> Callable:
    """Jitted pipeline-parallel SGD step on pipeline-layout params.

    grad_mask: optional 1/0 tree in PIPELINE layout (hybrid_grad_mask run
    through to_pipeline_params) multiplied into the updates — keeps the
    structural zeros of a hybridized heterogeneous plan exactly zero."""
    import optax

    loss_fn = make_pipeline_loss(config, layer_plan, mesh, num_microbatches, remat)

    def step(pparams, opt_state, input_ids, labels):
        loss, grads = jax.value_and_grad(loss_fn)(pparams, input_ids, labels)
        updates, opt_state = optimizer.update(grads, opt_state, pparams)
        if grad_mask is not None:
            updates = jax.tree.map(lambda u, m: u * m, updates, grad_mask)
        pparams = optax.apply_updates(pparams, updates)
        return pparams, opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1))
