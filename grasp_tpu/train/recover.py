"""Recovery fine-tuning (GRASP*) — Alpaca instruction tuning of ONLY the
compressed layers.

TPU-native replacement for the reference's HF-Trainer path
(alpaca_grasp.py:28-198): optax AdamW with a **masked trainable subtree**
(every parameter of each redundant layer — the reference unfreezes whole
layers, alpaca_grasp.py:76-83), linear warmup(100)+decay schedule matching
HF Trainer defaults (alpaca_grasp.py:170-196), gradient accumulation =
batch_size // micro_batch_size (:68) via optax.MultiSteps, and bf16 compute
instead of the reference's fp16 (TPU-native mixed precision).

Checkpointing mirrors the reference Trainer args (alpaca_grasp.py:184-188):
eval + save every `eval_every` optimizer steps, keep `save_total_limit`
newest, load the best (lowest eval loss) at the end; `resume_from_checkpoint`
restores params + optimizer state + step and fast-forwards the data stream so
a killed run reproduces the uninterrupted loss curve
(tests/test_recover_resume.py). Reference resume is weights-only
(alpaca_grasp.py:143-153); ours restores the full train state — strictly
stronger, divergence documented in PARITY.md.

The training step jit-compiles once per plan and shards over a
("data","model") mesh via NamedShardings when one is provided.
"""

from __future__ import annotations

import json
import logging
import os
import shutil
import time
from typing import Any, Callable, Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from grasp_tpu.configs import ModelConfig
from grasp_tpu.models.llama import (
    ModelPlan,
    Params,
    forward,
    hf_causal_lm_loss,
    hf_causal_lm_loss_sum,
)

logger = logging.getLogger("grasp_tpu")


def trainable_mask(params: Params, redundant_layers: List[int]) -> Params:
    """Boolean pytree: True for every leaf inside a redundant layer.

    Mirrors the reference's freeze-all-then-unfreeze-redundant-layers
    (alpaca_grasp.py:72-83) — the whole transformer layer trains, including
    the low-rank factors and both layernorms.
    """
    redundant = set(redundant_layers)

    def layer_mask(li: int, layer):
        return jax.tree.map(lambda _: li in redundant, layer)

    mask = jax.tree.map(lambda _: False, params)
    mask["layers"] = [layer_mask(li, l) for li, l in enumerate(params["layers"])]
    return mask


def count_trainable(params: Params, mask: Params) -> Tuple[int, int]:
    total = sum(x.size for x in jax.tree.leaves(params))
    trainable = sum(
        x.size for x, m in zip(jax.tree.leaves(params), jax.tree.leaves(mask)) if m
    )
    return total, trainable


def _zero_frozen(mask: Params) -> optax.GradientTransformation:
    """Zero the gradients of frozen leaves (value_and_grad produces grads for
    the whole tree; HF only has grads on requires_grad params, so the global
    grad norm must be computed over the trainable subtree alone)."""

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params
        return jax.tree.map(
            lambda u, m: u if m else jnp.zeros_like(u), updates, mask
        ), state

    return optax.GradientTransformation(init, update)


def make_optimizer(
    learning_rate: float = 3e-4,
    total_steps: int = 1000,
    warmup_steps: int = 100,
    accum_steps: int = 1,
    mask: Optional[Params] = None,
    weight_decay: float = 0.0,
    max_grad_norm: Optional[float] = 1.0,
) -> optax.GradientTransformation:
    """AdamW + HF-Trainer-default linear warmup/decay, masked, with accumulation.

    max_grad_norm=1.0 replicates the reference trainer's implicit global
    gradient clipping (TrainingArguments default, active in alpaca_grasp.py's
    Trainer run) — computed over trainable leaves only, like torch
    clip_grad_norm_ over params-with-grads. Golden-tested step-for-step against
    HF Trainer in tests/test_recover_golden.py.
    """
    schedule = optax.join_schedules(
        [
            optax.linear_schedule(0.0, learning_rate, warmup_steps),
            optax.linear_schedule(learning_rate, 0.0, max(total_steps - warmup_steps, 1)),
        ],
        boundaries=[warmup_steps],
    )
    adamw = optax.adamw(schedule, weight_decay=weight_decay)
    if mask is not None:
        # NB: optax.masked passes *unmasked* updates through unchanged (raw
        # grads would still move frozen params) — multi_transform with an
        # explicit freeze partition is the correct way to hard-freeze.
        labels = jax.tree.map(lambda m: "train" if m else "freeze", mask)
        tx = optax.multi_transform({"train": adamw, "freeze": optax.set_to_zero()}, labels)
    else:
        tx = adamw
    chain = []
    if mask is not None:
        chain.append(_zero_frozen(mask))
    if max_grad_norm:
        chain.append(optax.clip_by_global_norm(max_grad_norm))
    chain.append(tx)
    tx = optax.chain(*chain) if len(chain) > 1 else tx
    if accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_steps)
    return tx


def make_train_step(
    config: ModelConfig,
    plan: ModelPlan,
    optimizer: optax.GradientTransformation,
    remat: bool = False,
) -> Callable:
    """One jitted SGD step: (params, opt_state, batch) -> (params, opt_state, loss)."""

    def step(params, opt_state, input_ids, labels, attention_mask):
        def loss_fn(p):
            from grasp_tpu.core.engine import _scan_in_grads

            logits = forward(
                p, input_ids, config=config, plan=plan,
                attention_mask=attention_mask, remat=remat,
                scan_layers=_scan_in_grads(),
            )["logits"]
            return hf_causal_lm_loss(logits, labels)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1))


def make_accum_train_step(
    config: ModelConfig,
    plan: ModelPlan,
    optimizer: optax.GradientTransformation,
    remat: bool = False,
) -> Callable:
    """One jitted optimizer step over a STACKED group of accumulation
    micro-batches, token-weighted exactly like HF Trainer (>=4.46 GA fix):

      loss   = sum over micros of CE_sum(micro) / num_items_in_batch
      grads  = d loss / d params               (then clip + AdamW once)

    where ``num_items_in_batch`` counts *unshifted* labels != -100 across the
    whole group (transformers Trainer._get_num_items_in_batch) while the CE
    sums run over shifted positions — replicating the off-by-one-per-row
    denominator quirk bit for bit. optax.MultiSteps instead arithmetic-means
    the per-micro mean losses, which diverges whenever micro-batches carry
    unequal token counts (padding!). Golden-tested against the installed HF
    Trainer at gradient_accumulation_steps=2 in tests/test_recover_golden.py.

    Inputs are [accum, micro_bs, seq]; the micros run under lax.scan (one
    compiled body, grads accumulated on device).
    """

    def step(params, opt_state, input_ids, labels, attention_mask):
        n_items = jnp.maximum((labels != -100).sum(), 1).astype(jnp.float32)

        def ce_sum(p, ids, lab, am):
            from grasp_tpu.core.engine import _scan_in_grads

            logits = forward(
                p, ids, config=config, plan=plan,
                attention_mask=am, remat=remat, scan_layers=_scan_in_grads(),
            )["logits"]
            return hf_causal_lm_loss_sum(logits, lab)

        has_mask = attention_mask is not None

        def body(carry, xs):
            g_acc, ce_acc = carry
            am = xs[2] if has_mask else None
            ce, g = jax.value_and_grad(ce_sum)(params, xs[0], xs[1], am)
            return (jax.tree.map(jnp.add, g_acc, g), ce_acc + ce), None

        zeros = jax.tree.map(jnp.zeros_like, params)
        xs = (input_ids, labels) + ((attention_mask,) if has_mask else ())
        (grads, ce_total), _ = jax.lax.scan(body, (zeros, jnp.float32(0.0)), xs)
        grads = jax.tree.map(
            lambda g: (g.astype(jnp.float32) / n_items).astype(g.dtype), grads
        )
        loss = ce_total / n_items
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1))


def _subtree_split(params: Params, redundant: Tuple[int, ...]):
    """(trainable subtree {str(li): layer}, merge_fn) for the redundant layers."""

    def merge(tr, base):
        layers = list(base["layers"])
        for li in redundant:
            layers[li] = tr[str(li)]
        return {**base, "layers": layers}

    train = {str(li): params["layers"][li] for li in redundant}
    return train, merge


def _auto_scan_layers(params: Params, scan_layers: Optional[bool]) -> bool:
    """Scan-over-stacked-layers is a runtime COPY of the layer params — at 7B
    the ~10 GiB stack temp next to the 10.9 GiB params OOMs one chip, so big
    models unroll (same 6 GB heuristic as core.engine.GraspEngine.scan_fwd).
    Works on tracers: the decision uses static shapes only."""
    if scan_layers is not None:
        return scan_layers
    layer_bytes = sum(
        x.size * jnp.dtype(x.dtype).itemsize
        for x in jax.tree.leaves(params["layers"])
    )
    return layer_bytes < 6e9


def make_subtree_train_step(
    config: ModelConfig,
    plan: ModelPlan,
    optimizer: optax.GradientTransformation,
    redundant_layers: List[int],
    remat: bool = False,
    scan_layers: Optional[bool] = None,
) -> Callable:
    """make_train_step differentiating ONLY the redundant layers' subtree.

    The full-tree step materializes a gradient pytree the size of the model —
    at 7B that is a second 12.5 GiB resident for params that are ~94% frozen,
    which cannot fit a single 16 GiB chip next to the params and optimizer
    state. Here the loss is a function of the redundant layers alone (frozen
    leaves are captured constants), so grads are the size of the trainable
    subtree (~0.9 GiB at the paper config), and the frozen layers stay inside
    scan stacks: ``split_layers=redundant`` keeps the trainable layers
    unrolled so the stacks remain non-differentiable (models.llama.forward
    docstring — a traced kernel inside a stack would otherwise materialize
    model-sized zero cotangents).

    The optimizer must be built WITHOUT a mask (the subtree is entirely
    trainable) and initialized over the subtree:
    ``optimizer.init({str(li): params['layers'][li] for li in redundant})``.
    Updates match make_train_step's on the trainable leaves — the full-tree
    path zeroes frozen grads before its global clip, so both clip over the
    same norm (pinned by tests/test_recover_subtree.py).
    """
    redundant = tuple(sorted({int(i) for i in redundant_layers}))

    def step(params, opt_state, input_ids, labels, attention_mask):
        train, merge = _subtree_split(params, redundant)
        scan = _auto_scan_layers(params, scan_layers)

        def loss_fn(tr):
            p = merge(tr, params)
            logits = forward(
                p, input_ids, config=config, plan=plan,
                attention_mask=attention_mask, remat=remat,
                scan_layers=scan, split_layers=redundant,
            )["logits"]
            return hf_causal_lm_loss(logits, labels)

        loss, grads = jax.value_and_grad(loss_fn)(train)
        updates, opt_state = optimizer.update(grads, opt_state, train)
        train = optax.apply_updates(train, updates)
        return merge(train, params), opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1))


def make_subtree_accum_train_step(
    config: ModelConfig,
    plan: ModelPlan,
    optimizer: optax.GradientTransformation,
    redundant_layers: List[int],
    remat: bool = False,
    scan_layers: Optional[bool] = None,
) -> Callable:
    """make_accum_train_step (token-weighted HF semantics) over the redundant
    layers' subtree only — see make_subtree_train_step for why at 7B."""
    redundant = tuple(sorted({int(i) for i in redundant_layers}))

    def step(params, opt_state, input_ids, labels, attention_mask):
        train, merge = _subtree_split(params, redundant)
        n_items = jnp.maximum((labels != -100).sum(), 1).astype(jnp.float32)
        scan = _auto_scan_layers(params, scan_layers)

        def ce_sum(tr, ids, lab, am):
            p = merge(tr, params)
            logits = forward(
                p, ids, config=config, plan=plan,
                attention_mask=am, remat=remat,
                scan_layers=scan, split_layers=redundant,
            )["logits"]
            return hf_causal_lm_loss_sum(logits, lab)

        has_mask = attention_mask is not None

        def body(carry, xs):
            g_acc, ce_acc = carry
            am = xs[2] if has_mask else None
            ce, g = jax.value_and_grad(ce_sum)(train, xs[0], xs[1], am)
            return (jax.tree.map(jnp.add, g_acc, g), ce_acc + ce), None

        zeros = jax.tree.map(jnp.zeros_like, train)
        xs = (input_ids, labels) + ((attention_mask,) if has_mask else ())
        (grads, ce_total), _ = jax.lax.scan(body, (zeros, jnp.float32(0.0)), xs)
        grads = jax.tree.map(
            lambda g: (g.astype(jnp.float32) / n_items).astype(g.dtype), grads
        )
        loss = ce_total / n_items
        updates, opt_state = optimizer.update(grads, opt_state, train)
        train = optax.apply_updates(train, updates)
        return merge(train, params), opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1))


def stack_micro_batches(
    group: List[Dict[str, Any]], pad_token_id: int = 0
) -> Dict[str, Optional[np.ndarray]]:
    """Stack micro-batches into [accum, micro_bs, seq], right-padding each to
    the group's max seq len (input_ids -> pad_token_id, labels -> -100,
    attention_mask -> 0). Right padding is loss-invariant under the causal
    mask + -100 labels, so the group computes exactly what HF computes on the
    unpadded micros."""
    max_len = max(int(np.asarray(b["input_ids"]).shape[1]) for b in group)
    any_mask = any(b.get("attention_mask") is not None for b in group)

    def pad(x, value):
        x = np.asarray(x)
        if x.shape[1] == max_len:
            return x
        return np.pad(x, ((0, 0), (0, max_len - x.shape[1])), constant_values=value)

    ids = np.stack([pad(b["input_ids"], pad_token_id) for b in group])
    labels = np.stack([pad(b["labels"], -100) for b in group])
    mask = None
    if any_mask:
        mask = np.stack([
            pad(
                b["attention_mask"]
                if b.get("attention_mask") is not None
                else np.ones_like(np.asarray(b["input_ids"])),
                0,
            )
            for b in group
        ])
    return {"input_ids": ids, "labels": labels, "attention_mask": mask}


def make_eval_step(config: ModelConfig, plan: ModelPlan) -> Callable:
    def step(params, input_ids, labels, attention_mask):
        logits = forward(params, input_ids, config=config, plan=plan, attention_mask=attention_mask)["logits"]
        return hf_causal_lm_loss(logits, labels)

    return jax.jit(step)


# ---------------------------------------------------------------------------
# Train-state checkpointing (reference alpaca_grasp.py:143-153, 184-188)
# ---------------------------------------------------------------------------


def save_train_state(
    output_dir: str, step: int, params: Params, opt_state, history: Dict[str, Any],
    save_total_limit: int = 3, opt_step: Optional[int] = None,
) -> str:
    """Save {params, optimizer leaves, step, history} under output_dir/step_N,
    pruning to the newest `save_total_limit` checkpoints (HF Trainer
    save_total_limit semantics, alpaca_grasp.py:187).

    opt_step: optimizer-step counter at save time. Persisted so a resumed
    token-weighted run keeps the exact eval/save/log cadence even when
    epoch-tail flushes created partial accumulation groups (where
    start_step // accum_steps would drift)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(output_dir, f"step_{step}"))
    os.makedirs(path, exist_ok=True)
    state = {
        "params": jax.tree.map(np.asarray, params),
        "opt": [np.asarray(x) for x in jax.tree.leaves(opt_state)],
    }
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, "state"), state, force=True)
    with open(os.path.join(path, "train_meta.json"), "w") as f:
        json.dump({"step": step, "opt_step": opt_step, "history": history}, f)

    kept = sorted(
        (d for d in os.listdir(output_dir) if d.startswith("step_")),
        key=lambda d: int(d.split("_")[1]),
    )
    for stale in kept[:-save_total_limit] if save_total_limit else []:
        shutil.rmtree(os.path.join(output_dir, stale), ignore_errors=True)
    return path


def load_train_state(path: str, opt_state_template) -> Tuple[Params, Any, int, Dict[str, Any]]:
    """Restore (params, opt_state, step, history) saved by save_train_state.

    opt_state_template: a freshly-initialized optimizer state providing the
    pytree structure (checkpoints store flat leaves — data, not code)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(os.path.join(path, "state"))
    with open(os.path.join(path, "train_meta.json")) as f:
        meta = json.load(f)
    treedef = jax.tree.structure(opt_state_template)
    template_leaves = jax.tree.leaves(opt_state_template)
    leaves = [
        jnp.asarray(x, getattr(t, "dtype", None)) for x, t in zip(state["opt"], template_leaves)
    ]
    opt_state = jax.tree.unflatten(treedef, leaves)
    params = jax.tree.map(jnp.asarray, state["params"])
    return params, opt_state, int(meta["step"]), meta["history"]


def load_train_meta(path: str) -> Dict[str, Any]:
    """The step/opt_step/history metadata saved alongside a train state."""
    with open(os.path.join(os.path.abspath(path), "train_meta.json")) as f:
        return json.load(f)


def latest_checkpoint(output_dir: str) -> Optional[str]:
    if not os.path.isdir(output_dir):
        return None
    steps = sorted(
        (d for d in os.listdir(output_dir) if d.startswith("step_")),
        key=lambda d: int(d.split("_")[1]),
    )
    return os.path.join(output_dir, steps[-1]) if steps else None


def recovery_train(
    params: Params,
    config: ModelConfig,
    plan: ModelPlan,
    redundant_layers: List[int],
    train_batches: Iterable[Dict[str, np.ndarray]],
    val_batches: Optional[List[Dict[str, np.ndarray]]] = None,
    num_epochs: int = 1,
    learning_rate: float = 3e-4,
    accum_steps: int = 1,
    accum_mode: str = "token_weighted",
    warmup_steps: int = 100,
    steps_per_epoch: Optional[int] = None,
    eval_every: int = 200,
    log_every: int = 10,
    remat: bool = False,
    mesh=None,
    output_dir: Optional[str] = None,
    save_total_limit: int = 3,
    resume_from_checkpoint: Optional[str] = None,
    load_best_at_end: bool = True,
    grad_scope: str = "full",
) -> Tuple[Params, Dict[str, Any]]:
    """Run GRASP* recovery training; returns (new_params, history).

    grad_scope: "full" differentiates the whole tree with frozen grads zeroed
    (reference-faithful bookkeeping); "layers" differentiates only the
    redundant layers' subtree — same updates (tests/test_recover_subtree.py),
    but gradients cost the subtree instead of the model, which is what makes
    7B recovery fit a single 16 GiB chip. Checkpoints are scope-specific
    (the optimizer-state pytree differs): resume with the scope that saved.

    train_batches: iterable of {"input_ids", "labels", "attention_mask"}
    (labels use -100 for masked positions; loss shifts internally exactly as
    HF Trainer does for CausalLM — see hf_causal_lm_loss).

    Checkpointing (all reference-Trainer semantics, alpaca_grasp.py:184-188):
    when output_dir is set, eval+save every `eval_every` optimizer steps
    (optimizer steps = micro-steps // accum_steps, like HF global_step), keep
    the newest `save_total_limit`, and — if val_batches — load the checkpoint
    with the lowest eval loss at the end. resume_from_checkpoint (a step_N dir,
    or an output_dir whose latest step is taken) restores params + opt state +
    step and fast-forwards the data stream.

    mesh: optional ("data","model") Mesh — params TP-shard, batches dp-shard.
    """
    if mesh is not None:
        from grasp_tpu.parallel.mesh import shard_batch, shard_params

        params = shard_params(params, mesh, config)

    mask = trainable_mask(params, redundant_layers)
    total, trainable = count_trainable(params, mask)
    logger.info(
        "trainable params: %d || all params: %d || trainable: %.2f%%",
        trainable, total, 100.0 * trainable / total,
    )

    if steps_per_epoch is None:
        try:
            steps_per_epoch = len(train_batches)  # type: ignore[arg-type]
        except TypeError:
            steps_per_epoch = 1000
    total_steps = max(1, (steps_per_epoch * num_epochs) // max(accum_steps, 1))

    # token_weighted (default): accumulation groups are stacked and stepped by
    # make_accum_train_step, dividing by the group's total label-token count —
    # exactly HF Trainer >= 4.46 (the reference's engine on this install).
    # "mean" keeps optax.MultiSteps (arithmetic mean of per-micro mean losses;
    # identical when every micro-batch carries the same token count).
    if accum_mode not in ("token_weighted", "mean"):
        raise ValueError(f"accum_mode must be token_weighted|mean, got {accum_mode!r}")
    token_weighted = accum_mode == "token_weighted" and accum_steps > 1

    if grad_scope not in ("full", "layers"):
        raise ValueError(f"grad_scope must be full|layers, got {grad_scope!r}")
    optimizer = make_optimizer(
        learning_rate=learning_rate,
        total_steps=total_steps,
        warmup_steps=min(warmup_steps, total_steps),
        accum_steps=1 if token_weighted else accum_steps,
        mask=None if grad_scope == "layers" else mask,
    )
    if grad_scope == "layers":
        sub, _ = _subtree_split(params, tuple(sorted({int(i) for i in redundant_layers})))
        opt_state = optimizer.init(sub)
        if token_weighted:
            train_step = make_subtree_accum_train_step(
                config, plan, optimizer, redundant_layers, remat=remat)
        else:
            train_step = make_subtree_train_step(
                config, plan, optimizer, redundant_layers, remat=remat)
    elif token_weighted:
        opt_state = optimizer.init(params)
        train_step = make_accum_train_step(config, plan, optimizer, remat=remat)
    else:
        opt_state = optimizer.init(params)
        train_step = make_train_step(config, plan, optimizer, remat=remat)
    eval_step = make_eval_step(config, plan) if val_batches else None

    history: Dict[str, Any] = {"train_loss": [], "eval_loss": []}
    start_step = 0
    if resume_from_checkpoint:
        ckpt = resume_from_checkpoint
        if not os.path.basename(ckpt).startswith("step_"):
            found = latest_checkpoint(ckpt)
            if found is None:
                raise FileNotFoundError(f"no step_N checkpoints under {ckpt!r}")
            ckpt = found
        params, opt_state, start_step, history = load_train_state(ckpt, opt_state)
        resumed_opt_step = load_train_meta(ckpt).get("opt_step")
        if mesh is not None:
            from grasp_tpu.parallel.mesh import shard_params

            params = shard_params(params, mesh, config)
        logger.info("resumed from %s at micro-step %d", ckpt, start_step)

    def _prep(b):
        arrs = {
            "input_ids": jnp.asarray(b["input_ids"]),
            "labels": jnp.asarray(b["labels"]),
        }
        if b.get("attention_mask") is not None:
            arrs["attention_mask"] = jnp.asarray(b["attention_mask"])
        if mesh is not None:
            from grasp_tpu.parallel.mesh import shard_batch

            arrs = shard_batch(arrs, mesh)
        return arrs

    def _run_eval(p):
        return float(np.mean([
            float(eval_step(
                p, b["input_ids"], b["labels"], b.get("attention_mask"),
            ))
            for b in map(_prep, val_batches)
        ]))

    best = (float("inf"), None)  # (eval loss, checkpoint path)
    step_i = 0
    # Optimizer-step counter: restored from the checkpoint when present; the
    # floor-division fallback (old checkpoints) assumes all prior groups were
    # full and can drift the eval/save/log cadence across an epoch tail.
    opt_i = start_step // max(accum_steps, 1)
    if resume_from_checkpoint and resumed_opt_step is not None:
        opt_i = int(resumed_opt_step)
    t0 = time.time()
    group: List[Dict[str, Any]] = []

    def _eval_and_save():
        nonlocal best
        ev = None
        if eval_step:
            ev = _run_eval(params)
            history["eval_loss"].append((step_i, ev))
            logger.info("eval loss %.4f", ev)
        if output_dir:
            path = save_train_state(
                output_dir, step_i, params, opt_state, history,
                save_total_limit=save_total_limit, opt_step=opt_i,
            )
            if eval_step and ev < best[0]:
                best = (ev, path)

    def _flush_group(epoch):
        nonlocal params, opt_state, opt_i, group
        stacked = stack_micro_batches(group)
        group = []
        arrs = {
            k: jnp.asarray(v) if v is not None else None for k, v in stacked.items()
        }
        if mesh is not None:
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as P

            sh = NamedSharding(mesh, P(None, "data"))
            arrs = {
                k: jax.device_put(v, sh) if v is not None else None
                for k, v in arrs.items()
            }
        params, opt_state, loss = train_step(
            params, opt_state, arrs["input_ids"], arrs["labels"], arrs["attention_mask"]
        )
        opt_i += 1
        # log_every counts OPTIMIZER steps here (= HF logging_steps semantics)
        if opt_i % log_every == 0:
            lv = float(loss)
            history["train_loss"].append((step_i, lv))
            logger.info("epoch %d opt-step %d loss %.4f (%.1fs)",
                        epoch, opt_i, lv, time.time() - t0)
        # reference cadence: every eval_every OPTIMIZER steps (HF global_step
        # counts accumulation cycles, alpaca_grasp.py:184-186)
        if opt_i % eval_every == 0:
            _eval_and_save()

    for epoch in range(num_epochs):
        for batch in train_batches:
            step_i += 1
            if step_i <= start_step:
                continue  # fast-forward a resumed run through consumed data
            if token_weighted:
                group.append(batch)
                if len(group) == accum_steps:
                    _flush_group(epoch)
                continue
            batch = _prep(batch)
            params, opt_state, loss = train_step(
                params, opt_state,
                batch["input_ids"], batch["labels"], batch.get("attention_mask"),
            )
            if step_i % log_every == 0:
                lv = float(loss)
                history["train_loss"].append((step_i, lv))
                logger.info("epoch %d step %d loss %.4f (%.1fs)", epoch, step_i, lv, time.time() - t0)
            # reference cadence: every eval_every OPTIMIZER steps (HF
            # global_step counts accumulation cycles, alpaca_grasp.py:184-186)
            at_opt_boundary = step_i % max(accum_steps, 1) == 0
            if at_opt_boundary:
                opt_i = step_i // max(accum_steps, 1)  # keep saved opt_step honest
            if at_opt_boundary and (step_i // max(accum_steps, 1)) % eval_every == 0:
                _eval_and_save()
        if group:
            # epoch tail: HF's iterator yields a final smaller group and still
            # counts it as one global step
            _flush_group(epoch)

    if output_dir and load_best_at_end and best[1] is not None and os.path.isdir(best[1]):
        final_ev = _run_eval(params) if eval_step else float("inf")
        if best[0] < final_ev:
            logger.info("loading best checkpoint %s (eval %.4f < final %.4f)",
                        best[1], best[0], final_ev)
            params, _, _, _ = load_train_state(best[1], opt_state)
            if mesh is not None:
                from grasp_tpu.parallel.mesh import shard_params

                params = shard_params(params, mesh, config)

    return params, history
