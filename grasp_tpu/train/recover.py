"""Recovery fine-tuning (GRASP*) — Alpaca instruction tuning of ONLY the
compressed layers.

TPU-native replacement for the reference's HF-Trainer path
(alpaca_grasp.py:28-198): optax AdamW with a **masked trainable subtree**
(every parameter of each redundant layer — the reference unfreezes whole
layers, alpaca_grasp.py:76-83), linear warmup(100)+decay schedule matching
HF Trainer defaults (alpaca_grasp.py:170-196), gradient accumulation =
batch_size // micro_batch_size (:68) via optax.MultiSteps, and bf16 compute
instead of the reference's fp16 (TPU-native mixed precision).

The training step jit-compiles once per plan and shards over a
("data","model") mesh via NamedShardings when one is provided.
"""

from __future__ import annotations

import logging
import time
from typing import Any, Callable, Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from grasp_tpu.configs import ModelConfig
from grasp_tpu.models.llama import ModelPlan, Params, forward, hf_causal_lm_loss

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


def make_optimizer(
    learning_rate: float = 3e-4,
    total_steps: int = 1000,
    warmup_steps: int = 100,
    accum_steps: int = 1,
    mask: Optional[Params] = None,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    """AdamW + HF-Trainer-default linear warmup/decay, masked, with accumulation."""
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


def make_eval_step(config: ModelConfig, plan: ModelPlan) -> Callable:
    def step(params, input_ids, labels, attention_mask):
        logits = forward(params, input_ids, config=config, plan=plan, attention_mask=attention_mask)["logits"]
        return hf_causal_lm_loss(logits, labels)

    return jax.jit(step)


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
    warmup_steps: int = 100,
    steps_per_epoch: Optional[int] = None,
    eval_every: int = 200,
    log_every: int = 10,
    remat: bool = False,
) -> Tuple[Params, Dict[str, Any]]:
    """Run GRASP* recovery training; returns (new_params, history).

    train_batches: iterable of {"input_ids", "labels", "attention_mask"}
    (labels use -100 for masked positions; loss shifts internally exactly as
    HF Trainer does for CausalLM — see hf_causal_lm_loss).
    """
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

    optimizer = make_optimizer(
        learning_rate=learning_rate,
        total_steps=total_steps,
        warmup_steps=min(warmup_steps, total_steps),
        accum_steps=accum_steps,
        mask=mask,
    )
    opt_state = optimizer.init(params)
    train_step = make_train_step(config, plan, optimizer, remat=remat)
    eval_step = make_eval_step(config, plan) if val_batches else None

    history: Dict[str, Any] = {"train_loss": [], "eval_loss": []}
    step_i = 0
    t0 = time.time()
    for epoch in range(num_epochs):
        for batch in train_batches:
            params, opt_state, loss = train_step(
                params, opt_state,
                jnp.asarray(batch["input_ids"]),
                jnp.asarray(batch["labels"]),
                jnp.asarray(batch["attention_mask"]) if batch.get("attention_mask") is not None else None,
            )
            step_i += 1
            if step_i % log_every == 0:
                lv = float(loss)
                history["train_loss"].append((step_i, lv))
                logger.info("epoch %d step %d loss %.4f (%.1fs)", epoch, step_i, lv, time.time() - t0)
            if eval_step and step_i % eval_every == 0:
                ev = float(
                    np.mean([
                        float(eval_step(
                            params,
                            jnp.asarray(b["input_ids"]),
                            jnp.asarray(b["labels"]),
                            jnp.asarray(b["attention_mask"]) if b.get("attention_mask") is not None else None,
                        ))
                        for b in val_batches
                    ])
                )
                history["eval_loss"].append((step_i, ev))
                logger.info("eval loss %.4f", ev)

    return params, history
