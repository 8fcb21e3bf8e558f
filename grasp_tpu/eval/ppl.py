"""Perplexity evaluation.

Reproduces the reference's two PPL procedures exactly:

  - :func:`windowed_perplexity` — evaluate_grasp.py:157-208: non-overlapping
    `seqlen`-token windows over the full corpus, shift-by-1 CE per window,
    ppl = exp(sum(nll * seqlen) / (n * seqlen)). (The reference multiplies the
    window's mean CE by seqlen then divides the sum by n*seqlen — i.e. a mean
    of window-mean-CEs, replicated here including the `limit` early-stop
    off-by-one: it stops AFTER processing window i == limit.)
  - :func:`evaluate_perplexity` — evaluate_grasp.py:99-127: rows of a
    pre-chunked [n, seq] dataset with input=row[:-1], labels=row[1:]
    (its `limit` stops BEFORE processing row i == limit — the reference's
    off-by-one difference between the two procedures, preserved).

One-dispatch design: all windows are stacked and evaluated inside a single
jitted ``lax.map`` (one window per step, so peak memory stays at one
window's logits while the whole corpus costs ONE dispatch). On this
container the axon tunnel charges ~35-40 ms per dispatched call — the old
window-at-a-time loop paid that ~170x for wikitext2 — and the per-window
values are computed by the same graph, so the PPL is unchanged (pinned
against the executing torch reference in tests/test_data_eval.py).
"""

from __future__ import annotations

import logging
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from grasp_tpu.configs import ModelConfig
from grasp_tpu.models.llama import ModelPlan, Params, default_plan, forward

logger = logging.getLogger("grasp_tpu")


@partial(jax.jit, static_argnames=("config", "plan"))
def _windows_mean_ce(params, windows, *, config, plan):
    """Per-window mean shift-by-1 CE, [n, seqlen] -> [n], one dispatch."""

    def one(window):
        logits = forward(params, window[None], config=config, plan=plan)["logits"]
        shift_logits = logits[:, :-1, :].astype(jnp.float32)
        shift_labels = window[None, 1:]
        logp = jax.nn.log_softmax(shift_logits, axis=-1)
        tok_nll = -jnp.take_along_axis(logp, shift_labels[..., None], axis=-1)[..., 0]
        return jnp.mean(tok_nll)

    return jax.lax.map(one, windows)


@partial(jax.jit, static_argnames=("config", "plan"))
def _rows_mean_ce(params, rows, *, config, plan):
    """Per-row mean CE with input=row[:-1], labels=row[1:]; [n, seq] -> [n]."""

    def one(row):
        logits = forward(params, row[None, :-1], config=config, plan=plan)["logits"]
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tok = -jnp.take_along_axis(logp, row[None, 1:, None], axis=-1)[..., 0]
        return jnp.mean(tok)

    return jax.lax.map(one, rows)


def windowed_perplexity(
    params: Params,
    config: ModelConfig,
    corpus_ids: np.ndarray,
    plan: Optional[ModelPlan] = None,
    seqlen: int = 2048,
    limit: int = -1,
) -> float:
    """PPL over non-overlapping windows (reference evaluate_grasp.py:180-202)."""
    plan = plan or default_plan(config)
    nsamples = len(corpus_ids) // seqlen
    # reference loop breaks AFTER processing window i == limit
    n_eff = nsamples if limit < 0 else min(limit + 1, nsamples)
    if n_eff == 0:
        logger.info("PPL: nan (no windows)")
        return float("nan")
    windows = jnp.asarray(
        np.asarray(corpus_ids[: n_eff * seqlen]).reshape(n_eff, seqlen), jnp.int32
    )
    mean_ces = np.asarray(_windows_mean_ce(params, windows, config=config, plan=plan), np.float64)
    # reference computes mean-CE * seqlen per window
    ppl = float(np.exp(np.sum(mean_ces * seqlen) / (n_eff * seqlen)))
    logger.info("PPL: %s", ppl)
    return ppl


def evaluate_perplexity(
    params: Params,
    config: ModelConfig,
    dataset: np.ndarray,
    plan: Optional[ModelPlan] = None,
    limit: int = -1,
) -> float:
    """Row-wise PPL of a pre-chunked [n, seq] id matrix
    (reference evaluate_grasp.py:99-127: input=row[:-1], labels=row[1:])."""
    plan = plan or default_plan(config)
    nsamples, seqlen = dataset.shape
    # reference loop breaks BEFORE processing row i == limit
    n_eff = nsamples if limit < 0 else min(limit, nsamples)
    if n_eff == 0:
        logger.info("PPL: nan (no rows)")
        return float("nan")
    rows = jnp.asarray(np.asarray(dataset[:n_eff]), jnp.int32)
    mean_ces = np.asarray(_rows_mean_ce(params, rows, config=config, plan=plan), np.float64)
    ppl = float(np.exp(np.sum(mean_ces * seqlen) / (n_eff * seqlen)))
    logger.info("PPL: %s", ppl)
    return ppl
