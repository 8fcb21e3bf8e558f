"""Perplexity evaluation.

Reproduces the reference's two PPL procedures exactly:

  - :func:`windowed_perplexity` — evaluate_grasp.py:157-208: non-overlapping
    `seqlen`-token windows over the full corpus, shift-by-1 CE per window,
    ppl = exp(sum(nll * seqlen) / (n * seqlen)). (The reference multiplies the
    window's mean CE by seqlen then divides the sum by n*seqlen — i.e. a mean
    of window-mean-CEs, replicated here including the `limit` early-stop
    off-by-one: it breaks AFTER processing window i == limit.)
  - :func:`evaluate_perplexity` — evaluate_grasp.py:99-127: rows of a
    pre-chunked [n, seq] dataset with input=row[:-1], labels=row[1:].

The per-window loss fn is jitted once and reused across windows.
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


def _window_nll_fn(config: ModelConfig, plan: ModelPlan):
    @jax.jit
    def nll(params, window):
        """window: [1, seqlen]. CE of logits[:, :-1] vs window[:, 1:], mean."""
        logits = forward(params, window, config=config, plan=plan)["logits"]
        shift_logits = logits[:, :-1, :].astype(jnp.float32)
        shift_labels = window[:, 1:]
        logp = jax.nn.log_softmax(shift_logits, axis=-1)
        tok_nll = -jnp.take_along_axis(logp, shift_labels[..., None], axis=-1)[..., 0]
        return jnp.mean(tok_nll)

    return nll


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
    nll_fn = _window_nll_fn(config, plan)
    nsamples = len(corpus_ids) // seqlen
    nlls = []
    for i in range(nsamples):
        window = jnp.asarray(corpus_ids[i * seqlen : (i + 1) * seqlen], jnp.int32)[None, :]
        # reference computes mean-CE * seqlen per window
        nlls.append(float(nll_fn(params, window)) * seqlen)
        if i == limit:
            break
    ppl = float(np.exp(np.sum(nlls) / (len(nlls) * seqlen)))
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
    config_ = config

    @jax.jit
    def nll(params, input_ids, labels):
        logits = forward(params, input_ids, config=config_, plan=plan)["logits"]
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tok = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
        return jnp.mean(tok)

    nsamples, seqlen = dataset.shape
    nlls = []
    for i in range(nsamples):
        if i == limit:
            break
        row = jnp.asarray(dataset[i : i + 1], jnp.int32)
        nlls.append(float(nll(params, row[:, :-1], row[:, 1:])) * seqlen)
    ppl = float(np.exp(np.sum(nlls) / (len(nlls) * seqlen)))
    logger.info("PPL: %s", ppl)
    return ppl
