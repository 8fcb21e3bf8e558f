"""Saliency & rank-selection math.

TPU-native equivalents of the reference's scoring utilities
(reference: tools/utils_func.py:3-58 and modeling_grasp.py:311-317, 392-407).

Key deviation (documented, numerically identical): the reference's
``block_influence`` materializes a full (B*S, B*S) similarity matrix and takes
its diagonal (tools/utils_func.py:19-20) — O((BS)^2 * d). We compute the
row-wise cosine directly — O(BS * d) — which equals that diagonal exactly.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def block_influence(
    input_hidden_state: jax.Array,
    output_hidden_state: jax.Array,
    angular: bool = False,
) -> jax.Array:
    """Per-token block influence between two hidden states.

    Mirrors reference tools/utils_func.py:3-25: rows are flattened (B*S, D);
    score_i = 1 - cos(in_i, out_i) (or arccos(cos)/pi when angular), with
    NaN cosines mapped to 0.5 *before* the angular/1-x transform.

    Args:
        input_hidden_state:  [..., D]
        output_hidden_state: [..., D]
    Returns:
        [...] per-row influence scores (float32).
    """
    d = input_hidden_state.shape[-1]
    x = input_hidden_state.reshape(-1, d).astype(jnp.float32)
    y = output_hidden_state.reshape(-1, d).astype(jnp.float32)

    dot = jnp.sum(x * y, axis=-1)
    norm = jnp.linalg.norm(x, axis=-1) * jnp.linalg.norm(y, axis=-1)
    sim = dot / norm
    sim = jnp.nan_to_num(sim, nan=0.5)

    if angular:
        # clip for float safety before arccos (reference relies on torch arccos
        # returning nan outside [-1,1]; we clamp instead — values can only fall
        # outside by float error).
        return jnp.arccos(jnp.clip(sim, -1.0, 1.0)) / jnp.pi
    return 1.0 - sim


def bi_from_hiddens(
    hiddens: Sequence[jax.Array],
    num_prune_layers: int = 1,
    angular: bool = False,
) -> jax.Array:
    """Vectorized block-influence over a full stack of hidden states.

    Reference semantics (modeling_grasp.py:150-167): for each i in
    [0, L+1 - n), score layer i by mean block_influence(h[i], h[i+n]) where
    n = num_prune_layers if angular else 1; angular mode keeps only the last
    token position.

    The reference loops layer-by-layer per batch; we stack the hidden states
    once and score every layer in a single fused pass.

    Args:
        hiddens: sequence of L+1 arrays [B, S, D] (embedding output + each layer).
    Returns:
        [L+1-n] mean influence per scored position (float32). Callers accumulate
        across batches by summation, exactly like the reference (+= mean).
    """
    n = num_prune_layers if angular else 1
    h = jnp.stack(list(hiddens), axis=0)  # [L+1, B, S, D]
    if angular:
        h = h[:, :, -1:, :]
    d = h.shape[-1]
    x = h[:-n].reshape(h.shape[0] - n, -1, d).astype(jnp.float32)  # [L', N, D]
    y = h[n:].reshape(h.shape[0] - n, -1, d).astype(jnp.float32)

    dot = jnp.sum(x * y, axis=-1)
    norm = jnp.linalg.norm(x, axis=-1) * jnp.linalg.norm(y, axis=-1)
    sim = jnp.nan_to_num(dot / norm, nan=0.5)
    if angular:
        scores = jnp.arccos(jnp.clip(sim, -1.0, 1.0)) / jnp.pi
    else:
        scores = 1.0 - sim
    return jnp.mean(scores, axis=-1)


def choose_prune_layers(
    layer_importances: np.ndarray,
    num_prune_layers: int,
    angular: bool = False,
) -> list:
    """Pick layers to prune from accumulated importances.

    Reference modeling_grasp.py:185-189: angular mode picks the contiguous
    window of `num_prune_layers` starting at the argmin of the windowed scores
    (note: the reference slice `[:-n+1]` crashes for n==1; we use the
    well-defined equivalent that keeps all valid windows). Non-angular picks
    the n individually lowest-importance layers (argsort order, ties stable).
    """
    imp = np.asarray(layer_importances, dtype=np.float64)
    if angular:
        valid = imp[: len(imp) - num_prune_layers + 1] if num_prune_layers > 1 else imp
        start = int(np.argsort(valid, kind="stable")[0])
        return list(range(start, start + num_prune_layers))
    return np.argsort(imp, kind="stable")[:num_prune_layers].tolist()


def preserve_rank(in_features: int, out_features: int, compression_ratio: float) -> int:
    """Rank k keeping (1-ratio) of the dense parameter count.

    Reference modeling_grasp.py:311-317:
    k = floor(in*out*(1-ratio) / (in+out)).
    """
    if compression_ratio is None:
        raise ValueError("Compression ratio should not be None")
    return int(in_features * out_features * (1 - compression_ratio) / (in_features + out_features))


def svd_saliency(grad: jax.Array, s: jax.Array, metric: str = "taylor") -> jax.Array:
    """Importance of each singular triplet.

    Reference modeling_grasp.py:392-397: "gradient" -> |dL/dS|,
    "taylor" -> |S * dL/dS| (first-order Taylor of loss change on removal).
    """
    if metric == "gradient":
        return jnp.abs(grad)
    if metric == "taylor":
        return jnp.abs(grad * s)
    raise ValueError(f"metric {metric!r} not supported (use 'gradient' or 'taylor')")


def select_topk(importance: jax.Array, k: int) -> jax.Array:
    """Indices of the k most important singular values, descending importance.

    Matches torch.topk tie order (lower index wins) via jax.lax.top_k
    (reference modeling_grasp.py:402-404). Returned order is the topk order
    (NOT sorted ascending) — the reference slices U/S/Vh in this order and we
    match exactly for bit-identical compiled factors.
    """
    _, idx = jax.lax.top_k(importance, k)
    return idx


def adaptive_rank_selection(svd_importance: np.ndarray, target_ratio: float) -> list:
    """Smallest descending-importance prefix whose mass reaches target_ratio.

    Reference tools/utils_func.py:45-58: sort desc (stable in first-index tie
    order), accumulate until cumulative >= total * target_ratio. Runs on host
    (data-dependent output size can't be jitted); executed once per selection.
    """
    imp = np.asarray(svd_importance, dtype=np.float64)
    total = float(imp.sum())
    target = total * target_ratio
    # np.argsort is ascending; stable sort of -imp gives descending with
    # lowest-index-first ties, matching python sorted(key=-x).
    order = np.argsort(-imp, kind="stable")
    csum = np.cumsum(imp[order])
    # number of entries until cumulative >= target (always >= 1)
    cutoff = int(np.searchsorted(csum, target, side="left")) + 1
    cutoff = min(cutoff, len(imp))
    return order[:cutoff].tolist()
