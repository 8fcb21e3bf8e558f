"""Device mesh + sharding rules — a first-class NEW component.

The reference has **no** parallelism (SURVEY.md §2: single-GPU pinning only,
no NCCL/MPI/Gloo anywhere). On TPU, scale comes from `jax.sharding.Mesh` over
ICI with XLA-inserted collectives, not from a comms library:

  - mesh axes ``("data", "model")``: calibration/recovery batches shard over
    ``data``; the transformer's dense projections shard Megatron-style over
    ``model`` (column-parallel q/k/v/gate/up, row-parallel o/down) so each
    attention+MLP pair needs exactly one psum, which XLA inserts from the
    NamedShardings — no hand-written collectives.
  - vocab embedding and lm_head shard over ``model`` (vocab-parallel).
  - SVD / low-rank modules are replicated: after compression they are small by
    construction (rank k ~= in*out*(1-ratio)/(in+out)), and replication keeps
    rank dimensions free of divisibility constraints.

Multi-host: call `jax.distributed.initialize()` before `make_mesh` (DCN across
slices, ICI within — standard JAX; nothing framework-specific needed).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from grasp_tpu.configs import ModelConfig
from grasp_tpu.models.llama import ATTN_PROJS, MLP_PROJS, ModelPlan, Params, default_plan

DATA_AXIS, MODEL_AXIS = "data", "model"


def distributed_init(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bring-up: ICI within a slice, DCN across hosts.

    Thin wrapper over jax.distributed.initialize — on TPU pods the arguments
    auto-detect from the environment; pass them explicitly elsewhere. Call once
    per process before make_mesh. No-ops if already initialized.
    """
    import jax

    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:  # already initialized
        if "already" not in str(e).lower():
            raise


def make_mesh(shape: Optional[Tuple[int, int]] = None, devices=None) -> Mesh:
    """Build a ("data", "model") mesh.

    shape=None uses all visible devices as (n_devices, 1) — pure data parallel.
    """
    devices = devices if devices is not None else jax.devices()
    if shape is None:
        shape = (len(devices), 1)
    d, m = shape
    if d * m != len(devices):
        raise ValueError(f"mesh shape {shape} incompatible with {len(devices)} devices")
    dev_array = np.asarray(devices).reshape(d, m)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


# ---------------------------------------------------------------------------
# Sharding rules
# ---------------------------------------------------------------------------

_DENSE_SPECS = {
    # column-parallel (output dim sharded)
    "q_proj": P(None, MODEL_AXIS),
    "k_proj": P(None, MODEL_AXIS),
    "v_proj": P(None, MODEL_AXIS),
    "gate_proj": P(None, MODEL_AXIS),
    "up_proj": P(None, MODEL_AXIS),
    # row-parallel (input dim sharded -> psum on output)
    "o_proj": P(MODEL_AXIS, None),
    "down_proj": P(MODEL_AXIS, None),
}

_BIAS_SPECS = {
    "q_proj": P(MODEL_AXIS),
    "k_proj": P(MODEL_AXIS),
    "v_proj": P(MODEL_AXIS),
    "gate_proj": P(MODEL_AXIS),
    "up_proj": P(MODEL_AXIS),
    "o_proj": P(None),
    "down_proj": P(None),
}


def _proj_spec(proj_name: str, proj_params: Dict[str, Any]) -> Dict[str, Any]:
    """PartitionSpecs for one projection's params, keyed like the params."""
    specs: Dict[str, Any] = {}
    for key in proj_params:
        if key in ("kernel", "kernel_q", "kernel_q4"):
            specs[key] = _DENSE_SPECS[proj_name]
        elif key == "kernel_scale":
            # per-output-channel scale [1, out]: follows the kernel's out-dim
            # sharding (column-parallel) or replicates (row-parallel)
            out_spec = _DENSE_SPECS[proj_name][1]
            specs[key] = P(None, out_spec)
        elif key == "bias":
            specs[key] = _BIAS_SPECS[proj_name]
        else:
            # svd (u/s/vh) and lowrank (in_kernel/out_kernel, incl. their _q/_scale
            # forms): replicate — small post-compression; avoids rank-dim
            # divisibility issues
            specs[key] = P()
    return specs


def moe_specs(moe_params: Dict[str, Any]) -> Dict[str, Any]:
    """Expert parallelism: stacked expert weights shard their leading
    [num_experts] axis over MODEL_AXIS; the router gate is tiny and
    replicates. GSPMD turns the combine contraction over experts into the EP
    all-reduce (models/moe.moe_apply). Specs are keyed off the actual expert
    dict so quantized forms (w*_q / w*_q4 / w*_scale, all stacked [E, ...])
    shard identically."""
    return {
        "gate": {"kernel": P()},
        "experts": {
            key: P(MODEL_AXIS, *([None] * (np.ndim(val) - 1)))
            for key, val in moe_params["experts"].items()
        },
    }


def param_specs(params: Params, config: ModelConfig) -> Params:
    """A pytree of PartitionSpec congruent to `params`."""
    layers = []
    for layer in params["layers"]:
        lspec: Dict[str, Any] = {
            "input_layernorm": {"weight": P()},
            "post_attention_layernorm": {"weight": P()},
            "self_attn": {p: _proj_spec(p, layer["self_attn"][p]) for p in ATTN_PROJS},
        }
        if "moe" in layer:
            lspec["moe"] = moe_specs(layer["moe"])
        else:
            lspec["mlp"] = {p: _proj_spec(p, layer["mlp"][p]) for p in MLP_PROJS}
        layers.append(lspec)
    specs: Params = {
        "embed_tokens": {"weight": P(MODEL_AXIS, None)},
        "layers": layers,
        "norm": {"weight": P()},
    }
    if "lm_head" in params:
        head_specs: Dict[str, Any] = {}
        for key in params["lm_head"]:
            if key in ("kernel", "kernel_q", "kernel_q4"):
                head_specs[key] = P(None, MODEL_AXIS)
            elif key == "kernel_scale":
                head_specs[key] = P(None, MODEL_AXIS)
            else:
                head_specs[key] = P()
        specs["lm_head"] = head_specs
    return specs


def batch_spec() -> P:
    return P(DATA_AXIS, None)


def shard_params(params: Params, mesh: Mesh, config: ModelConfig) -> Params:
    """Place a params pytree on the mesh per the TP/replication rules."""
    specs = param_specs(params, config)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_batch(batch: Dict[str, jax.Array], mesh: Mesh) -> Dict[str, jax.Array]:
    sharding = NamedSharding(mesh, batch_spec())
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
