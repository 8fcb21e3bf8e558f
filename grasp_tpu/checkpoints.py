"""Checkpoint save/load.

The reference pickles the whole GRASPModel object (torch.save(grasp_model),
grasp.py:129-136) — loading requires the defining module on the path
(evaluate.py:42). Here checkpoints are **data, not code**: an Orbax (OCDBT)
params pytree plus a JSON metadata sidecar carrying {model config, projection
plan, rank_dict, redundant_layers, BI scores}. Anything that can read Orbax +
JSON can restore the compressed model.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from grasp_tpu.configs import ModelConfig
from grasp_tpu.models.llama import ModelPlan

_META_NAME = "grasp_meta.json"
_PARAMS_DIR = "params"


def save_checkpoint(
    path: str,
    params: Any,
    config: ModelConfig,
    plan: ModelPlan,
    rank_dict: Optional[Dict[str, int]] = None,
    redundant_layers: Optional[list] = None,
    layer_importances: Optional[list] = None,
    extra: Optional[Dict[str, Any]] = None,
    params_dirname: str = _PARAMS_DIR,
) -> str:
    """Save params (Orbax) + JSON metadata. The meta write is the COMMIT
    point: params go down first (into ``params_dirname``), then the meta is
    written to a temp file and ``os.replace``d into place, so a reader never
    sees a truncated meta and a kill between the two writes leaves any
    previously-committed meta (and the params dir it names) intact.
    Crash-resume snapshots exploit this by alternating ``params_dirname``
    (engine._snapshot_rounds)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, params_dirname), jax.tree.map(np.asarray, params), force=True)

    meta = {
        "framework": "grasp_tpu",
        "model_config": json.loads(config.to_json()),
        "plan": [list(layer) for layer in plan],
        "rank_dict": rank_dict or {},
        "redundant_layers": list(redundant_layers or []),
        "layer_importances": [float(x) for x in (layer_importances or [])],
        "params_dir": params_dirname,
        "extra": extra or {},
    }
    tmp = os.path.join(path, _META_NAME + ".tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=2)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(path, _META_NAME))
    return path


def load_checkpoint(path: str) -> Tuple[Any, ModelConfig, ModelPlan, Dict[str, Any]]:
    """Returns (params, config, plan, meta)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with open(os.path.join(path, _META_NAME)) as f:
        meta = json.load(f)
    config = ModelConfig(**meta["model_config"])
    plan: ModelPlan = tuple(tuple(layer) for layer in meta["plan"])

    with ocp.StandardCheckpointer() as ckptr:
        params = ckptr.restore(os.path.join(path, meta.get("params_dir", _PARAMS_DIR)))
    return params, config, plan, meta
