"""Docs-integrity guards: PARITY.md's component map must reference real code."""

import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_parity_doc_paths_exist():
    text = open(os.path.join(REPO, "PARITY.md")).read()
    for path in set(re.findall(r"`(grasp_tpu/[\w/\.]+\.py)`", text)):
        assert os.path.exists(os.path.join(REPO, path)), f"PARITY.md references missing {path}"
    for path in set(re.findall(r"`(tests/[\w/\.]+\.py)`", text)):
        assert os.path.exists(os.path.join(REPO, path)), f"PARITY.md references missing {path}"
    for path in set(re.findall(r"`(scripts/[\w/\.]+\.(?:py|sh))`", text)):
        assert os.path.exists(os.path.join(REPO, path)), f"PARITY.md references missing {path}"


def test_public_api_imports():
    """Everything README/PARITY advertise as public must import."""
    import grasp_tpu
    from grasp_tpu import GraspConfig, ModelConfig  # noqa: F401
    from grasp_tpu.checkpoints import load_checkpoint, save_checkpoint  # noqa: F401
    from grasp_tpu.cli import compress_main, evaluate_main  # noqa: F401
    from grasp_tpu.core import GraspEngine  # noqa: F401
    from grasp_tpu.data import ByteTokenizer, Prompter, get_calibration_batches  # noqa: F401
    from grasp_tpu.eval import EvalLM, Generator, eval_longbench, evaluate_tasks  # noqa: F401
    from grasp_tpu.models import forward, init_params  # noqa: F401
    from grasp_tpu.native import BatchServer, TokenStore  # noqa: F401
    from grasp_tpu.ops import flash_attention, fused_lowrank, svd  # noqa: F401
    from grasp_tpu.ops.quant import quantize_model_weights  # noqa: F401
    from grasp_tpu.parallel import (  # noqa: F401
        context_parallel_attention,
        make_mesh,
        seq_parallel_logits,
        shard_params,
    )
    from grasp_tpu.perf import estimate_forward_flops, generation_benchmark  # noqa: F401
    from grasp_tpu.train import recovery_train, trainable_mask  # noqa: F401

    assert grasp_tpu.__version__
