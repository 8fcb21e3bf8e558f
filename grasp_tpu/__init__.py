"""grasp_tpu — TPU-native GRASP: gradient-based retention of adaptive singular parameters.

A from-scratch JAX/XLA/Pallas rebuild of the GRASP post-training LLM
compression method (arXiv:2501.00339; reference implementation at
compressionOrg/GRASP). The compute path is pure functional JAX — immutable
parameter pytrees, static per-projection "plans" (dense | svd | low-rank),
`jax.grad` for singular-value saliency, and `jax.sharding.Mesh` + NamedSharding
for multi-chip execution — rather than a port of the reference's mutable
torch.nn design.

Public surface (mirrors reference grasp.py / modeling_grasp.py capabilities):

- :mod:`grasp_tpu.ops`      — block influence, rank selection, SVD, low-rank kernels
- :mod:`grasp_tpu.models`   — LLaMA-family causal LM (GQA) with projection overrides
- :mod:`grasp_tpu.core`     — the compression engine (BI -> SVD-ify -> grad sweep ->
                              select -> compile)
- :mod:`grasp_tpu.parallel` — device mesh + sharding rules
- :mod:`grasp_tpu.data`     — calibration / evaluation corpora, tokenizers, prompts
- :mod:`grasp_tpu.train`    — recovery fine-tuning (GRASP*)
- :mod:`grasp_tpu.eval`     — perplexity, zero-shot harness, LongBench
"""

__version__ = "0.1.0"

from grasp_tpu.configs import GraspConfig, ModelConfig  # noqa: F401


def enable_compilation_cache(path=None) -> bool:
    """Opt-in persistent XLA compilation cache (repeat runs skip compiles).

    Activates when ``path`` or ``$GRASP_COMPILE_CACHE`` names a directory;
    returns True if enabled. Worth large wall-clock wins on standard TPU
    runtimes where first-compiles dominate short jobs; a no-op benefit on
    runtimes whose compiles happen remotely (the cache stores locally-built
    executables only). CLI entry points call this automatically.
    """
    import os

    p = path or os.environ.get("GRASP_COMPILE_CACHE")
    if not p:
        return False
    import jax

    os.makedirs(p, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", p)
    # cache everything: tiny graphs recompile constantly during compression
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return True
