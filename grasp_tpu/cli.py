"""Command-line entry points.

Mirrors the reference's two CLIs with the same flag names where they exist:

  - ``grasp-compress`` (reference grasp.py:155-244): full compression pipeline
    with optional recovery training and evaluation;
  - ``grasp-evaluate`` (reference evaluate.py:7-66): evaluate a saved
    checkpoint (PPL / zero-shot / LongBench).

Model sources (no network in typical TPU pods; never downloads):
  - a local HF checkpoint directory (config.json + safetensors/bin), or
  - a named architecture preset (``tiny``, ``tinyllama-1.1b``, ``llama2-7b``,
    ``llama3-8b``, ``llama3.1-8b``, ``mistral-7b``, ``qwen2-7b``,
    ``mixtral-8x7b``, ``gemma-2b``, ``gemma-7b``, ``gemma2-9b``) with random init — for
    benchmarking and smoke runs.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys
from typing import Optional

import numpy as np

logger = logging.getLogger("grasp_tpu")


def _force_platform() -> None:
    """Honor $JAX_PLATFORMS in CLI subprocesses.

    The axon TPU plugin's sitecustomize pins ``jax_platforms`` at interpreter
    start, so the env var alone is IGNORED (CLAUDE.md gotcha #1; the only
    working recipe is ``jax.config.update`` after import — tests/conftest.py
    does the same). Without this, a smoke run that asked for CPU goes
    through the remote-compile tunnel and times out."""
    want = os.environ.get("JAX_PLATFORMS", "").strip()
    if want:
        import jax

        jax.config.update("jax_platforms", want)


def setup_logger(log_file: Optional[str] = None) -> None:
    logger.setLevel(logging.INFO)
    logger.handlers.clear()
    handler = logging.FileHandler(log_file) if log_file else logging.StreamHandler()
    handler.setFormatter(logging.Formatter("%(asctime)s - %(name)s - %(levelname)s - %(message)s"))
    logger.addHandler(handler)


_PRESETS = {
    "tiny": "tiny",
    "tinyllama-1.1b": "tinyllama_1_1b",
    "llama2-7b": "llama2_7b",
    "llama3-8b": "llama3_8b",
    "llama3.1-8b": "llama3_1_8b",
    "mistral-7b": "mistral_7b",
    "qwen2-7b": "qwen2_7b",
    "phi3-mini-4k": "phi3_mini_4k",
    "mixtral-8x7b": "mixtral_8x7b",
    "gemma-2b": "gemma_2b",
    "gemma-7b": "gemma_7b",
    "gemma2-9b": "gemma2_9b",
}


def load_model(name_or_path: str, dtype: str = "float32"):
    """(config, params, tokenizer) from a local HF dir or a named preset."""
    import dataclasses

    import jax

    from grasp_tpu.configs import ModelConfig
    from grasp_tpu.data.tokenizer import load_tokenizer
    from grasp_tpu.models.llama import init_params

    if os.path.isdir(name_or_path):
        from grasp_tpu.models.hf_io import load_hf_checkpoint

        config, params = load_hf_checkpoint(name_or_path, dtype=np.dtype(dtype))
        import jax.numpy as jnp

        params = jax.tree.map(jnp.asarray, params)
        tokenizer = load_tokenizer(name_or_path)
        return dataclasses.replace(config, dtype=dtype), params, tokenizer

    key = name_or_path.lower()
    if key in _PRESETS:
        # the tiny preset pairs with the ByteTokenizer fallback (259 ids);
        # its default 256-vocab can't embed ids 256-258, which turned the
        # quality-smoke synthetic PPL into NaN (OOB embedding/label gather)
        config = (ModelConfig.tiny(vocab_size=260) if key == "tiny"
                  else getattr(ModelConfig, _PRESETS[key])())
        config = dataclasses.replace(config, dtype=dtype)
        params = init_params(jax.random.PRNGKey(0), config)
        logger.info("preset %s: RANDOM-INIT weights (no local checkpoint given)", key)
        return config, params, load_tokenizer(None)
    raise FileNotFoundError(
        f"{name_or_path!r} is neither a local checkpoint directory nor a preset "
        f"({sorted(_PRESETS)})"
    )


def _compress_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="GRASP Model Compression (TPU-native)")
    p.add_argument("--model_name_or_path", type=str, required=True)
    p.add_argument("--dataset_name", type=str, default="wikitext2",
                   help="wikitext2 | c4 | synthetic")
    p.add_argument("--layers_id", type=int, nargs="+", default=None)
    p.add_argument("--num_prune_layers", type=int, default=None)
    p.add_argument("--mlp_target_layer_types", type=str, nargs="+",
                   default=["down_proj", "up_proj", "gate_proj"])
    p.add_argument("--attn_target_layer_types", type=str, nargs="+",
                   default=["q_proj", "k_proj", "v_proj", "o_proj"])
    p.add_argument("--metric", type=str, choices=["gradient", "taylor"], default="taylor")
    p.add_argument("--compression_ratio", type=float, default=None)
    p.add_argument("--threshold_ratio", type=float, default=None)
    p.add_argument("--save_path", type=str, default=None)
    p.add_argument("--angular", action="store_true")
    p.add_argument("--merge", action="store_true")
    p.add_argument("--verbose", action="store_true")
    p.add_argument("--num_samples", type=int, default=1024)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--seq_len", type=int, default=512)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--log_file", type=str, default=None)
    p.add_argument("--dtype", type=str, default="float32", choices=["float32", "bfloat16"])
    p.add_argument("--data_root", type=str, default=".")
    # TPU-native knobs (no reference counterpart)
    p.add_argument("--sweep", type=str, choices=["sequential", "parallel"], default="sequential")
    p.add_argument("--grad_mode", type=str, choices=["dense", "svd"], default="dense")
    p.add_argument("--remat", action="store_true")
    p.add_argument("--svd_method", type=str, choices=["auto", "host", "device", "gram"],
                   default="auto", help="SVD backend: host LAPACK (parity-exact), on-device XLA, or gram (MXU matmuls + small host eigh)")
    p.add_argument("--dp", type=int, default=1,
                   help="data-parallel mesh axis: calibration/recovery batches shard over it")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel mesh axis: Megatron-style sharding of dense projections")
    p.add_argument("--export_hf_dir", type=str, default=None,
                   help="also export the compressed model as an HF checkpoint "
                        "directory (config.json + model.safetensors) with "
                        "low-rank projections re-materialized dense — "
                        "loadable by transformers.AutoModelForCausalLM "
                        "(models.hf_io.save_hf_checkpoint)")
    p.add_argument("--compress_resume_dir", type=str, default=None,
                   help="crash-resume directory for the compression run: the engine "
                        "checkpoints after BI and every (layer, block) round; rerunning "
                        "with the same dir continues at the first unfinished round")
    # recovery
    p.add_argument("--recovery", action="store_true")
    p.add_argument("--data_path", type=str, default="yahma/alpaca-cleaned")
    p.add_argument("--train_batch_size", type=int, default=32)
    p.add_argument("--micro_batch_size", type=int, default=4)
    p.add_argument("--num_epochs", type=int, default=1)
    p.add_argument("--learning_rate", type=float, default=3e-4)
    p.add_argument("--max_length", type=int, default=256)
    p.add_argument("--val_set_size", type=int, default=2000)
    p.add_argument("--train_on_inputs", action="store_true")
    p.add_argument("--add_eos_token", action="store_true")
    p.add_argument("--prompt_template_name", type=str, default="alpaca")
    p.add_argument("--resume_from_checkpoint", type=str, default=None,
                   help="trainer output dir (or a step_N dir inside one) to resume from")
    p.add_argument("--eval_every", type=int, default=200,
                   help="eval + save cadence in optimizer steps (reference alpaca_grasp.py:184-186)")
    p.add_argument("--save_total_limit", type=int, default=3)
    # evaluation
    p.add_argument("--evaluate", action="store_true")
    p.add_argument("--eval_ppl", type=str, default="")
    p.add_argument("--eval_tasks", type=str, default="")
    p.add_argument("--task_specs", type=str, default=None,
                   help="JSON file of declarative task specs (eval/task_spec.py) "
                        "registered before evaluation — arbitrary lm-eval-0.3.0-"
                        "style tasks as data, matching the reference's open task "
                        "surface (evaluate_grasp.py:222-229)")
    p.add_argument("--num_fewshot", type=int, default=0)
    p.add_argument("--limit", type=int, default=-1)
    p.add_argument("--results_json", type=str, default=None,
                   help="write the evaluation results dict to this JSON file "
                        "(scripts/run_quality.sh table assembly)")
    return p


def compress_main(argv=None) -> int:
    args = _compress_parser().parse_args(argv)
    setup_logger(args.log_file)
    _force_platform()
    from grasp_tpu import enable_compilation_cache

    enable_compilation_cache()  # $GRASP_COMPILE_CACHE opt-in

    from grasp_tpu.configs import GraspConfig
    from grasp_tpu.core.engine import GraspEngine
    from grasp_tpu.data.loader import get_calibration_batches

    config, params, tokenizer = load_model(args.model_name_or_path, args.dtype)

    batches = get_calibration_batches(
        args.dataset_name, tokenizer,
        num_samples=args.num_samples, seq_len=args.seq_len,
        batch_size=args.batch_size, seed=args.seed, data_root=args.data_root,
    )
    logger.info("=======> Done Loading Data! (%d batches)", len(batches))

    cfg = GraspConfig(
        model_name_or_path=args.model_name_or_path,
        layers_id=args.layers_id,
        num_prune_layers=args.num_prune_layers,
        mlp_target_layer_types=tuple(args.mlp_target_layer_types),
        attn_target_layer_types=tuple(args.attn_target_layer_types),
        metric=args.metric,
        compression_ratio=args.compression_ratio,
        threshold_ratio=args.threshold_ratio,
        angular=args.angular,
        merge=args.merge,
        verbose=args.verbose,
        sweep=args.sweep,
        grad_mode=args.grad_mode,
    )
    mesh = None
    if args.dp * args.tp > 1:
        from grasp_tpu.parallel import make_mesh

        mesh = make_mesh((args.dp, args.tp))
        logger.info("mesh: data=%d model=%d", args.dp, args.tp)
    engine = GraspEngine(params, config, remat=args.remat, svd_method=args.svd_method, mesh=mesh)
    summary = engine.run(batches, cfg, resume_dir=args.compress_resume_dir)
    logger.info("summary: %s", json.dumps(summary))

    save_path = args.save_path
    if not save_path:
        os.makedirs("./checkpoint", exist_ok=True)
        save_path = os.path.join("./checkpoint", args.model_name_or_path.replace("/", "-"))
    from grasp_tpu.checkpoints import save_checkpoint

    save_checkpoint(
        save_path, engine.params, config, engine.plan,
        rank_dict=engine.rank_dict, redundant_layers=engine.redundant_layers,
        layer_importances=engine.layer_importances,
        extra={"grasp_config": {k: v for k, v in vars(args).items() if not callable(v)}},
    )
    logger.info("checkpoint saved to %s", save_path)

    if args.export_hf_dir:
        from grasp_tpu.models.hf_io import save_hf_checkpoint

        save_hf_checkpoint(engine.params, config, args.export_hf_dir, merge=True)
        logger.info("HF export written to %s", args.export_hf_dir)

    if args.recovery:
        from grasp_tpu.data.prompter import Prompter, collate_padded, tokenize_alpaca_example
        from grasp_tpu.train.recover import recovery_train

        prompter = Prompter(args.prompt_template_name)
        if args.data_path.endswith((".json", ".jsonl")):
            import json as _json

            with open(args.data_path) as f:
                rows = _json.load(f) if args.data_path.endswith(".json") else [
                    _json.loads(l) for l in f
                ]
        elif os.path.isdir(args.data_path):
            from datasets import load_from_disk

            rows = list(load_from_disk(args.data_path))
        else:
            raise FileNotFoundError(
                f"recovery data {args.data_path!r} not found locally (no network)"
            )
        examples = [
            tokenize_alpaca_example(r, tokenizer, prompter, max_length=args.max_length,
                                    train_on_inputs=args.train_on_inputs,
                                    add_eos_token=args.add_eos_token)
            for r in rows
        ]
        rng = np.random.default_rng(42)
        order = rng.permutation(len(examples))
        val_n = min(args.val_set_size, len(examples) // 5)
        val_idx, train_idx = order[:val_n], order[val_n:]
        mb = args.micro_batch_size
        train_batches = [
            collate_padded([examples[i] for i in train_idx[s : s + mb]],
                           pad_token_id=0)
            for s in range(0, len(train_idx) - mb + 1, mb)
        ]
        val_batches = [
            collate_padded([examples[i] for i in val_idx[s : s + mb]], pad_token_id=0)
            for s in range(0, len(val_idx) - mb + 1, mb)
        ] or None
        new_params, history = recovery_train(
            engine.params, config, engine.plan, engine.redundant_layers,
            train_batches, val_batches,
            num_epochs=args.num_epochs, learning_rate=args.learning_rate,
            accum_steps=max(args.train_batch_size // args.micro_batch_size, 1),
            remat=args.remat,
            mesh=mesh,
            eval_every=args.eval_every,
            output_dir=save_path + "_trainer",
            save_total_limit=args.save_total_limit,
            resume_from_checkpoint=args.resume_from_checkpoint,
        )
        engine.params = new_params
        save_checkpoint(
            save_path + "_recovered", engine.params, config, engine.plan,
            rank_dict=engine.rank_dict, redundant_layers=engine.redundant_layers,
            layer_importances=engine.layer_importances,
            extra={"recovery_history": history},
        )
        logger.info("recovered checkpoint saved to %s_recovered", save_path)

    if args.evaluate:
        _run_evaluation(engine.params, config, engine.plan, tokenizer, args)
    return 0


def _run_evaluation(params, config, plan, tokenizer, args) -> dict:
    results = {}
    if args.eval_ppl:
        from grasp_tpu.data.loader import get_evaluation_corpus
        from grasp_tpu.eval.ppl import windowed_perplexity

        for ds in args.eval_ppl.split(","):
            corpus = get_evaluation_corpus(ds.strip(), tokenizer, data_root=getattr(args, "data_root", "."))
            results[ds] = windowed_perplexity(params, config, corpus, plan=plan, limit=args.limit)
            logger.info("%s ppl: %s", ds, results[ds])
    if getattr(args, "task_specs", None):
        from grasp_tpu.eval.task_spec import load_task_specs

        registered = load_task_specs(args.task_specs)
        logger.info("registered task specs: %s", registered)
    tasks = (args.eval_tasks or "").strip()
    if tasks in ("longbench", "small_longbench"):
        from grasp_tpu.eval.longbench import (
            FULL_LONGBENCH_DATASETS,
            SMALL_LONGBENCH_DATASETS,
            eval_longbench,
        )

        ds = FULL_LONGBENCH_DATASETS if tasks == "longbench" else SMALL_LONGBENCH_DATASETS
        results.update(
            eval_longbench(params, config, tokenizer, args.model_name_or_path, ds, plan=plan,
                           data_root=getattr(args, "data_root", "."))
        )
    elif tasks:
        from grasp_tpu.eval.harness import EvalLM, evaluate_tasks

        lm = EvalLM(params, config, tokenizer, plan=plan)
        results.update(
            evaluate_tasks(lm, [t.strip() for t in tasks.split(",")],
                           num_fewshot=args.num_fewshot,
                           limit=None if args.limit == -1 else args.limit,
                           data_root=getattr(args, "data_root", "."))
        )
    logger.info("results: %s", json.dumps(results))
    if getattr(args, "results_json", None):
        os.makedirs(os.path.dirname(os.path.abspath(args.results_json)),
                    exist_ok=True)
        with open(args.results_json, "w") as f:
            json.dump(results, f, indent=1)
    return results


def evaluate_main(argv=None) -> int:
    p = argparse.ArgumentParser(description="GRASP checkpoint evaluation (TPU-native)")
    p.add_argument("--model_path", type=str, required=True,
                   help="grasp_tpu checkpoint dir (or HF dir / preset for dense baselines)")
    p.add_argument("--tokenizer_path", type=str, default=None)
    p.add_argument("--model_name", type=str, default=None)
    p.add_argument("--eval_ppl", type=str, default="wikitext2,ptb,c4")
    p.add_argument("--eval_tasks", type=str, default="")
    p.add_argument("--task_specs", type=str, default=None,
                   help="JSON file of declarative task specs (eval/task_spec.py)")
    p.add_argument("--num_fewshot", type=int, default=0)
    p.add_argument("--limit", type=int, default=-1)
    p.add_argument("--data_root", type=str, default=".")
    p.add_argument("--log_file", type=str, default=None)
    p.add_argument("--results_json", type=str, default=None,
                   help="write the evaluation results dict to this JSON file")
    args = p.parse_args(argv)
    setup_logger(args.log_file)
    _force_platform()
    from grasp_tpu import enable_compilation_cache

    enable_compilation_cache()  # $GRASP_COMPILE_CACHE opt-in

    from grasp_tpu.data.tokenizer import load_tokenizer

    meta_path = os.path.join(args.model_path, "grasp_meta.json")
    if os.path.exists(meta_path):
        import jax
        import jax.numpy as jnp

        from grasp_tpu.checkpoints import load_checkpoint

        params, config, plan, meta = load_checkpoint(args.model_path)
        params = jax.tree.map(jnp.asarray, params)
        tokenizer = load_tokenizer(args.tokenizer_path)
    else:
        config, params, tokenizer = load_model(args.model_path)
        from grasp_tpu.models.llama import default_plan

        plan = default_plan(config)
        if args.tokenizer_path:
            tokenizer = load_tokenizer(args.tokenizer_path)

    args.model_name_or_path = args.model_name or args.model_path
    _run_evaluation(params, config, plan, tokenizer, args)
    return 0


def serve_main(argv=None) -> int:
    """``grasp-serve``: OpenAI-style HTTP completions over the paged engine.

    Serves a grasp_tpu checkpoint (compressed or dense), a local HF dir, or a
    random-init preset through :func:`grasp_tpu.serving.server.serve` —
    continuous batching, optional int8/int4 weights, int8 KV pages, and
    speculative decoding with an int8 self-draft (beyond-reference; the
    reference has no serving surface at all — its only generation path is the
    offline loop in tools/eval_longbench.py:337-353).
    """
    p = argparse.ArgumentParser(description="GRASP serving (TPU-native)")
    p.add_argument("--model_path", type=str, required=True,
                   help="grasp_tpu checkpoint dir, local HF dir, or preset name")
    p.add_argument("--tokenizer_path", type=str, default=None)
    p.add_argument("--model_name", type=str, default=None,
                   help="model id reported by /v1/models (default: model_path)")
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--dtype", type=str, default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--quantize", type=str, default="none",
                   choices=["none", "int8", "int4"],
                   help="weight quantization for the serving copy")
    p.add_argument("--quantized_kv", action="store_true",
                   help="int8 KV pages (half the decode KV traffic)")
    p.add_argument("--prefix_cache", action="store_true",
                   help="share KV pages across requests with matching prompt "
                        "prefixes (skips the shared prefix's prefill in both "
                        "the target and any speculative draft; bit-identical "
                        "outputs)")
    p.add_argument("--prefill_chunk", type=int, default=None,
                   help="admit prompts this many tokens per engine step "
                        "(multiple of --page_size) so long prompts don't "
                        "stall the running batch; not with --speculative")
    p.add_argument("--stop_token_ids", type=str, default=None,
                   help="comma-separated extra stop token ids beyond the "
                        "tokenizer's eos (e.g. LLaMA-3's <|eot_id|>)")
    p.add_argument("--warmup", type=str, nargs="?", const="128,512,1024",
                   default=None,
                   help="pre-compile serving jits at startup for these "
                        "comma-separated prompt-length buckets (bare flag = "
                        "128,512,1024) — first requests skip the compile")
    p.add_argument("--max_batch", type=int, default=8)
    p.add_argument("--num_pages", type=int, default=256)
    p.add_argument("--page_size", type=int, default=128)
    p.add_argument("--max_pages_per_seq", type=int, default=16)
    p.add_argument("--chat_template", type=str, default=None,
                   choices=[None, "llama2", "chatml", "phi3", "gemma",
                            "generic"],
                   help="chat rendering for /v1/chat/completions (default: the "
                        "tokenizer's own template, else generic)")
    p.add_argument("--speculative", type=str, default="none", choices=["none", "int8"],
                   help="int8: self-draft speculation (int8-quantized copy drafts, "
                        "the served weights verify; outputs identical)")
    p.add_argument("--gamma", type=int, default=4, help="speculation draft length")
    p.add_argument("--log_file", type=str, default=None)
    args = p.parse_args(argv)
    setup_logger(args.log_file)
    _force_platform()
    from grasp_tpu import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from grasp_tpu.data.tokenizer import load_tokenizer

    meta_path = os.path.join(args.model_path, "grasp_meta.json")
    if os.path.exists(meta_path):
        from grasp_tpu.checkpoints import load_checkpoint

        params, config, plan, _meta = load_checkpoint(args.model_path)
        params = jax.tree.map(jnp.asarray, params)
        tokenizer = load_tokenizer(args.tokenizer_path)
    else:
        config, params, tokenizer = load_model(args.model_path, dtype=args.dtype)
        from grasp_tpu.models.llama import default_plan

        plan = default_plan(config)
        if args.tokenizer_path:
            tokenizer = load_tokenizer(args.tokenizer_path)

    serve_params = params
    if args.quantize != "none":
        from grasp_tpu.ops.quant import quantize_model_weights

        serve_params = quantize_model_weights(params, bits=8 if args.quantize == "int8" else 4)

    eos = getattr(tokenizer, "eos_token_id", None)
    if args.stop_token_ids:
        extra = [int(t) for t in args.stop_token_ids.split(",") if t.strip()]
        eos = ([int(eos)] if eos is not None else []) + extra
    kw = dict(num_pages=args.num_pages, page_size=args.page_size,
              max_batch=args.max_batch, max_pages_per_seq=args.max_pages_per_seq,
              eos_token_id=eos, quantized_kv=args.quantized_kv)
    if args.speculative == "int8":
        if args.prefill_chunk:
            p.error("--prefill_chunk is not supported with --speculative")
        from grasp_tpu.ops.quant import quantize_model_weights
        from grasp_tpu.serving.spec_paged import SpeculativeServingEngine

        draft = quantize_model_weights(params, bits=8)
        engine = SpeculativeServingEngine(serve_params, config, draft, config,
                                          plan=plan, draft_plan=plan,
                                          gamma=args.gamma,
                                          prefix_cache=args.prefix_cache, **kw)
    else:
        from grasp_tpu.serving.paged import ServingEngine

        engine = ServingEngine(serve_params, config, plan=plan,
                               prefix_cache=args.prefix_cache,
                               prefill_chunk=args.prefill_chunk,
                               tokenizer=tokenizer, **kw)

    if args.warmup:
        buckets = [int(t) for t in args.warmup.split(",") if t.strip()]
        logger = logging.getLogger("grasp_tpu")
        logger.info("warming up serving jits for prompt buckets %s ...", buckets)
        logger.info("warmup done in %.1f s", engine.warmup(buckets))

    from grasp_tpu.serving.server import serve

    serve(engine, host=args.host, port=args.port, tokenizer=tokenizer,
          model_id=args.model_name or args.model_path,
          chat_template=args.chat_template)
    return 0


if __name__ == "__main__":
    sys.exit(compress_main())
