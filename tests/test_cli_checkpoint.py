"""CLI + checkpoint round-trip tests (tiny model, synthetic data)."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from grasp_tpu.checkpoints import load_checkpoint, save_checkpoint
from grasp_tpu.cli import compress_main, evaluate_main
from grasp_tpu.configs import GraspConfig, ModelConfig
from grasp_tpu.core.engine import GraspEngine
from grasp_tpu.models.llama import forward, init_params


def test_checkpoint_roundtrip(tmp_path, rng):
    config = ModelConfig.tiny(num_hidden_layers=3)
    params = init_params(jax.random.PRNGKey(0), config)
    engine = GraspEngine(params, config)
    batches = [
        {
            "input_ids": jnp.asarray(rng.integers(0, config.vocab_size, (2, 16))),
            "labels": jnp.asarray(rng.integers(0, config.vocab_size, (2, 16))),
        }
    ]
    engine.run(batches, GraspConfig(num_prune_layers=1, compression_ratio=0.4))

    path = str(tmp_path / "ckpt")
    save_checkpoint(path, engine.params, config, engine.plan,
                    rank_dict=engine.rank_dict, redundant_layers=engine.redundant_layers,
                    layer_importances=engine.layer_importances)

    params2, config2, plan2, meta = load_checkpoint(path)
    assert config2 == config
    assert plan2 == engine.plan
    assert meta["rank_dict"] == {k: int(v) for k, v in engine.rank_dict.items()}
    assert meta["redundant_layers"] == engine.redundant_layers

    ids = jnp.asarray(rng.integers(0, config.vocab_size, (1, 8)))
    a = np.asarray(forward(engine.params, ids, config=config, plan=engine.plan)["logits"])
    params2 = jax.tree.map(jnp.asarray, params2)
    b = np.asarray(forward(params2, ids, config=config2, plan=plan2)["logits"])
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)


def test_cli_compress_and_evaluate(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    save = str(tmp_path / "out_ckpt")
    rc = compress_main([
        "--model_name_or_path", "tiny",
        "--dataset_name", "synthetic",
        "--num_prune_layers", "1",
        "--compression_ratio", "0.4",
        "--num_samples", "4",
        "--seq_len", "32",
        "--batch_size", "2",
        "--save_path", save,
        "--export_hf_dir", str(tmp_path / "hf_export"),
    ])
    assert rc == 0
    assert os.path.exists(os.path.join(save, "grasp_meta.json"))
    meta = json.load(open(os.path.join(save, "grasp_meta.json")))
    assert meta["rank_dict"]
    # --export_hf_dir writes a merged transformers-loadable checkpoint
    assert os.path.exists(tmp_path / "hf_export" / "model.safetensors")
    assert json.load(open(tmp_path / "hf_export" / "config.json"))["architectures"]

    rc = evaluate_main(["--model_path", save, "--eval_ppl", "synthetic"])
    assert rc == 0

    # evaluate the checkpoint's forward path via windowed ppl on synthetic ids
    from grasp_tpu.checkpoints import load_checkpoint
    from grasp_tpu.eval.ppl import windowed_perplexity

    params, config, plan, _ = load_checkpoint(save)
    params = jax.tree.map(jnp.asarray, params)
    corpus = np.random.default_rng(0).integers(0, config.vocab_size, size=(512,))
    ppl = windowed_perplexity(params, config, corpus, plan=plan, seqlen=64)
    assert np.isfinite(ppl) and ppl > 0


def test_cli_unknown_model_errors():
    with pytest.raises(FileNotFoundError, match="preset"):
        compress_main(["--model_name_or_path", "no-such-model", "--dataset_name", "synthetic",
                       "--num_prune_layers", "1", "--compression_ratio", "0.4"])


def test_cli_recovery_smoke(tmp_path, monkeypatch):
    """Full pipeline incl. recovery training on a tiny local alpaca-style json."""
    monkeypatch.chdir(tmp_path)
    data = [
        {"instruction": f"Repeat the word w{i}", "input": "", "output": f"w{i}"}
        for i in range(8)
    ]
    data_path = tmp_path / "alpaca.json"
    data_path.write_text(json.dumps(data))
    save = str(tmp_path / "ck")
    rc = compress_main([
        "--model_name_or_path", "tiny",
        "--dataset_name", "synthetic",
        "--num_prune_layers", "1",
        "--compression_ratio", "0.4",
        "--num_samples", "4",
        "--seq_len", "32",
        "--batch_size", "2",
        "--save_path", save,
        "--recovery",
        "--data_path", str(data_path),
        "--train_batch_size", "4",
        "--micro_batch_size", "2",
        "--val_set_size", "0",
        "--max_length", "96",
    ])
    assert rc == 0
    assert os.path.exists(os.path.join(save + "_recovered", "grasp_meta.json"))
