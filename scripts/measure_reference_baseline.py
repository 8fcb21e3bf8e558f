"""One-time measurement of the torch reference pipeline's wall-clock on this
machine's CPU, for bench.py's vs_baseline denominator.

Runs the ACTUAL reference code (read-only at /root/reference) on the identical
config bench.py uses: TinyLlama-1.1B arch (random init), 2 redundant layers,
ratio 0.9, taylor, 4 calibration batches of 8 x 511 tokens. Writes
reference_baseline.json at the repo root.

Usage: python scripts/measure_reference_baseline.py [--scale N]
  --scale N: run only 1/N of the per-block sweeps and extrapolate (the torch
  CPU path is slow); recorded in the json for transparency.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/reference")

import numpy as np
import torch

torch.manual_seed(0)


class _ListLoader:
    def __init__(self, batches):
        self.batches = batches

    def __iter__(self):
        for b in self.batches:
            yield {k: torch.from_numpy(np.asarray(v)) for k, v in b.items()}

    def __len__(self):
        return len(self.batches)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=1)
    ap.add_argument("--layers", type=int, default=22)
    args = ap.parse_args()

    from transformers import LlamaConfig, LlamaForCausalLM

    import modeling_grasp as ref_mod

    cfg = LlamaConfig(
        vocab_size=32000, hidden_size=2048, intermediate_size=5632,
        num_hidden_layers=args.layers, num_attention_heads=32, num_key_value_heads=4,
        max_position_embeddings=2048, tie_word_embeddings=False,
    )
    model = LlamaForCausalLM(cfg).eval().float()

    rng = np.random.default_rng(0)
    seqs = rng.integers(0, cfg.vocab_size, size=(4, 8, 512))
    batches = [{"input_ids": s[:, :-1], "labels": s[:, 1:]} for s in seqs]
    loader = _ListLoader(batches)

    gm = ref_mod.GRASPModel(model=model)
    t0 = time.time()
    importances, layers_id = gm.compute_bi(
        num_prune_layers=2, calibration_dataloader=loader, angular=False, device="cpu"
    )
    bi_s = time.time() - t0
    print(f"BI: {bi_s:.1f}s, layers {layers_id}", flush=True)

    layers_id = sorted(layers_id, reverse=True)
    blocks = [
        (lid, bt, tg)
        for lid in layers_id
        for bt, tg in (
            ("mlp", ["down_proj", "up_proj", "gate_proj"]),
            ("attention", ["q_proj", "k_proj", "v_proj", "o_proj"]),
        )
    ]
    n_run = max(1, len(blocks) // args.scale)
    t1 = time.time()
    for lid, bt, tg in blocks[:n_run]:
        gm.compress_block(layer_id=lid, block_type=bt, target_layer_types=tg, device="cpu")
        grads = gm.get_svdlayer_gradients(loader, "cpu")
        idx = gm.dynamic_svd_selection(grads, metric="taylor", compression_ratio=0.9)
        gm.compile_grasp_model(idx, merge=False, device="cpu")
        print(f"block {lid}/{bt}: cumulative {time.time()-t1:.1f}s", flush=True)
    block_s = (time.time() - t1) * (len(blocks) / n_run)

    total = bi_s + block_s
    out = {
        "tinyllama_e2e_compress_wall_s": round(total, 1),
        "bi_s": round(bi_s, 1),
        "blocks_measured": n_run,
        "blocks_total": len(blocks),
        "extrapolation_scale": len(blocks) / n_run,
        "hardware": "cpu (torch, this machine)",
        "config": "TinyLlama-1.1B arch random init, 2 prune layers, ratio 0.9, taylor, 4x(8,511) calib",
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "reference_baseline.json")
    with open(os.path.abspath(path), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
