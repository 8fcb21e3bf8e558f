"""Calibration / evaluation data pipelines.

Re-implements the reference's loaders (dataset/loader.py:10-223) with the same
semantics, returning numpy batch dicts instead of torch DataLoaders:

  - whole-corpus tokenize, join with "\\n\\n", chunk into seq_len blocks
    (loader.py:59-68);
  - the **pre-shift quirk**: input_ids = chunk[:-1], labels = chunk[1:]
    (loader.py:33-36) even though the loss shifts again — replicated
    deliberately, see models.llama.hf_causal_lm_loss;
  - num_samples rows drawn with random.seed(seed); random.sample — identical
    sampling stream to the reference (loader.py:20, 82);
  - datasets load from local disk (``datasets/<name>/<split>``, same layout the
    reference expects at loader.py:81, 94) — this environment has no network;
  - a deterministic synthetic corpus ("synthetic") for tests/benchmarks.
"""

from __future__ import annotations

import os
import random
from typing import Any, Dict, Iterator, List, Optional

import numpy as np

Batch = Dict[str, np.ndarray]

_DATASET_DIRS = {
    "wikitext2": ("datasets/wikitext/{split}", "text"),
    "c4": ("datasets/c4/{split}", "text"),
    "ptb": ("datasets/ptb/{split}", "sentence"),
}


def _load_rows(dataset_name: str, split: str, data_root: str = ".") -> tuple:
    """(rows, field) from a local HF datasets directory."""
    for key, (tmpl, field) in _DATASET_DIRS.items():
        if key in dataset_name:
            path = os.path.join(data_root, tmpl.format(split=split))
            if not os.path.isdir(path):
                raise FileNotFoundError(
                    f"dataset {dataset_name!r} expected at {path} (local disk; "
                    "this environment has no network — use dataset_name='synthetic' "
                    "or materialize the dataset there)"
                )
            from datasets import load_from_disk

            return load_from_disk(path), field
    raise NotImplementedError(f"dataset {dataset_name!r} not supported")


def _synthetic_corpus_ids(tokenizer, num_tokens: int, seed: int = 0) -> np.ndarray:
    """Deterministic pseudo-corpus over the tokenizer's vocab."""
    rng = np.random.default_rng(seed)
    vocab = getattr(tokenizer, "vocab_size", 32000)
    return rng.integers(0, vocab, size=(num_tokens,), dtype=np.int64)


def chunk_corpus(token_ids: np.ndarray, seq_len: int) -> np.ndarray:
    """Split a 1-D token stream into [n, seq_len] blocks (reference loader.py:62-67)."""
    n = len(token_ids) // seq_len
    return np.asarray(token_ids[: n * seq_len]).reshape(n, seq_len)


def get_calibration_batches(
    dataset_name: str,
    tokenizer,
    num_samples: int = 128,
    seq_len: int = 2048,
    batch_size: int = 1,
    seed: int = 42,
    data_root: str = ".",
    shuffle: bool = True,
) -> List[Batch]:
    """Calibration batches with the reference's exact pipeline semantics.

    Returns a list of {"input_ids": [B, seq_len-1], "labels": [B, seq_len-1]}
    (pre-shifted; no attention_mask — the chunked corpus has no padding,
    matching the reference's wikitext2/c4 path where the collator is None).
    """
    random.seed(seed)

    if dataset_name == "synthetic":
        stream = _synthetic_corpus_ids(tokenizer, num_samples * (seq_len + 8), seed)
    else:
        rows, field = _load_rows(dataset_name, "train", data_root)
        idx = random.sample(range(len(rows)), num_samples)
        rows = rows.select(idx)
        text = "\n\n".join(rows[field])
        enc = tokenizer(text, return_tensors=None, add_special_tokens=True)
        stream = np.asarray(enc["input_ids"], dtype=np.int64)
        if stream.ndim > 1:
            stream = stream[0]

    chunks = chunk_corpus(stream, seq_len)
    if shuffle:
        order = np.random.default_rng(seed).permutation(len(chunks))
        chunks = chunks[order]

    batches: List[Batch] = []
    for i in range(0, len(chunks) - batch_size + 1, batch_size):
        block = chunks[i : i + batch_size]
        batches.append({"input_ids": block[:, :-1].copy(), "labels": block[:, 1:].copy()})
    return batches


def get_test_batches(
    dataset_name: str,
    tokenizer,
    seq_len: int = 2048,
    batch_size: int = 4,
    data_root: str = ".",
    synthetic_tokens: int = 65536,
) -> List[np.ndarray]:
    """Chunked eval rows for throughput testing (reference get_test_data,
    loader.py:183-223): [batch, seq_len] blocks of the test corpus, unshuffled."""
    ids = get_evaluation_corpus(dataset_name, tokenizer, data_root=data_root,
                                synthetic_tokens=synthetic_tokens)
    chunks = chunk_corpus(ids, seq_len)
    return [chunks[i : i + batch_size] for i in range(0, len(chunks) - batch_size + 1, batch_size)]


def calibration_batches_from_token_file(
    token_file: str,
    seq_len: int = 2048,
    batch_size: int = 1,
    seed: int = 42,
    shuffle: bool = True,
):
    """Stream pre-shifted calibration batches from a binary token file via the
    native (C++) tokenstore pipeline (mmap + background prefetch); returns a
    re-iterable BatchServer. Tokenize once with
    grasp_tpu.native.write_token_file, then reuse across runs."""
    from grasp_tpu.native import BatchServer, TokenStore

    store = TokenStore(token_file)
    return BatchServer(store, seq_len, batch_size, seed=seed, shuffle=shuffle)


def get_mix_calibration_batches(
    dataset_names: List[str],
    tokenizer,
    num_samples: int = 128,
    dataset_proportion: Optional[List[float]] = None,
    seq_len: int = 2048,
    batch_size: int = 1,
    seed: int = 42,
    data_root: str = ".",
) -> List[Batch]:
    """Mixture of calibration corpora (reference get_mix_calibration_dataloader,
    loader.py:110-148 — whose task-dataset branch raises NotImplementedError;
    only pretrain corpora are mixable, same as the reference in practice)."""
    if not dataset_proportion:
        dataset_proportion = [1.0 / len(dataset_names)] * len(dataset_names)
    batches: List[Batch] = []
    for name, prop in zip(dataset_names, dataset_proportion):
        batches.extend(
            get_calibration_batches(
                name, tokenizer,
                num_samples=int(num_samples * prop), seq_len=seq_len,
                batch_size=batch_size, seed=seed, data_root=data_root, shuffle=False,
            )
        )
    order = np.random.default_rng(seed).permutation(len(batches))
    return [batches[i] for i in order]


def get_evaluation_corpus(
    dataset_name: str,
    tokenizer,
    data_root: str = ".",
    split: Optional[str] = None,
    synthetic_tokens: int = 16384,
) -> np.ndarray:
    """Full tokenized eval corpus as a 1-D id array.

    Reference get_evaluation_dataloader (loader.py:151-181): wikitext2 test,
    ptb validation, c4 validation — whole corpus joined with "\\n\\n" then
    tokenized once.
    """
    if dataset_name == "synthetic":
        return _synthetic_corpus_ids(tokenizer, synthetic_tokens, seed=1)
    default_split = {"wikitext2": "test", "ptb": "validation", "c4": "validation"}
    for key, sp in default_split.items():
        if key in dataset_name:
            rows, field = _load_rows(dataset_name, split or sp, data_root)
            text = "\n\n".join(rows[field])
            enc = tokenizer(text, return_tensors=None, add_special_tokens=True)
            ids = np.asarray(enc["input_ids"], dtype=np.int64)
            return ids[0] if ids.ndim > 1 else ids
    raise NotImplementedError(f"dataset {dataset_name!r} not supported")
