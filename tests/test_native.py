"""Native C++ tokenstore pipeline tests (builds the .so on first use)."""

import numpy as np
import pytest

from grasp_tpu.native import BatchServer, TokenStore, native_available, write_token_file


@pytest.fixture(scope="module")
def token_file(tmp_path_factory, rng):
    path = str(tmp_path_factory.mktemp("ts") / "corpus.tokens")
    tokens = rng.integers(0, 32000, size=(10_000,)).astype(np.int32)
    write_token_file(path, tokens)
    return path, tokens


def test_native_builds():
    assert native_available(), "g++ is in this image; the native lib should build"


def test_tokenstore_mmap(token_file):
    path, tokens = token_file
    with TokenStore(path) as ts:
        assert len(ts) == len(tokens)


def test_batch_server_preshift_semantics(token_file):
    path, tokens = token_file
    seq_len, batch = 64, 4
    with TokenStore(path) as ts:
        server = BatchServer(ts, seq_len, batch, shuffle=False)
        batches = list(server)
    assert len(batches) == len(server) == (len(tokens) // seq_len) // batch
    b0 = batches[0]
    assert b0["input_ids"].shape == (batch, seq_len - 1)
    # unshuffled: rows are consecutive chunks, pre-shifted
    for j in range(batch):
        chunk = tokens[j * seq_len : (j + 1) * seq_len]
        np.testing.assert_array_equal(b0["input_ids"][j], chunk[:-1])
        np.testing.assert_array_equal(b0["labels"][j], chunk[1:])


def test_batch_server_shuffled_covers_all_chunks(token_file):
    path, tokens = token_file
    seq_len, batch = 64, 2
    with TokenStore(path) as ts:
        rows = [r for b in BatchServer(ts, seq_len, batch, seed=7) for r in b["input_ids"]]
    # every served row must be a chunk prefix from the corpus
    chunk_starts = {tuple(tokens[i * seq_len : i * seq_len + 8].tolist())
                    for i in range(len(tokens) // seq_len)}
    seen = {tuple(r[:8].tolist()) for r in rows}
    assert seen <= chunk_starts
    # shuffled order differs from sequential with overwhelming probability
    first_chunk = tuple(tokens[:8].tolist())
    assert tuple(rows[0][:8].tolist()) != first_chunk or len(rows) == 1


def test_batch_server_determinism(token_file):
    path, _ = token_file
    with TokenStore(path) as ts:
        a = [b["input_ids"].copy() for b in BatchServer(ts, 32, 2, seed=3)]
        b = [b["input_ids"].copy() for b in BatchServer(ts, 32, 2, seed=3)]
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_too_small_corpus_raises(token_file, tmp_path):
    path = str(tmp_path / "tiny.tokens")
    write_token_file(path, np.arange(10, dtype=np.int32))
    with TokenStore(path) as ts:
        with pytest.raises(ValueError, match="not enough tokens"):
            BatchServer(ts, seq_len=64, batch_size=4)


def test_missing_file_raises(tmp_path):
    with pytest.raises((FileNotFoundError, OSError)):
        TokenStore(str(tmp_path / "nope.tokens"))
