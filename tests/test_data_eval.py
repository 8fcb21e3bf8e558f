"""Data pipeline + eval stack tests, golden against the reference where its
modules are importable (prompter, longbench metrics) and against HF torch for
generation/PPL."""

import sys
import types

import numpy as np
import pytest
import torch

sys.path.insert(0, "/root/reference")

# the reference's eval_longbench imports fuzzywuzzy, absent here — stub it with
# the mathematically identical difflib formulation so the module imports; the
# code_sim test then compares structure, others are genuine golden tests.
if "fuzzywuzzy" not in sys.modules:
    import difflib

    _fw = types.ModuleType("fuzzywuzzy")

    class _Fuzz:
        @staticmethod
        def ratio(a, b):
            if not a and not b:
                return 100
            return round(100 * difflib.SequenceMatcher(None, a, b).ratio())

    _fw.fuzz = _Fuzz()
    sys.modules["fuzzywuzzy"] = _fw

import jax
import jax.numpy as jnp
from transformers import LlamaConfig, LlamaForCausalLM

from grasp_tpu.configs import ModelConfig
from grasp_tpu.data.loader import chunk_corpus, get_calibration_batches, get_evaluation_corpus
from grasp_tpu.data.prompter import Prompter, collate_padded, tokenize_alpaca_example
from grasp_tpu.data.tokenizer import ByteTokenizer
from grasp_tpu.eval.generate import Generator
from grasp_tpu.eval.harness import EvalLM, evaluate_tasks
from grasp_tpu.eval.ppl import windowed_perplexity
from grasp_tpu.models.hf_io import config_from_hf, params_from_state_dict
from grasp_tpu.models.llama import forward

torch.manual_seed(0)

HF_CFG = dict(
    vocab_size=300, hidden_size=64, intermediate_size=160, num_hidden_layers=2,
    num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=2048,
    tie_word_embeddings=False,
)


@pytest.fixture(scope="module")
def model_pair():
    hf_model = LlamaForCausalLM(LlamaConfig(**HF_CFG)).eval().float()
    config = config_from_hf(hf_model.config)
    params = jax.tree.map(jnp.asarray, params_from_state_dict(hf_model.state_dict(), config))
    return hf_model, config, params


# ---------------------------------------------------------------------------
# data
# ---------------------------------------------------------------------------


def test_prompter_matches_reference():
    import os

    cwd = os.getcwd()
    os.chdir("/root/reference")
    try:
        import prompter as ref_prompter

        ref = ref_prompter.Prompter("alpaca")
    finally:
        os.chdir(cwd)
    ours = Prompter("alpaca")
    ex = {"instruction": "Add numbers", "input": "2 and 3", "output": "5"}
    assert ours.generate_prompt(ex["instruction"], ex["input"], ex["output"]) == ref.generate_prompt(
        ex["instruction"], ex["input"], ex["output"]
    )
    assert ours.generate_prompt(ex["instruction"]) == ref.generate_prompt(ex["instruction"])
    out = "blah\n### Response:\nthe answer"
    assert ours.get_response(out) == ref.get_response(out)


def test_chunk_corpus_matches_reference_semantics():
    ids = np.arange(103)
    chunks = chunk_corpus(ids, 10)
    assert chunks.shape == (10, 10)
    np.testing.assert_array_equal(chunks[0], np.arange(10))
    np.testing.assert_array_equal(chunks[-1], np.arange(90, 100))


def test_calibration_batches_preshift():
    tok = ByteTokenizer()
    batches = get_calibration_batches("synthetic", tok, num_samples=4, seq_len=32, batch_size=2)
    assert batches, "no batches produced"
    b = batches[0]
    assert b["input_ids"].shape == (2, 31) and b["labels"].shape == (2, 31)
    # pre-shift quirk: labels[t] == input_ids[t+1]
    np.testing.assert_array_equal(b["labels"][:, :-1], b["input_ids"][:, 1:])


def test_missing_local_dataset_raises_helpfully():
    tok = ByteTokenizer()
    with pytest.raises(FileNotFoundError, match="no network"):
        get_calibration_batches("wikitext2", tok, num_samples=4, seq_len=32)
    with pytest.raises(NotImplementedError):
        get_calibration_batches("bogus_ds", tok, num_samples=4, seq_len=32)


def test_alpaca_tokenize_and_collate():
    tok = ByteTokenizer()
    prompter = Prompter("alpaca")
    ex = tokenize_alpaca_example(
        {"instruction": "Say hi", "input": "", "output": "hi"}, tok, prompter, max_length=512
    )
    assert ex["labels"] == ex["input_ids"]
    masked = tokenize_alpaca_example(
        {"instruction": "Say hi", "input": "", "output": "hi"}, tok, prompter,
        max_length=512, train_on_inputs=False,
    )
    n_masked = sum(1 for l in masked["labels"] if l == -100)
    assert 0 < n_masked < len(masked["labels"]), "prompt prefix should be masked, answer not"
    batch = collate_padded([ex, masked], pad_token_id=0)
    assert batch["input_ids"].shape[1] % 8 == 0
    assert (batch["labels"][batch["attention_mask"] == 0] == -100).all()


# ---------------------------------------------------------------------------
# perplexity
# ---------------------------------------------------------------------------


def test_windowed_ppl_matches_reference_procedure(model_pair, rng):
    hf_model, config, params = model_pair
    corpus = rng.integers(0, HF_CFG["vocab_size"], size=(1000,))
    seqlen = 128
    # reference evaluate_grasp.py:180-202 inline (lm-eval isn't importable)
    nlls = []
    with torch.no_grad():
        for i in range(len(corpus) // seqlen):
            batch = torch.from_numpy(corpus[i * seqlen : (i + 1) * seqlen])[None]
            out = hf_model.model(batch)
            logits = hf_model.lm_head(out[0])
            shift_logits = logits[:, :-1, :]
            shift_labels = batch[:, 1:]
            loss = torch.nn.functional.cross_entropy(
                shift_logits.reshape(-1, shift_logits.size(-1)), shift_labels.reshape(-1)
            )
            nlls.append(loss.float() * seqlen)
    ref_ppl = float(torch.exp(torch.stack(nlls).sum() / (len(nlls) * seqlen)))

    ours = windowed_perplexity(params, config, corpus, seqlen=seqlen)
    np.testing.assert_allclose(ours, ref_ppl, rtol=1e-3)


def test_ppl_limit_semantics(rng):
    """The reference's asymmetric limits survive the one-dispatch rewrite:
    windowed stops AFTER window i==limit (limit+1 windows), row-wise stops
    BEFORE row i==limit (limit rows)."""
    import jax

    from grasp_tpu.configs import ModelConfig
    from grasp_tpu.eval.ppl import evaluate_perplexity
    from grasp_tpu.models import init_params

    config = ModelConfig.tiny(num_hidden_layers=2)
    params = init_params(jax.random.PRNGKey(0), config)
    corpus = rng.integers(0, config.vocab_size, size=(64 * 5,))
    seqlen = 64

    full = windowed_perplexity(params, config, corpus, seqlen=seqlen)
    lim1 = windowed_perplexity(params, config, corpus, seqlen=seqlen, limit=1)
    two_windows = windowed_perplexity(params, config, corpus[: 2 * seqlen], seqlen=seqlen)
    np.testing.assert_allclose(lim1, two_windows, rtol=1e-6)
    assert lim1 != full

    rows = rng.integers(0, config.vocab_size, size=(4, 32))
    r_lim = evaluate_perplexity(params, config, rows, limit=2)
    r_two = evaluate_perplexity(params, config, rows[:2])
    np.testing.assert_allclose(r_lim, r_two, rtol=1e-6)


# ---------------------------------------------------------------------------
# generation
# ---------------------------------------------------------------------------


def test_greedy_generate_matches_hf(model_pair, rng):
    hf_model, config, params = model_pair
    prompt = rng.integers(0, HF_CFG["vocab_size"], size=(40,))
    with torch.no_grad():
        ref = hf_model.generate(
            torch.from_numpy(prompt)[None], max_new_tokens=12, do_sample=False, num_beams=1,
            eos_token_id=None, pad_token_id=0,
        )[0, 40:].numpy()
    gen = Generator(params, config)
    ours = np.asarray(gen.greedy(prompt, 12))
    np.testing.assert_array_equal(ours, ref)


def test_greedy_eos_stopping(model_pair, rng):
    hf_model, config, params = model_pair
    gen = Generator(params, config)
    # find a prompt whose generation has a token not present earlier (random
    # tiny models often repeat one token, which would make eos == token 0)
    for seed in range(20):
        prompt = np.random.default_rng(seed).integers(0, HF_CFG["vocab_size"], size=(16,))
        full = gen.greedy(prompt, 10)
        idx = next((i for i in range(1, len(full)) if full[i] not in full[:i]), None)
        if idx is not None:
            break
    else:
        pytest.skip("degenerate tiny model: generation repeats a single token")
    stopped = gen.greedy(prompt, 10, eos_token_id=full[idx])
    assert stopped == full[:idx]


def test_greedy_batch_matches_single(model_pair, rng):
    """Left-padded batched generation must equal per-prompt generation."""
    _, config, params = model_pair
    gen = Generator(params, config)
    prompts = [
        rng.integers(0, HF_CFG["vocab_size"], size=(n,)) for n in (9, 17, 25)
    ]
    batched = gen.greedy_batch(prompts, max_new_tokens=8)
    singles = [gen.greedy(p, 8) for p in prompts]
    for i, (bb, ss) in enumerate(zip(batched, singles)):
        assert bb == ss, f"row {i}: batched {bb} != single {ss}"


def test_greedy_batch_eos_per_row(model_pair, rng):
    _, config, params = model_pair
    gen = Generator(params, config)
    prompts = [rng.integers(0, HF_CFG["vocab_size"], size=(n,)) for n in (11, 19)]
    singles = [gen.greedy(p, 8) for p in prompts]
    # pick an eos that appears in row 0's generation but (likely) not row 1's
    eos = next((t for t in singles[0] if t not in singles[1]), None)
    if eos is None:
        pytest.skip("degenerate generations share all tokens")
    batched = gen.greedy_batch(prompts, max_new_tokens=8, eos_token_id=eos)
    assert batched[0] == singles[0][: singles[0].index(eos)]
    assert batched[1] == singles[1]


def test_greedy_device_loop_matches_python_loop(model_pair, rng):
    _, config, params = model_pair
    prompt = rng.integers(0, HF_CFG["vocab_size"], size=(24,))
    dev = Generator(params, config, device_loop=True).greedy(prompt, 9)
    py = Generator(params, config, device_loop=False).greedy(prompt, 9)
    assert dev == py


# ---------------------------------------------------------------------------
# harness
# ---------------------------------------------------------------------------


def test_loglikelihood_matches_manual(model_pair):
    hf_model, config, params = model_pair
    tok = ByteTokenizer(vocab_size=HF_CFG["vocab_size"])
    lm = EvalLM(params, config, tok)
    context, continuation = "The sky is", " blue"
    (ll, greedy_flag), = lm.loglikelihood([(context, continuation)])

    ctx = tok.encode(context)
    full = [tok.bos_token_id] + tok.encode(context + continuation)
    with torch.no_grad():
        logits = hf_model(torch.tensor([full])).logits[0].log_softmax(-1)
    n_cont = len(full) - 1 - len(ctx)
    L = len(full)
    # logits at position p predict token full[p+1]
    manual = sum(float(logits[L - n_cont + j - 1, full[L - n_cont + j]]) for j in range(n_cont))
    np.testing.assert_allclose(ll, manual, rtol=1e-4, atol=1e-4)


def test_evaluate_tasks_with_override(model_pair):
    _, config, params = model_pair
    tok = ByteTokenizer(vocab_size=HF_CFG["vocab_size"])
    lm = EvalLM(params, config, tok)
    docs = {
        "boolq": [
            {"passage": "Cats are mammals.", "question": "are cats mammals", "answer": True},
            {"passage": "Fish swim.", "question": "do fish fly", "answer": False},
        ],
        "piqa": [
            {"goal": "dry hands", "sol1": "use a towel", "sol2": "use a fork", "label": 0},
        ],
        "winogrande": [
            {"sentence": "The cup fell because _ was heavy.", "option1": "the cup", "option2": "the sky", "answer": "1"},
        ],
    }
    res = evaluate_tasks(lm, ["boolq", "piqa", "winogrande"], docs_override=docs)
    for t in ("boolq", "piqa", "winogrande"):
        assert 0.0 <= res[t]["acc"] <= 1.0
    assert "mean" in res
    with pytest.raises(KeyError):
        evaluate_tasks(lm, ["nope"], docs_override=docs)


# ---------------------------------------------------------------------------
# longbench metrics — golden vs the reference implementations
# ---------------------------------------------------------------------------


def test_longbench_metrics_match_reference():
    import tools.eval_longbench as ref_lb

    from grasp_tpu.eval import longbench as lb

    cases = [
        ("the Quick brown fox!", "a quick brown fox"),
        ("42 paragraphs in total, maybe 7", "7"),
        ("answer: Paragraph 12", "Paragraph 12 says things"),
        ("", "anything"),
    ]
    for pred, gt in cases:
        np.testing.assert_allclose(lb.qa_f1_score(pred, gt), ref_lb.qa_f1_score(pred, gt))
        np.testing.assert_allclose(lb.count_score(pred, gt.split()[0] if gt else "0"),
                                   ref_lb.count_score(pred, gt.split()[0] if gt else "0"))
        np.testing.assert_allclose(lb.rouge_score(pred, gt), ref_lb.rouge_score(pred, gt))
    np.testing.assert_allclose(
        lb.retrieval_score("it is 12", "Paragraph 12 intro"),
        ref_lb.retrieval_score("it is 12", "Paragraph 12 intro"),
    )
    np.testing.assert_allclose(
        lb.classification_score("label A or AB", "AB", all_classes=["A", "AB", "C"]),
        ref_lb.classification_score("label A or AB", "AB", all_classes=["A", "AB", "C"]),
    )
    np.testing.assert_allclose(
        lb.code_sim_score("x = 1\n# comment", "x = 1"),
        ref_lb.code_sim_score("x = 1\n# comment", "x = 1"),
    )
    np.testing.assert_allclose(
        lb.qa_f1_zh_score("猫是动物", "猫是一种动物"),
        ref_lb.qa_f1_zh_score("猫是动物", "猫是一种动物"),
    )
    # scorer aggregation
    preds, answers = ["a quick fox", "7"], [["the quick fox"], ["7"]]
    assert lb.scorer("narrativeqa", preds, answers, None) == ref_lb.scorer("narrativeqa", preds, answers, None)


def test_longbench_end_to_end_with_override(model_pair):
    hf_model, config, params = model_pair
    tok = ByteTokenizer(vocab_size=HF_CFG["vocab_size"])
    from grasp_tpu.eval.longbench import eval_longbench

    samples = {
        "lcc": [
            {"context": "def add(a, b):\n    return a + b\n", "input": "",
             "answers": ["return a + b"], "all_classes": None, "length": 30},
        ],
    }
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        scores = eval_longbench(
            params, config, tok, "test-model", ["lcc"],
            samples_override=samples, output_dir=td, max_length=256,
        )
    assert "lcc" in scores and 0.0 <= scores["lcc"] <= 100.0


def test_build_chat_family_wrappers():
    """Chat wrappers emit exactly what the reference toolchains produce
    (reference eval_longbench.py:279-301; fastchat vicuna template and the
    ChatGLM tokenizers reproduced as strings — their packages aren't
    importable here)."""
    from grasp_tpu.eval.longbench import build_chat

    p = "What is 2+2?"
    assert build_chat(p, "llama2-7b-chat-4k") == f"[INST]{p}[/INST]"
    assert build_chat(p, "chatglm2-6b") == f"[Round 1]\n\n问：{p}\n\n答："
    assert build_chat(p, "chatglm3-6b-32k") == f"<|user|>\n{p}<|assistant|>"
    v = build_chat(p, "vicuna-v1.5-7b-16k")
    assert v.endswith(f"USER: {p} ASSISTANT:") and v.startswith("A chat between")
    assert build_chat(p, "longchat-v1.5-7b-32k") == v
    assert build_chat(p, "internlm-7b-8k") == f"<|User|>:{p}<eoh>\n<|Bot|>:"
    assert build_chat(p, "some-base-model") == p
