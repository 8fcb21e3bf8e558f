from grasp_tpu.eval.ppl import evaluate_perplexity, windowed_perplexity  # noqa: F401
from grasp_tpu.eval.generate import greedy_generate  # noqa: F401
