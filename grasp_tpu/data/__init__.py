from grasp_tpu.data.tokenizer import ByteTokenizer, load_tokenizer  # noqa: F401
from grasp_tpu.data.loader import (  # noqa: F401
    get_calibration_batches,
    get_evaluation_corpus,
    chunk_corpus,
)
from grasp_tpu.data.prompter import Prompter  # noqa: F401
