from grasp_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    param_specs,
    batch_spec,
    shard_params,
    shard_batch,
    replicate,
    distributed_init,
)
from grasp_tpu.parallel.ring_attention import (  # noqa: F401
    ring_attention,
    context_parallel_attention,
)
from grasp_tpu.parallel.seq_parallel import (  # noqa: F401
    make_seq_parallel_train_step,
    seq_parallel_logits,
    seq_parallel_loss,
)
