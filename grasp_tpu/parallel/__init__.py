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
from grasp_tpu.parallel.pipeline import (  # noqa: F401
    dehybridize_layers,
    from_pipeline_params,
    hybrid_grad_mask,
    hybridize_layers,
    make_pipeline_loss,
    make_pp_train_step,
    shard_pipeline_params,
    to_pipeline_params,
    uniform_layer_plan,
)
