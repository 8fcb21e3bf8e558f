from grasp_tpu.train.recover import (  # noqa: F401
    count_trainable,
    make_eval_step,
    make_optimizer,
    make_train_step,
    recovery_train,
    trainable_mask,
)
