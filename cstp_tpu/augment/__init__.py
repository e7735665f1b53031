from cstp_tpu.augment.pipeline import (  # noqa: F401
    pretrain_augment_batch,
    finetune_train_augment_batch,
    eval_augment_batch,
)
