from cstp_tpu.ckpt.checkpoint import (  # noqa: F401
    ckpt_name,
    delete_checkpoint,
    epoch_from_name,
    find_best_checkpoint,
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
