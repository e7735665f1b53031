"""Pretrain entry point — flag-compatible with reference ``main_byol.py``.

    python -m cstp_tpu.cli.main_byol --dataset UCF101 --task loss_com \
        --model_name r21d --model_depth 1 --batch_size 60 \
        --learning_rate 0.03 --weight_decay 5e-4 --n_epochs 300 \
        --frame_dir ... --annotation_path ... --result_path ...

No ``torch.distributed.launch``: one process per host; the device mesh spans
all local (and, after ``jax.distributed.initialize``, all slice) chips.
"""

from cstp_tpu.config import parse_opts
from cstp_tpu.parallel import maybe_initialize_distributed
from cstp_tpu.train.loops import run_pretrain


def main(argv=None):
    maybe_initialize_distributed()
    config = parse_opts(argv)
    if config.task not in ("loss_com", "r_byol", "resume"):
        raise SystemExit(f"main_byol handles pretrain tasks, got {config.task!r}")
    run_pretrain(config)


if __name__ == "__main__":
    main()
