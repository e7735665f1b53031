"""Finetune entry point — flag-compatible with reference ``main_ft_mp.py``.

    python -m cstp_tpu.cli.main_ft --task ft_all --pretrained_path <ckpt> \
        --dataset UCF101 --n_finetune_classes 101 --batch_size 60 \
        --learning_rate 0.02 --pb_rate 4 --n_epochs 100 ...
"""

from cstp_tpu.config import parse_opts
from cstp_tpu.parallel import maybe_initialize_distributed
from cstp_tpu.train.loops import run_finetune


def main(argv=None):
    maybe_initialize_distributed()
    config = parse_opts(argv)
    if config.task not in ("ft_fc", "ft_all", "scratch", "resume"):
        raise SystemExit(f"main_ft handles finetune tasks, got {config.task!r}")
    out = run_finetune(config)
    print("Best val acc:", out["best"]["acc"], "at epoch", out["best"]["epoch"])


if __name__ == "__main__":
    main()
