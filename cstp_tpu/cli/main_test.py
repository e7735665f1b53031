"""Video-level test entry point — flag-compatible with reference ``test.py``.

    python -m cstp_tpu.cli.main_test --task test --t_ft_task ft_all \
        --dataset UCF101 --pb_rate 4 ...
"""

from cstp_tpu.config import parse_opts
from cstp_tpu.parallel import maybe_initialize_distributed
from cstp_tpu.train.loops import run_test


def main(argv=None):
    maybe_initialize_distributed()
    config = parse_opts(argv)
    if config.task != "test":
        raise SystemExit(f"main_test handles task 'test', got {config.task!r}")
    out = run_test(config)
    print("Video accuracy = ", out["accuracy"])


if __name__ == "__main__":
    main()
