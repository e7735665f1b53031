"""Nearest-neighbor video retrieval entry point (task ``retrieval``).

The CSTP paper reports R@{1,5,10,20,50} video retrieval on UCF-101/HMDB-51
(test clips query the train gallery with cosine similarity of backbone
features), but the reference repo ships no script for the protocol. This
CLI evaluates it directly from a pretrain (BYOL) checkpoint — the usual
self-supervised evaluation — or from a finetune checkpoint:

    python -m cstp_tpu.cli.main_retrieval --task retrieval \
        --dataset UCF101 --model_name r21d --model_depth 1 \
        --pretrained_path results/UCF101/loss_com/save_300 \
        --frame_dir <jpegs> --annotation_path <lists> --result_path results
"""

from cstp_tpu.config import parse_opts
from cstp_tpu.parallel import maybe_initialize_distributed
from cstp_tpu.train.loops import run_retrieval


def main(argv=None):
    maybe_initialize_distributed()
    config = parse_opts(argv)
    if config.task != "retrieval":
        raise SystemExit(
            f"main_retrieval handles task 'retrieval', got {config.task!r}")
    out = run_retrieval(config)
    for k in ("R@1", "R@5", "R@10", "R@20", "R@50"):
        print(f"{k} = {out[k]}")
    print("report:", out["report"])


if __name__ == "__main__":
    main()
