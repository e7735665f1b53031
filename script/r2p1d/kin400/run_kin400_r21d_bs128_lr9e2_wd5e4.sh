#!/usr/bin/env bash
# Canonical Kinetics-400 R(2+1)D pipeline — TPU-native equivalent of the
# reference script/r2p1d/kin400/run_kin400_r21d_bsor_rotaug_bs128_lr3e2_
# wd5e4_bvsvtvp0.1v1v1v1_venus.sh. No torch.distributed.launch: one process
# per HOST; the GSPMD mesh spans all local chips (and all hosts after
# jax.distributed.initialize, which the CLIs call automatically on pods).
#
# Paths assume LMDB shards built by the reference's make_lmdb_kin.py (our
# reader consumes that exact layout) OR CSTPack shards from
#   python -m cstp_tpu.data.pack frames <frame_root> <out.cstpack> --raw-hw 128 171
# (preferred for production ingest throughput — see PERF.md).
set -e

KIN_LMDB=${KIN_LMDB:-dataset/lmdb_kin400.lmdb}
KIN_LABELS=${KIN_LABELS:-dataset/kin400_mmlab_labels}
UCF_FRAMES=${UCF_FRAMES:-dataset/UCF_101_1f_256}
UCF_LABELS=${UCF_LABELS:-dataset/UCF101_labels}
RESULTS=${RESULTS:-results_kin400_r21d_bs128_lr9e2_wd5e4}

# 1) BYOL+CSTP pretrain on Kinetics-400 (reference README.md:31-44)
python -m cstp_tpu.cli.main_byol --dataset Kin400RepreLMDB --split 1 \
  --n_classes 101 --batch_size 128 --sample_duration 16 \
  --model_name r21d_byol --model_depth 1 --ft_begin_index 0 \
  --lmdb_path "$KIN_LMDB" \
  --annotation_path "$KIN_LABELS" \
  --result_path "$RESULTS" \
  --n_epochs 300 --learning_rate 0.09 --weight_decay 5e-4 \
  --sample_size 112 --n_workers 6 --task loss_com --optimizer sgd \
  --loss_weight 0.1 1 1 1 1

# 2) finetune on UCF-101 (reference README.md:63-78)
python -m cstp_tpu.cli.main_ft --dataset UcfFineTune --split 1 \
  --n_classes 101 --n_finetune_classes 101 --batch_size 60 --sample_duration 16 \
  --model_name r21d_byol --model_depth 1 \
  --frame_dir "$UCF_FRAMES" \
  --annotation_path "$UCF_LABELS" \
  --result_path "$RESULTS" \
  --pretrained_path "$RESULTS/Kin400RepreLMDB/loss_com/save_300" \
  --n_epochs 100 --learning_rate 0.02 --weight_decay 5e-4 \
  --sample_size 112 --n_workers 6 --task ft_all --optimizer sgd \
  --transform_mode img --pb_rate 4

# 3) video-level sliding-window test (reference README.md:81-93)
python -m cstp_tpu.cli.main_test --dataset UcfFineTune --split 1 \
  --n_classes 101 --n_finetune_classes 101 \
  --batch_size 1 --sample_duration 16 \
  --model_name r21d_byol --model_depth 1 --ft_begin_index 5 \
  --frame_dir "$UCF_FRAMES" \
  --annotation_path "$UCF_LABELS" \
  --result_path "$RESULTS" \
  --sample_size 112 --n_workers 6 --task test --pb_rate 4 \
  --transform_mode img_test --t_ft_task ft_all
