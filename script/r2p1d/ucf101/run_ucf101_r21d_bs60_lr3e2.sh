#!/usr/bin/env bash
# UCF-101 pretrain -> finetune -> test (reference README.md:47-93), frame-dir
# ingest. Swap --dataset UcfRepreBYOLSpPre for UCF101RepreLMDB + --lmdb_path
# to train from LMDB shards instead.
set -e

UCF_FRAMES=${UCF_FRAMES:-dataset/UCF_101_1f_256}
UCF_LABELS=${UCF_LABELS:-dataset/UCF101_labels}
RESULTS=${RESULTS:-results_ucf101_r21d_bs60_lr3e2}

python -m cstp_tpu.cli.main_byol --dataset UcfRepreBYOLSpPre --split 1 \
  --n_classes 101 --batch_size 60 --sample_duration 16 \
  --model_name r21d_byol --model_depth 1 \
  --frame_dir "$UCF_FRAMES" --annotation_path "$UCF_LABELS" \
  --result_path "$RESULTS" \
  --n_epochs 300 --learning_rate 0.03 --weight_decay 5e-4 \
  --sample_size 112 --n_workers 6 --task loss_com --optimizer sgd \
  --loss_weight 0.1 1 1 1 1

python -m cstp_tpu.cli.main_ft --dataset UcfFineTune --split 1 \
  --n_classes 101 --n_finetune_classes 101 --batch_size 60 --sample_duration 16 \
  --model_name r21d_byol --model_depth 1 \
  --frame_dir "$UCF_FRAMES" --annotation_path "$UCF_LABELS" \
  --result_path "$RESULTS" \
  --pretrained_path "$RESULTS/UcfRepreBYOLSpPre/loss_com/save_300" \
  --n_epochs 100 --learning_rate 0.025 --weight_decay 5e-4 \
  --sample_size 112 --n_workers 6 --task ft_all --optimizer sgd \
  --transform_mode img --pb_rate 4

python -m cstp_tpu.cli.main_test --dataset UcfFineTune --split 1 \
  --n_classes 101 --n_finetune_classes 101 --batch_size 1 \
  --sample_duration 16 --model_name r21d_byol --model_depth 1 \
  --frame_dir "$UCF_FRAMES" --annotation_path "$UCF_LABELS" \
  --result_path "$RESULTS" \
  --sample_size 112 --task test --pb_rate 4 --t_ft_task ft_all
