#!/bin/bash
# HAA-LSTM training / evaluation — TPU-native.
# (reference src/scripts/avdn_paper/run_lstm_haa.sh)
set -e

seed=0

flag="--root_dir ../datasets

      --seed ${seed}

      --feedback student

      --max_action_len 10
      --max_instr_len 100

      --lr 1e-5
      --iters 200000
      --log_every 2
      --batch_size 4
      --optim adamW

      --ml_weight 0.2

      --nss_w 0
      --nss_r 0

      --darknet_model_file ../datasets/AVDN/pretrain_weights/yolo_v3.cfg
      --darknet_weight_file ../datasets/AVDN/pretrain_weights/best.pt
      --eval_first True
      "

# train
python -m avdn_tpu.cli.train_lstm --output_dir ../datasets/AVDN/lstm_v8 $flag

# eval
# python -m avdn_tpu.cli.train_lstm --output_dir ../datasets/AVDN/lstm_output $flag \
#       --resume_file ../datasets/AVDN/lstm_haa/ckpts/best_val_unseen \
#       --inference True \
#       --submit True
