#!/bin/bash
# Round-5 large-mesh convergence chain: 50k to plateau, offline eval, then 25k.
# Runs sequentially on the single chip; launched in background at round start.
cd /root/repo
set -x
python -m surfacenetworks_tpu.cli.train_correspondence \
  --synthetic 2 --synthetic-points 50000 --num-updates 30 --num-epoch 1500 \
  --full-train --deser-option no --result-prefix large50k_r05 \
  > results/dense_correspondence/log/large50k_r05.log 2>&1
python -m surfacenetworks_tpu.cli.train_correspondence \
  --synthetic 2 --synthetic-points 50000 --num-updates 30 --num-epoch 1500 \
  --full-train --eval-only --deser-option force \
  --deser-path results/dense_correspondence/pts/large50k_r05_state.msgpack \
  --result-prefix large50k_r05_eval \
  > results/dense_correspondence/log/large50k_r05_eval.log 2>&1
python -m surfacenetworks_tpu.cli.train_correspondence \
  --synthetic 3 --synthetic-points 25000 --num-updates 50 --num-epoch 250 \
  --complete-test --deser-option no --result-prefix large25k_r05 \
  > results/dense_correspondence/log/large25k_r05.log 2>&1
echo CHAIN_DONE
