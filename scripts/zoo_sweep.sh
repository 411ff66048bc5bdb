#!/usr/bin/env bash
# Pooling-zoo sweep on one frozen backbone (driver config #3).
set -e
for POOL in simpool abmilp cbam coca clip aim siglip jepa cae cait dinovit dolg esimpool; do
  python main_linprobe.py \
    --model vit_base_patch16 --finetune "${CKPT:?set CKPT}" \
    --dataset_name imagenet1k --data_path "${DATA:?set DATA}" \
    --cls_features "$POOL" \
    --batch_size 4096 --epochs 90 --optimizer lars --blr 0.1 \
    --output_dir "runs/zoo_${POOL}"
done
