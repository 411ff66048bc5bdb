#!/usr/bin/env bash
# EP probing (32 queries) on frozen MAE ViT-B/16, IN-1K.
python main_linprobe.py \
  --model vit_base_patch16 \
  --finetune "${CKPT:-mae_pretrain_vit_base.pth}" \
  --dataset_name imagenet1k --data_path "${DATA:-/data/imagenet}" \
  --nb_classes 1000 --cls_features ep --ep_queries 32 --d_out 1 \
  --batch_size 4096 --epochs 90 --warmup_epochs 10 \
  --optimizer lars --blr 0.1 --weight_decay 0.0 \
  --output_dir "${OUT:-runs/mae_b16_ep32}"
