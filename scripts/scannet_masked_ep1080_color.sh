#!/bin/bash
# masked encoder + color (reference scripts/scannet_masked_ep1080_color.sh)
python -m ov3det.main \
  --dataset_name scannet \
  --max_epoch 1080 --enc_type masked --enc_dropout 0.3 \
  --nqueries 256 --base_lr 5e-4 \
  --matcher_giou_cost 2 --matcher_cls_cost 1 \
  --matcher_center_cost 0 --matcher_objectness_cost 0 \
  --loss_giou_weight 1 --loss_no_object_weight 0.25 \
  --save_separate_checkpoint_every_epoch -1 \
  --use_color \
  --checkpoint_dir outputs/scannet_masked_ep1080_color "$@"
