#!/bin/bash
# YCB-Video stage-2 refiner training (mirrors reference scripts/script_train_YCBV_stage2.sh)
python -m dcl_net_tpu.tools.train_ycbv_stage2 \
    --model DCL_Net \
    --config configs/config_YCBV_bs40.yaml \
    --config_stage1 configs/config_YCBV_bs32.yaml \
    --checkpoint_stage1 ${1:?usage: $0 <stage1_checkpoint> [exp_id] [path_data]} \
    --iteration 2 \
    --exp_id ${2:-0} \
    --path_data ${3:-./datasets}
