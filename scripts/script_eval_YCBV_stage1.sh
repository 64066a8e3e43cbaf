#!/bin/bash
# YCB-Video stage-1 eval at epoch 84 (mirrors reference scripts/script_eval_YCBV_stage1.sh)
python -m dcl_net_tpu.tools.test_ycbv_stage1 \
    --model DCL_Net \
    --config configs/config_YCBV_bs32.yaml \
    --epoch ${1:-84} \
    --exp_id ${2:-0} \
    --path_data ${3:-./datasets}
