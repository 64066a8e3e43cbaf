#!/bin/bash
# YCB-Video stage-1 training (mirrors reference scripts/script_train_YCBV_stage1.sh)
python -m dcl_net_tpu.tools.train_stage1 \
    --model DCL_Net \
    --config configs/config_YCBV_bs32.yaml \
    --exp_id ${1:-0} \
    --path_data ${2:-./datasets}
