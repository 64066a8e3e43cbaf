#!/bin/bash
# YCB-Video stage-2 eval, 2 refine iterations (mirrors reference scripts/script_eval_YCBV_stage2.sh)
python -m dcl_net_tpu.tools.test_ycbv_stage2 \
    --model DCL_Net \
    --config configs/config_YCBV_bs40.yaml \
    --checkpoint_stage1 ${1:?usage: $0 <stage1_checkpoint> [refiner_epoch]} \
    --epoch ${2:-84} \
    --iteration 2 \
    --path_data ${3:-./datasets}
