#!/bin/bash
# LineMOD training (mirrors reference scripts/script_train_LM.sh)
python -m dcl_net_tpu.tools.train_stage1 \
    --model DCL_Net \
    --config configs/config_LM.yaml \
    --exp_id ${1:-0} \
    --path_data ${2:-./datasets}
