#!/bin/bash
# Occlusion-LineMOD eval at epoch 350 (mirrors reference scripts/script_eval_LMO.sh)
python -m dcl_net_tpu.tools.test_lmo \
    --model DCL_Net \
    --config configs/config_LM.yaml \
    --epoch ${1:-350} \
    --path_data ${2:-./datasets}
