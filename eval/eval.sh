#!/bin/bash
# Open-vocabulary IoU + localization eval, mirroring /root/reference/eval/eval.sh.
CASE_NAME="${CASE_NAME:-teatime}"
gt_folder="${gt_folder:-../data/lerf_ovs/label}"
root_path="${root_path:-..}"

python -m langsplat_tpu.cli.eval_cli \
    --dataset_name "${CASE_NAME}" \
    --feat_dir "${root_path}/output" \
    --ae_ckpt_dir "${root_path}/ckpt" \
    --output_dir "${root_path}/eval_result" \
    --mask_thresh 0.4 \
    --encoder_dims 256 128 64 32 3 \
    --decoder_dims 16 32 64 128 256 256 512 \
    --json_folder "${gt_folder}"
