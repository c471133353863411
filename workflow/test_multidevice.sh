#!/bin/bash -eu
set -eu -o pipefail

# Multi-device data-parallel training test (replaces the reference's
# workflow/test_multiGPU.sh, which needed 2 physical GPUs and DDP).
# Here the same check runs anywhere: train on an 8-device virtual CPU
# mesh (XLA host-platform devices) and assert batch.log has exactly
# ITERATIONS + 1 lines.

ITERATIONS=${ITERATIONS:-20}
MAPPED=${MAPPED:-RESULTS/training_ingredients/mapped_remap_samref.hdf5}
ROOT=$(pwd)
OUTDIR=${ROOT}/RESULTS/multidevice_training

if [ ! -f "${MAPPED}" ]; then
    echo "Mapped-signal file ${MAPPED} not found; run" \
         "remap_from_samrefs_then_train_test_workflow.sh first"
    exit 1
fi

rm -rf "${OUTDIR}"

XLA_FLAGS="--xla_force_host_platform_device_count=8" \
python3 bin/train_flipflop.py --device cpu \
    --size 17 --stride 2 --winlen 19 \
    --niteration "${ITERATIONS}" --warmup_batches 5 \
    --chunk_len_min 1500 --chunk_len_max 2500 \
    --min_sub_batch_size 8 --save_every 100 \
    --sample_nreads_before_filtering 100 --reporting_sub_batches 10 \
    --outdir "${OUTDIR}" --overwrite --seed 1 \
    taiyaki_tpu/models/mGru_flipflop.py "${MAPPED}"

batchlog_lines=$(wc -l < "${OUTDIR}/batch.log")
echo "Number of lines in batch log: ${batchlog_lines}"
if [ "${batchlog_lines}" -ne $((ITERATIONS + 1)) ]; then
    echo "batch.log has ${batchlog_lines} lines, expected $((ITERATIONS+1))"
    exit 1
fi

grep -q "Data-parallel over 8 devices" "${OUTDIR}/model.log" || {
    echo "Training did not run on the 8-device mesh"
    exit 1
}

echo "Multi-device training test completed successfully"
