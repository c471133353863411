#!/bin/bash -eu
set -eu -o pipefail

# End-to-end smoke test: extract refs from sam -> remap -> train a small
# flip-flop model (reference: workflow/remap_from_samrefs_then_train_test_
# workflow.sh).  Run from the repo root; success = training log with >= 9
# lines.

echo ""
echo "Test of extract-ref-from-sam -> flip-flop remap -> training starting"
echo ""

READ_DIR=${READ_DIR:-/root/reference/test/data/reads}
SAM_DIR=${SAM_DIR:-/root/reference/test/data/aligner_output}
SAMFILES=$(ls ${SAM_DIR}/*.sam | xargs)
REFERENCEFILE=${REFERENCEFILE:-/root/reference/test/data/genomic_reference.fasta}

ROOT=$(pwd)
RESULT_DIR=${ROOT}/RESULTS/train_remap_samref

rm -rf "${RESULT_DIR}" "${ROOT}/RESULTS/training_ingredients"

make -f workflow/Makefile READDIR="${READ_DIR}" BAMFILE="${SAMFILES}" \
    REFERENCEFILE="${REFERENCEFILE}" SEED=1 train_remap_samref

traininglog_lines=$(wc -l < "${RESULT_DIR}/model.log")
echo "Number of lines in training log: ${traininglog_lines}"
if [ "${traininglog_lines}" -lt 9 ]; then
    echo "Training log too short - training not started properly"
    exit 1
fi

echo ""
echo "Workflow test completed successfully"
echo ""
