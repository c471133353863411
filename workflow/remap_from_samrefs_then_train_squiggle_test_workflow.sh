#!/bin/bash -eu
set -eu -o pipefail

# Smoke test: refs from sam -> remap -> train squiggle predictor
# (reference: workflow/remap_from_samrefs_then_train_squiggle_test_
# workflow.sh).

echo ""
echo "Test of remap -> squiggle-predictor training starting"
echo ""

READ_DIR=${READ_DIR:-/root/reference/test/data/reads}
SAM_DIR=${SAM_DIR:-/root/reference/test/data/aligner_output}
SAMFILES=$(ls ${SAM_DIR}/*.sam | xargs)
REFERENCEFILE=${REFERENCEFILE:-/root/reference/test/data/genomic_reference.fasta}

ROOT=$(pwd)
RESULT_DIR=${ROOT}/RESULTS/train_squiggle

rm -rf "${RESULT_DIR}"

make -f workflow/Makefile READDIR="${READ_DIR}" BAMFILE="${SAMFILES}" \
    REFERENCEFILE="${REFERENCEFILE}" SEED=1 train_squiggle

traininglog_lines=$(wc -l < "${RESULT_DIR}/model.log")
echo "Number of lines in training log: ${traininglog_lines}"
if [ "${traininglog_lines}" -lt 9 ]; then
    echo "Training log too short - training not started properly"
    exit 1
fi

echo ""
echo "Squiggle workflow test completed successfully"
echo ""
