#!/bin/bash -eu
set -eu -o pipefail

# Smoke test: user-supplied modified-base per-read references -> remap ->
# train a cat_mod model (reference: workflow/remap_from_mod_fasta_then_
# train_test_mod_workflow.sh).

echo ""
echo "Test of mod-base remap -> cat_mod training starting"
echo ""

READ_DIR=${READ_DIR:-/root/reference/test/data/reads}
MODREFS=${MODREFS:-/root/reference/test/data/per_read_references.mod_bases.fasta}

ROOT=$(pwd)
RESULT_DIR=${ROOT}/RESULTS/mod_train_remapuser_ref

rm -rf "${RESULT_DIR}"

make -f workflow/Makefile READDIR="${READ_DIR}" \
    USER_PER_READ_MOD_REFERENCE_FILE="${MODREFS}" SEED=1 \
    mod_train_remapuser_ref

traininglog_lines=$(wc -l < "${RESULT_DIR}/model.log")
echo "Number of lines in training log: ${traininglog_lines}"
if [ "${traininglog_lines}" -lt 9 ]; then
    echo "Training log too short - training not started properly"
    exit 1
fi

echo ""
echo "Modified-base workflow test completed successfully"
echo ""
