#!/bin/bash -eu
set -eu -o pipefail

# Smoke test over MULTI-read fast5 input (reference: workflow/
# remap_from_samrefs_then_train_multireadf5_test_workflow.sh).

READ_DIR=${READ_DIR:-/root/reference/test/data/multireads}
export READ_DIR
exec bash "$(dirname "$0")/remap_from_samrefs_then_train_test_workflow.sh"
