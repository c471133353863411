# Development targets (reference: top-level Makefile test tiers).

.PHONY: test unit_test acceptance_test workflow_test multidevice_test \
	multihost_test bench

test: unit_test

unit_test:
	python3 -m pytest tests/ -q

acceptance_test:
	python3 -m pytest tests/test_basecall_acceptance.py tests/test_mapped_signal_files.py -q

workflow_test:
	bash workflow/remap_from_samrefs_then_train_test_workflow.sh
	bash workflow/remap_from_mod_fasta_then_train_test_mod_workflow.sh
	bash workflow/remap_from_samrefs_then_train_squiggle_test_workflow.sh
	bash workflow/remap_from_samrefs_then_train_multireadf5_test_workflow.sh

multidevice_test:
	bash workflow/test_multidevice.sh

# Real 2-process rendezvous (Gloo over CPU) — the TPU analogue of the
# reference's test_multiGPU.sh, but CI-able without accelerators.
multihost_test:
	python3 -m pytest tests/test_multihost.py -q

bench:
	python3 bench.py
