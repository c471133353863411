"""Framework-wide constants (reference: taiyaki/constants.py)."""

DEFAULT_ALPHABET = "ACGT"
DEFAULT_NBASE = len(DEFAULT_ALPHABET)

DOTROWLENGTH = 50
SMALL_VAL = 1e-10
LARGE_VAL = 1e30
LARGE_LOG_VAL = 50000.0

MODEL_LOG_FILENAME = "model.log"
BATCH_LOG_FILENAME = "batch.log"
VALID_LOG_FILENAME = "validation.log"
