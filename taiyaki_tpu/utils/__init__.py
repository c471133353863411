"""Host-side helpers: JSON export, logging, checkpoints, CLI args."""
