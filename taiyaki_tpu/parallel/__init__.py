"""Multi-chip / multi-host parallelism (mesh, sharded train step)."""
