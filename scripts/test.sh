#!/bin/sh
# Run the test suite on the CPU backend (8 virtual devices via conftest).
# IMPORTANT: do not run concurrently with a process using the TPU — the
# axon PJRT plugin initializes during jax plugin discovery even for
# CPU-pinned processes, and concurrent tunnel use can crash ("Fatal Python
# error") either process.
JAX_PLATFORMS=cpu exec python -m pytest tests/ -q "$@"
