#!/bin/sh
# Run the test suite on the CPU backend (8 virtual devices via conftest).
# Known environment flake: ~40% of runs die mid-suite with a bare
# "Fatal Python error:" at a random test (jax CPU backend churn, not a
# test failure — clean runs pass 108/108). Rerun on that signature.
# Also: don't edit source files while a run is in flight (import races).
JAX_PLATFORMS=cpu exec python -m pytest tests/ -q "$@"
