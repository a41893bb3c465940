#!/bin/sh
# Run the test suite on the CPU backend (8 virtual devices via conftest).
#
# Default = the FAST tier (pyproject addopts excludes -m slow): < ~5 min.
# --full  = everything, including the slow celeba/CLI e2e tests (~22 min).
#
# Known environment flake: a small fraction of runs die mid-suite with a
# bare "Fatal Python error:" at a random test (jax CPU backend churn, not
# a test failure — clean runs pass everything). Rerun on that signature.
# Also: don't edit source files while a run is in flight (import races).
if [ "$1" = "--full" ]; then
    shift
    JAX_PLATFORMS=cpu exec python -m pytest tests/ -q -m '' "$@"
fi
JAX_PLATFORMS=cpu exec python -m pytest tests/ -q "$@"
