#!/bin/sh
# Run the test suite on the CPU backend (8 virtual devices via conftest).
#
# Default = the FAST tier (pyproject addopts excludes -m slow): ~5-6 min
# on an otherwise-idle host (measured 2026-08-20 via
# scripts/test_stability.sh: 267/297/324 s over 3 clean runs, 203 tests;
# 208 tests after the stacked-decoder additions, 509 s contended).
# Concurrent load inflates this heavily on the 1-CPU host (a judge run
# contended with a TPU dryrun measured 9m53s).
# --full  = everything, including the slow celeba/CLI e2e tests (~22 min).
#
# Known environment flake: rare runs die mid-suite with a bare
# "Fatal Python error:" at a random test (jax CPU backend churn, not a
# test failure — clean runs pass everything). Measured frequency:
# 0 occurrences in the 3 instrumented stability runs above (and none in
# this round's ad-hoc runs); rerun on that signature.
# Also: don't edit source files while a run is in flight (import races).
if [ "$1" = "--full" ]; then
    shift
    JAX_PLATFORMS=cpu exec python -m pytest tests/ -q -m '' "$@"
fi
JAX_PLATFORMS=cpu exec python -m pytest tests/ -q "$@"
