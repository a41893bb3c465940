#!/bin/sh
# Measure the fast tier repeatedly: wall time + outcome per run.
#
# Purpose (round-3 test-story hardening): (a) an uncontended timing basis
# for the tier's "<N min" claim in test.sh, (b) a measured frequency bound
# for the known "Fatal Python error:" environment flake instead of
# folklore. Results land in /tmp/test_stability.log + per-run logs
# /tmp/test_run_<i>.log.
N=${1:-3}
: > /tmp/test_stability.log
i=1
while [ "$i" -le "$N" ]; do
    start=$(date +%s)
    JAX_PLATFORMS=cpu python -m pytest tests/ -q \
        > /tmp/test_run_$i.log 2>&1
    rc=$?
    end=$(date +%s)
    fatal=$(grep -c "Fatal Python error" /tmp/test_run_$i.log)
    line="run $i: rc=$rc wall=$((end - start))s fatal=$fatal \
$(tail -1 /tmp/test_run_$i.log)"
    echo "$line"
    echo "$line" >> /tmp/test_stability.log
    i=$((i + 1))
done
