#!/bin/bash
# Refresh the repo-root persistent compile cache (.jax_cache) for BOTH
# models' CURRENT bench programs (VERDICT round-4 item 6: BENCH_r04 burned
# 500 s compiling DeepSense because the cache was warm for SW only).
#
# BENCH_STEPS/BENCH_PASSES only shape the Python timing loop — the jitted
# step and the cost-analysis lowerings are the SAME XLA programs the real
# `python bench.py` uses, so one 1-step pass per model populates the cache
# for the driver's full run. Run after any change to the step code, before
# the round ends.
set -e
cd "$(dirname "$0")/.."
BENCH_STEPS=1 BENCH_PASSES=1 python bench.py "$@"
