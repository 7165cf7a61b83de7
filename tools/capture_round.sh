#!/bin/bash
# End-of-round performance capture ritual. Run ON THE REAL CHIP as the LAST
# act of a round, after the final kernel commit, so no bench artifact can go
# stale against the shipped kernels (round-2/3 postmortem: BENCH_TRAIN.json
# was measured mid-round twice, then the hot kernel changed after it).
#
# Serializes every TPU process — the single axon-tunneled chip deadlocks (and
# can wedge the tunnel for >1h) when two processes claim it concurrently, so
# never background these and never wrap them in aggressive timeouts.
#
# Usage: bash tools/capture_round.sh
set -e
cd "$(dirname "$0")/.."

echo "== bench.py (headline inference number) =="
python bench.py | tee /tmp/capture_bench.log

echo "== train throughput -> BENCH_TRAIN.json =="
python tools/bench_train.py 32 BENCH_TRAIN.json

echo "== stage profile bs=32 -> PROFILE_r05_bs32.json =="
python tools/profile_stages.py 32 PROFILE_r05_bs32.json

echo "== stage profile bs=1 -> PROFILE_r05_bs1.json =="
python tools/profile_stages.py 1 PROFILE_r05_bs1.json

echo "== train stage profile -> PROFILE_r05_train.json =="
python tools/profile_train.py 32 PROFILE_r05_train.json

echo "== eval-path bench -> EVAL_BENCH.json =="
python tools/bench_eval.py 200 EVAL_BENCH.json

echo "All artifacts captured. Commit them:"
echo "  git add BENCH_TRAIN.json PROFILE_r05_bs32.json PROFILE_r05_bs1.json PROFILE_r05_train.json EVAL_BENCH.json"
