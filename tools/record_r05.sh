#!/bin/bash
# Round-5 chip artifact pass: every number recorded on the final code.
# Run from the repo root on the TPU host (axon tunnel). Each stage is a
# separate process (engine teardown through the tunnel deadlocks when
# chained in-process; see tools/run_baseline.py run_app docstring).
set -x
cd "$(dirname "$0")/.."

# 1. full bench suite (chip) -> BENCH_SUITE.json
timeout 3000 python bench.py --suite 2> output/bench_suite_r05.log

# 2. accuracy matrix on chip: GT fusion, ICP strict+fast, SDF, 512^3 mesh
timeout 5400 python tools/run_baseline.py --configs 1,2,3,4 --frames 120 \
    --out output/ATE_r05_chip.json 2> output/ate_chip_r05.log

# 3. strict 300-frame soak (chip)
timeout 3600 python tools/run_baseline.py --configs 8 --frames 300 \
    --out output/ATE_r05_soak.json 2> output/ate_soak_r05.log

# 4. pose-graph drift A/B with the round-5 runtime budget (chip)
timeout 5400 python tools/run_baseline.py --configs 6 --frames 400 \
    --out output/ATE_r05_part6.json 2> output/ate_part6_r05.log

echo DONE
