#!/bin/bash
# Round-4 measurement windows (VERDICT r03 punch #3/#4/#6), run sequentially
# so the host is quiet for each. Level order is widest-first so the one-time
# input parquet materialization runs at high parallelism; within-round
# efficiency ratios are order-independent.
set -u
cd /root/repo
LOG=BENCH/r04_windows.log
echo "=== r04 windows start $(date -u +%H:%M:%S) ===" >> "$LOG"

echo "--- cc chain-only 2M ($(date -u +%H:%M:%S)) ---" >> "$LOG"
SDV_BENCH_EDGES=2000000 SDV_BENCH_PATH_NODES=0 \
SDV_BENCH_LEVELS=8,4,2,1 SDV_BENCH_PAIRS=1-4,2-8 SDV_BENCH_REPEATS=2 \
python bench_scaling_cc.py > BENCH/cc_window_2M_chain.json 2>> "$LOG"
echo "cc chain exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"

echo "--- hygiene 1M ($(date -u +%H:%M:%S)) ---" >> "$LOG"
SDV_BENCH_LEVELS=8,4,2,1 SDV_BENCH_PAIRS=1-4,2-8 SDV_BENCH_REPEATS=2 \
python bench_scaling_hygiene.py > BENCH/hygiene_window_1M.json 2>> "$LOG"
echo "hygiene exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"

echo "--- dedup minhash 10M ($(date -u +%H:%M:%S)) ---" >> "$LOG"
SDV_BENCH_DOCS=10000000 SDV_BENCH_LEVELS=32,8,4,1 SDV_BENCH_PAIRS=1-4,8-32 \
SDV_BENCH_JOBS=minhash SDV_BENCH_REPEATS=1 \
python bench_scaling_dedup.py > BENCH/dedup_window_10M_r04.json 2>> "$LOG"
echo "dedup 10M exit=$? ($(date -u +%H:%M:%S))" >> "$LOG"
echo "=== r04 windows done $(date -u +%H:%M:%S) ===" >> "$LOG"
