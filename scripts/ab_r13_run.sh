#!/bin/bash
# Interleaved A/B: r11 (gc always, its native), HEAD (gc cond, native),
# HEAD (gc always, toggle). Two passes.
set -u
OUT=/tmp/ab_results.jsonl
: > $OUT
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
export SPARK_GRAFT_CPUS=32
for pass in 1 2; do
  for arm in "r11 always /root/r11" "head cond /root/repo" "head always /root/repo"; do
    set -- $arm
    label=$1_p$pass; gc=$2; tree=$3
    echo "=== $label gc=$gc tree=$tree $(date +%H:%M:%S) ===" >> /tmp/ab_run.log
    PYTHONPATH=$tree python /tmp/ab_probe.py "$label" "$gc" 1 \
      >> $OUT 2>> /tmp/ab_run.log
  done
done
echo "AB DONE $(date)" >> /tmp/ab_run.log
