#!/bin/bash
# Round-5 linear-in-corpus measurement (VERDICT r4 #1): constant-density
# pipeline at 2.5M/10M/25M sites, 8 and 32 cores, sequential (never two
# Spark timing procs at once).
cd /root/repo
for pass in 1 2; do
  for cores in 32 8; do
    for n in 2500000 10000000 25000000; do
      echo "=== pass=$pass cores=$cores n=$n $(date -u +%H:%M:%S)" >> density_r5.log
      sbt -batch "runMain graft.tools.ScaleRehearsal density $cores $n" 2>&1 \
        | grep -E "DENSITY|error|Exception" >> density_r5.log
    done
  done
done
echo "SWEEP DONE $(date -u +%H:%M:%S)" >> density_r5.log
