#!/bin/bash
# Measure external CPU steal under full load: spin all cores briefly and
# report stolen CPU-seconds vs offered CPU-seconds. A clean window reads
# <2%; the known interference storms read 10-25% (same signal the bench
# artifact's per-level steal_secs fields capture). Usage: tools/steal_probe.sh [secs]
SECS=${1:-4}
N=$(nproc)
S0=$(awk '/^cpu /{print $9}' /proc/stat)
for i in $(seq 1 "$N"); do
  timeout "$SECS" bash -c 'while :; do :; done' >/dev/null 2>&1 &
done
wait >/dev/null 2>&1
S1=$(awk '/^cpu /{print $9}' /proc/stat)
STOLEN=$(( S1 - S0 ))
OFFERED=$(( N * SECS * 100 ))
echo "steal: ${STOLEN} ticks of ${OFFERED} offered ($(( 100 * STOLEN / OFFERED ))%)"
