#!/bin/bash
# Sample /proc/stat CPU-steal (and idle) every INTERVAL seconds into a CSV.
# Usage: tools/steal_sample.sh <outfile> [interval_sec]
# Columns: epoch_sec, steal_ticks_delta, idle_ticks_delta, total_ticks_delta,
#          steal_cores (delta-steal scaled to cores), load1
# A "quiet window" = steal_cores persistently < ~1 of 32.
out="${1:?usage: steal_sample.sh <outfile> [interval]}"
int="${2:-5}"
echo "epoch,steal_d,idle_d,total_d,steal_cores,load1" > "$out"
prev=($(awk '/^cpu /{print $2+$3+$4+$5+$6+$7+$8+$9, $9, $5}' /proc/stat))
while true; do
  sleep "$int"
  cur=($(awk '/^cpu /{print $2+$3+$4+$5+$6+$7+$8+$9, $9, $5}' /proc/stat))
  td=$((cur[0]-prev[0])); sd=$((cur[1]-prev[1])); id=$((cur[2]-prev[2]))
  load=$(cut -d' ' -f1 /proc/loadavg)
  cores=$(awk -v s="$sd" -v i="$int" 'BEGIN{printf "%.2f", s/(i*100)}')
  echo "$(date +%s),$sd,$id,$td,$cores,$load" >> "$out"
  prev=("${cur[@]}")
done
