#!/bin/bash
# Round-11 sf100 gate queue (VERDICT r10 item 8):
#   1. the carried-over retry: sql_recursive_hierarchy at sf100 with the
#      a948a4e rowcount-derived cteRecursionRowLimit (the round-10 retry
#      never ran — the FAIL in SF100_GATE_r10.log is the pre-fix attempt);
#   2. first sf100 value coverage for the graph family, now that the r10
#      cuts made LPA/CC 2.1-2.4x faster at sf1 and r11 proved per-round
#      cost flat (scripts/r11_graph_rounds.py).
# Plain-pgrep waits per ADVICE r9; fresh JVM per query per VERDICT r7.
set -u
cd "$(dirname "$0")/.."
LOG=docs/SF100_GATE_r11.log

while pgrep -f "gen_scale_data.py /root/repo/.scale" >/dev/null; do
  sleep 60
done
while pgrep -f "python bench.py" >/dev/null; do
  sleep 60
done

echo "# round-11 sf100 gate queue started $(date -u +%H:%M:%S)" >> "$LOG"
python scripts/gate_fresh_jvm.py /root/repo/.scale/sf100 --timeout 3600 \
  --log "$LOG" \
  --only sql_recursive_hierarchy,graph_connected_components_dupes,graph_label_propagation,graph_bfs_distance,pagerank_customer_handoff
echo "# round-11 sf100 gate queue done $(date -u +%H:%M:%S)" >> "$LOG"
