#!/bin/bash
# Round-10 follow-up: retry sql_recursive_hierarchy at sf100 after the
# main queue releases the box (the first attempt hit Spark's default 1M
# recursion row limit; the query now sizes the guard from the customer
# rowcount). Plain-pgrep wait per ADVICE r9.
set -u
cd /root/repo
while pgrep -f "r10_gate_queue.sh" >/dev/null; do sleep 60; done
while pgrep -f "gate_fresh_jvm.py /root/repo/.scale/sf100" >/dev/null; do sleep 60; done
echo "# round-10 retry (recursion row-limit fix) $(date -u +%H:%M:%S)" >> docs/SF100_GATE_r10.log
python scripts/gate_fresh_jvm.py /root/repo/.scale/sf100 --timeout 2400 \
  --log docs/SF100_GATE_r10.log --only sql_recursive_hierarchy
echo "# round-10 retry done $(date -u +%H:%M:%S)" >> docs/SF100_GATE_r10.log
