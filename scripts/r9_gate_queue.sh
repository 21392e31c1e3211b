#!/bin/bash
# Round-9 sf100 value-gate queue: waits for the round-8 gate process to
# release the box, then runs the seven remaining curve queries serially
# through the fresh-JVM runner (the four new scale-aware probes, the two
# rows-only LSH/IVF variants for explicit NOOP visibility, and the
# semdedup solo retry with the 3600 s budget the r8 log promised).
set -u
cd /root/repo
LOG=docs/SF100_GATE_r09.log
# wait for any running sf100 gate (the r8 tail) to exit
while pgrep -f "gate_fresh_jvm.py /root/repo/.scale/sf100" | grep -qv $$; do
  sleep 60
done
echo "# round-9 sf100 gate queue started $(date -u +%H:%M:%S)" >> "$LOG"
python scripts/gate_fresh_jvm.py /root/repo/.scale/sf100 --timeout 2400 \
  --log "$LOG" \
  --only window_running_sum,scd2_customer_priority,text_collocations_lift,dedup_span_scrub,dedup_minhash_lsh,embedding_neardup_topk_ivf
python scripts/gate_fresh_jvm.py /root/repo/.scale/sf100 --timeout 3600 \
  --log "$LOG" \
  --only semdedup_embedding_prune
echo "# round-9 sf100 gate queue done $(date -u +%H:%M:%S)" >> "$LOG"
