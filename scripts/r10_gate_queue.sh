#!/bin/bash
# Round-10 sf100 value-gate queue.
#
# Order of business (VERDICT r9 #1/#5 + this round's rotation):
#   0. wait for the .scale regeneration chain to finish (the data dirs
#      were wiped between rounds);
#   1. sf1 supplemental for the probe-touched query: semdedup under the
#      NEW two-arm probe (below 250k embeddings the probe is the full
#      query + full oracle, wrapped with the arm column on both sides);
#   2. the LAST sf100 value gap: semdedup_embedding_prune via the
#      two-arm probe (assign arm full-scale-exact, subset arm
#      engine-on-subset — the oracle is linear on both arms, so the
#      2B-row cross product that OOM-killed rounds 8/9 never forms);
#   3. sf100 value rows for the graded tail that has never been
#      attempted at sf100 (VERDICT r9 #5) — all bounded-output;
#   4. sf100 value rows for this round's first-graded window entries.
#
# ADVICE r9: the round-9 wait loop piped pgrep through `grep -qv $$`,
# which treats the shell PID as a substring regex over PID lines and can
# mask a live gate; this script's own cmdline can never match the -f
# patterns below, so plain pgrep is the correct wait.
set -u
cd /root/repo
LOG=docs/SF100_GATE_r10.log

while pgrep -f "gen_scale_data.py /root/repo/.scale" >/dev/null; do
  sleep 60
done
while pgrep -f "gate_fresh_jvm.py /root/repo/.scale/sf100" >/dev/null; do
  sleep 60
done

echo "# round-10 sf100 gate queue started $(date -u +%H:%M:%S)" >> "$LOG"

# 1. sf1 supplemental (probe-touched): full-fidelity small arm
python scripts/sf1_gate.py /root/repo/.scale/sf1 --timeout 900 \
  --only semdedup_embedding_prune \
  >> docs/SF1_GATE_r10.log 2>&1

# 2. the last sf100 value gap
python scripts/gate_fresh_jvm.py /root/repo/.scale/sf100 --timeout 3600 \
  --log "$LOG" --only semdedup_embedding_prune

# 3. never-attempted graded tail (bounded outputs, standard envelope)
python scripts/gate_fresh_jvm.py /root/repo/.scale/sf100 --timeout 2400 \
  --log "$LOG" \
  --only sql_recursive_hierarchy,graph_bfs_distance,graph_label_propagation,graph_connected_components_dupes,funnel_view_click_purchase,bitmap_week_overlap,mix_to_token_budget,governance_erasure_propagation

# 4. this round's first-graded window entries
python scripts/gate_fresh_jvm.py /root/repo/.scale/sf100 --timeout 2400 \
  --log "$LOG" \
  --only medallion_orders_pipeline,cogroup_view_click_pairs,decontaminate_ngram_overlap,dq_orders_report,layout_partition_pruning,pack_token_batches,text_tfidf_top_terms,sample_stratified_events,streaming_dedup_events

echo "# round-10 sf100 gate queue done $(date -u +%H:%M:%S)" >> "$LOG"
