#!/bin/bash
# Round-5 TPU protocol batch queue (sequential: single chip).
#
# VERDICT r4 items, in priority order:
#   #1/#2  regenerate the tainted DragonScene k>=4 ladder under the fixed
#          midpoint/expand=3.1 config AND complete it (k=6 hybrid, all of
#          k=7 at the 2,097,120 cap), 2 runs
#   #6     DragonsScene + SphereScene protocol artifacts (k=0..2, 2 runs)
#   #7     accuracy ensemble extended to k=3,4
#   #5     bunny headline rows k=5..7 at the reference's 6 runs
#          (k=7 first -- the reference cap is the headline row)
#
# One stage per (scene, k): artifacts merge into benchmarks/artifacts/
# as each stage lands, so a deadline kill loses at most the in-flight k.
set -u
cd /root/repo
ART=benchmarks/artifacts/protocol
LOG=/tmp/r5_queue
mkdir -p $LOG

stage() {  # stage <name> <cmd...>
  local name=$1; shift
  echo "=== $name start $(date -u '+%H:%M:%S') ===" | tee -a $LOG/queue.log
  "$@" > "$LOG/$name.log" 2>&1
  echo "=== $name exit $? $(date -u '+%H:%M:%S') ===" | tee -a $LOG/queue.log
}

merge_scene() {  # merge_scene <SceneName> <outdir>
  local scene=$1 out=$2
  if [ -f "$ART/protocol_$scene.json" ]; then
    python benchmarks/merge_protocol.py "$ART/protocol_$scene.json" "$out/protocol_$scene.json"
    python benchmarks/merge_summary.py "$ART/summary_$scene.json" "$out/summary_$scene.json"
  else
    cp "$out/protocol_$scene.json" "$ART/"
    cp "$out/summary_$scene.json" "$ART/"
  fi
  python benchmarks/rebuild_aggregates.py "$scene"
  for f in "$out"/results_perf_${scene}_*.csv; do
    [ -e "$f" ] && cp "$f" "$ART/"
  done
  for f in "$out"/results_acc_${scene}_*.csv; do
    [ -e "$f" ] && gzip -f "$f" && cp "$f.gz" "$ART/"
  done
}

dragon_k() {  # dragon_k <k> [extra args]
  local k=$1; shift
  stage "dragon_k$k" python benchmarks/run_reference_protocol.py \
    --scene dragon --k-min "$k" --k-max "$k" --runs 2 "$@" \
    --out "/tmp/r5_dragon_k$k"
  merge_scene DragonScene "/tmp/r5_dragon_k$k" >> $LOG/queue.log 2>&1
}

bunny_k() {  # bunny_k <k>
  local k=$1
  stage "bunny_k$k" python benchmarks/run_reference_protocol.py \
    --scene bunny --k-min "$k" --k-max "$k" --runs 6 --no-accuracy \
    --out "/tmp/r5_bunny_k$k"
  merge_scene BunnyScene "/tmp/r5_bunny_k$k" >> $LOG/queue.log 2>&1
}

# --- 1. dragon regen + completion (k=4 keeps the 262k accuracy CSV)
dragon_k 4
dragon_k 5 --no-accuracy
dragon_k 6 --no-accuracy
dragon_k 7 --no-accuracy

# --- 2. the two remaining reference scenes
stage dragons_k02 python benchmarks/run_reference_protocol.py \
  --scene dragons --k-min 0 --k-max 2 --runs 2 --out /tmp/r5_dragons
merge_scene DragonsScene /tmp/r5_dragons >> $LOG/queue.log 2>&1

stage sphere_k02 python benchmarks/run_reference_protocol.py \
  --scene sphere --k-min 0 --k-max 2 --runs 2 --out /tmp/r5_sphere
merge_scene SphereScene /tmp/r5_sphere >> $LOG/queue.log 2>&1

# --- 3. accuracy ensemble k=3,4 (merged into the committed k=2 artifact)
stage ensemble_k34 python benchmarks/study_accuracy_ensemble.py \
  --ks 3,4 --seeds 10 --out /tmp/r5_ensemble_k34.json
python benchmarks/merge_ensemble.py benchmarks/artifacts/ensemble_accuracy.json \
  /tmp/r5_ensemble_k34.json >> $LOG/queue.log 2>&1

# --- 4. bunny headline rows at the reference's 6 runs (full regen under
#        the current config so run variance is config-homogeneous)
bunny_k 7
bunny_k 6
bunny_k 5

echo "=== queue done $(date -u '+%H:%M:%S') ===" | tee -a $LOG/queue.log
