#!/bin/bash
# Round-5 TPU queue: runs after the foreground k=6 sweep exits so the
# chip never idles.  Each stage writes into its own tmp dir; merging
# into the committed artifacts happens separately (merge_protocol.py /
# merge_summary.py / merge_ensemble.py) so a partial stage never
# corrupts a committed file.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

K6_PID=$(cat /tmp/k6.pid)
while kill -0 "$K6_PID" 2>/dev/null; do sleep 10; done

T=benchmarks/artifacts/tmp_r5
mkdir -p $T/k7 $T/sphere $T/dragons

# 1. SphereScene k=0..2 x 2 runs (1 camera, tiny mesh -- cheap).
timeout 1200 python benchmarks/run_reference_protocol.py --scene sphere \
  --k-min 0 --k-max 2 --runs 2 --out $T/sphere \
  > $T/sphere.log 2>&1
touch $T/sphere.done

# 2. Accuracy ensemble extension to k=3,4 (N=10 each).
timeout 1800 python benchmarks/study_accuracy_ensemble.py --ks 3,4 \
  --seeds 10 --out $T/ensemble_k34.json \
  > $T/ensemble.log 2>&1
touch $T/ensemble.done

# 3. DragonScene k=7 (the 2,097,120 reference cap), all 3 methods.
timeout 3000 python benchmarks/run_reference_protocol.py --scene dragon \
  --k-min 7 --k-max 7 --runs 1 --no-accuracy --out $T/k7 \
  > $T/k7.log 2>&1
touch $T/k7.done

# 4. DragonsScene k=0..2 x 2 runs (two-dragon collider, ~800k tris).
timeout 2400 python benchmarks/run_reference_protocol.py --scene dragons \
  --k-min 0 --k-max 2 --runs 2 --out $T/dragons \
  > $T/dragons.log 2>&1
touch $T/dragons.done

touch $T/queue.done
