#!/bin/bash
# Round-5 TPU-outage recovery chain: probe the tunneled chip every 2 min;
# when it answers, (1) warm the bench compile cache for the driver's
# end-of-round run — the highest-priority item, (2) run the remaining
# attribution isolation arms at seed 1, (3) run the label-starved
# confirmation finetunes.
set -u
cd "$(dirname "$0")/.."
while true; do
  if timeout 120 python -c "import jax, jax.numpy as jnp; print(float((jnp.ones((128,128))@jnp.ones((128,128))).sum()))" >/dev/null 2>&1; then
    break
  fi
  sleep 120
done
echo "TPU back at $(date -u)"
bash tools/warm_bench_cache.sh > artifacts/r5/warm_cache.log 2>&1
echo "cache warm done at $(date -u), exit $?"
python tools/run_attribution_ab.py --dir /tmp/attr_n3 --platform tpu \
  --seeds 1 --arms init_proj_kernel init_proj_bias ref_like \
  >> artifacts/r5/attribution_projsplit.log 2>&1
echo "proj-split/ref_like done at $(date -u), exit $?"
python tools/run_label_starved.py --dir /tmp/attr_n3 \
  --keys control_s1_tpu torch_init_s1_tpu ragged_tail_s1_tpu \
  > artifacts/r5/label_starved.log 2>&1
echo "label-starved done at $(date -u), exit $?"
