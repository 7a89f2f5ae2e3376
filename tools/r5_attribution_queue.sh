#!/bin/bash
# Round-5 attribution queue (VERDICT item 1): completes the 4 main arms to
# >=3 seeds, then runs the new isolation arms (init sub-components, Python
# aug draws, ragged tail) at 2 seeds. Strictly sequential — one TPU chip.
# Results accumulate in artifacts/attribution_ab.json (runner skips done keys).
set -u
cd "$(dirname "$0")/.."
DATA=/tmp/attr_n3
if [ ! -f "$DATA/run/data/MOD.yaml" ]; then
  python tools/make_parity_dataset.py --out "$DATA" --samples 384 --noise 3.0
fi
# Phase A: main arms at seeds 2,3 (seed-1 results exist; runner skips those)
python tools/run_attribution_ab.py --dir "$DATA" --platform tpu \
  --seeds 2 3 --arms control torch_init ref_lr both
# Phase B: isolation arms, seed 1 then seed 2
python tools/run_attribution_ab.py --dir "$DATA" --platform tpu \
  --seeds 1 2 --arms init_conv init_gru init_proj ragged_tail py_draws
