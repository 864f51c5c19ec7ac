#!/usr/bin/env bash
# Full-pipeline smoke on real hardware: synthetic corpus -> preprocess
# (native C++ DSP backend, no device needed) -> train.py on the attached
# accelerator (~180 steps, checkpoints + TensorBoard + alignment images)
# -> synthesis.py from the trained checkpoint -> static sample gallery.
#
# Usage: bash tools/smoke_e2e.sh [workdir]   (default /tmp/dv3_smoke)
# Exercises the real CLIs end to end; expect a few minutes of first-run
# compile. Verified on 1x TPU v5e (loss 2.0 -> ~0.48 over 180 steps).
set -euo pipefail
cd "$(dirname "$0")/.."
WORK="${1:-/tmp/dv3_smoke}"
PRESET=presets/deepvoice3_ljspeech.json
rm -rf "$WORK"; mkdir -p "$WORK"

python - "$WORK" <<'EOF'
import sys, os
sys.path.insert(0, "tests")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
from test_end_to_end import _make_fake_ljspeech
_make_fake_ljspeech(os.path.join(sys.argv[1], "corpus"), n=24)
EOF

DV3_PREPROCESS_BACKEND=native python preprocess.py ljspeech \
    "$WORK/corpus" "$WORK/data" --preset=$PRESET

python train.py --data-root="$WORK/data" --preset=$PRESET \
    --checkpoint-dir="$WORK/ckpt" --log-event-path="$WORK/log" \
    --hparams="batch_size=8,nepochs=60,checkpoint_interval=90,eval_interval=1000000"

printf "hello world.\nthe quick brown fox jumps over the lazy dog.\n" \
    > "$WORK/sentences.txt"
python synthesis.py "$WORK/ckpt/checkpoint_step000000180.ckpt" \
    "$WORK/sentences.txt" "$WORK/out" --preset=$PRESET \
    --max-decoder-steps=60 --output-html

python docs/build_gallery.py "$WORK/site" \
    --section "Smoke model (180 steps)" "$WORK/out"

echo "OK: $WORK/site/index.html"
