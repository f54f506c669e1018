#!/usr/bin/env bash
# One-command setup: fresh clone -> running mini training.
#
# Parity with the reference's setup.sh (reference: setup.sh:1-13, which
# provisions a conda env and downloads the Kaggle dataset); this script is the
# executable form of setup.md. Steps:
#   1. install the package (editable) into the current python env
#   2. build the optional native tier (libasrtpu.so) — non-fatal on failure
#   3. acquire data: kaggle download if credentials exist, else generate the
#      synthetic corpus with the same layout
#   4. smoke-run a mini training (2 epochs, micro model) to prove the stack
#
# Usage:  ./setup.sh [--data-dir DIR] [--skip-smoke]
set -euo pipefail
cd "$(dirname "$0")"

DATA_DIR="data"
SKIP_SMOKE=0
while [[ $# -gt 0 ]]; do
    case "$1" in
        --data-dir) DATA_DIR="$2"; shift 2 ;;
        --skip-smoke) SKIP_SMOKE=1; shift ;;
        *) echo "unknown arg: $1" >&2; exit 2 ;;
    esac
done

echo "== 1/4 installing package =="
python -m pip install -e . --quiet

echo "== 2/4 building native tier (optional) =="
if command -v make >/dev/null && command -v g++ >/dev/null; then
    make -C native || echo "native build failed — pure-Python fallbacks engage"
else
    echo "make/g++ not found — pure-Python fallbacks engage"
fi

echo "== 3/4 acquiring data =="
if [[ -d "$DATA_DIR/train-clean-100/mfcc" ]]; then
    echo "dataset already present at $DATA_DIR"
elif command -v kaggle >/dev/null && [[ -f "$HOME/.kaggle/kaggle.json" ]]; then
    kaggle competitions download -c 11-785-f22-hw4p2 -p "$DATA_DIR"
    unzip -qo "$DATA_DIR"/11-785-f22-hw4p2.zip -d "$DATA_DIR"
else
    echo "no kaggle credentials — generating the synthetic corpus instead"
    python tools/make_synthetic_data.py --out-dir "$DATA_DIR"
fi

if [[ "$SKIP_SMOKE" == 1 ]]; then
    echo "== 4/4 skipped (--skip-smoke) =="
    exit 0
fi

echo "== 4/4 mini training smoke (2 epochs, micro model) =="
SMOKE_CFG="$(mktemp /tmp/tpu-las-smoke-XXXX.yml)"
python - "$DATA_DIR" "$SMOKE_CFG" <<'EOF'
import sys, yaml
data_dir, out = sys.argv[1], sys.argv[2]
cfg = yaml.safe_load(open("configs/mini-las.yml"))
cfg["TRN_FOLDER"] = f"{data_dir}/train-clean-100"
cfg["DEV_FOLDER"] = f"{data_dir}/dev-clean"
cfg["TST_FOLDER"] = f"{data_dir}/test-clean"
cfg["EXP_FOLDER"] = "experiments/setup-smoke"
cfg["MST_FOLDER"] = "experiments/setup-smoke/milestones"
cfg["epochs"] = 2
yaml.safe_dump(cfg, open(out, "w"))
print(f"smoke config -> {out}")
EOF
python -m attention_based_e2e_asr_dnn_tpu.train -c "$SMOKE_CFG"
echo "setup complete — artifacts in experiments/setup-smoke/"
