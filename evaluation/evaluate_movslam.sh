#!/usr/bin/env bash
# Run the mono pipeline on a stream and score it against ground truth.
# Equivalent of /root/reference/evaluation/evaluate_movslam.sh:
#   evaluate_movslam.sh <settings.yaml> <stream> <gt_file> <out_dir>
set -euo pipefail
SETTINGS=$1
STREAM=$2
GT=$3
OUT=${4:-eval_out}
mkdir -p "$OUT"
cd "$OUT"
python "$(dirname "$0")/../apps/mono_video_tartan.py" "$SETTINGS" "$STREAM"
python "$(dirname "$0")/evaluator.py" "$GT" TrajectoryKITTIKeyFrame.txt --fmt kitti --plot results.png | tee eval.json
cp results.txt eval_results.txt 2>/dev/null || true
