#!/usr/bin/env bash
# ORB-SLAM3 comparison slot (reference: evaluation/evaluate_orbslam.sh runs
# an ORB-SLAM3 build on the same stream and scores it with the same
# evaluator). No ORB-SLAM3 build ships in this image, so this script scores a
# PRECOMPUTED ORB-SLAM3 trajectory (KITTI keyframe format) against the same
# ground truth with the identical evaluator + plot, producing the
# side-by-side numbers the reference's oracle comparison uses:
#   evaluate_orbslam.sh <gt_file> <orbslam_trajectory.txt> [out_dir]
set -euo pipefail
GT=$1
EST=$2
OUT=${3:-eval_orbslam_out}
mkdir -p "$OUT"
cd "$OUT"
python "$(dirname "$0")/evaluator.py" "$GT" "$EST" --fmt kitti --plot results.png | tee eval.json
