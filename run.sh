#!/usr/bin/env bash
# Three-stage avatar generation, mirroring the reference's run.sh flow
# (reference: run.sh:1-25) without its config-file mutation: the stage is
# passed explicitly and progress lives in logs/<cur_time>/run.json.
#
# Usage: ./run.sh [prompt] [face_image] [extra launch.py args...]
set -euo pipefail

PROMPT="${1:-Audrey Hepburn wearing a tailored blazer, a shirt underneath, straight-cut trousers, and low-heeled shoes.}"
FACE="${2:-assets/audrey.png}"
shift 2 2>/dev/null || true
CUR_TIME="$(date +%Y%m%d-%H%M%S)"

echo "[run.sh] run id: ${CUR_TIME}"

# stage 1: AHDS optimization (2400 steps)
python launch.py --config configs/exp.yaml --train --cur_time "${CUR_TIME}" \
  --stage stage1 \
  system.prompt_processor.prompt="${PROMPT}" \
  system.guidance.pil_image_faceid_path="${FACE}" "$@"

# stage 2: VCR multi-view refinement (32 views x 8 DDIM steps)
python launch.py --config configs/exp.yaml --cur_time "${CUR_TIME}" \
  --stage stage2 \
  system.prompt_processor.prompt="${PROMPT}" \
  system.guidance.pil_image_faceid_path="${FACE}" "$@"

# stage 3: reconstruction against the refined views (800 steps)
python launch.py --config configs/exp.yaml --train --cur_time "${CUR_TIME}" \
  --stage stage3 trainer.max_steps=800 \
  system.prompt_processor.prompt="${PROMPT}" "$@"

echo "[run.sh] done: logs/${CUR_TIME}/save/last.ply"
