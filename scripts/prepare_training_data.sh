#!/usr/bin/env bash
# Build all training/eval DBs (ref: scripts/prepare_training_data.sh).
# Expects raw datasets under data/ (see tools/preprocess/*.py --help).
set -euo pipefail
python tools/preprocess/amass.py     --dir data/amass
python tools/preprocess/threedpw.py  --dir data/3dpw --set all
python tools/preprocess/mpii3d.py    --dir data/mpi_inf_3dhp --set train
python tools/preprocess/mpii3d.py    --dir data/mpi_inf_3dhp --set val
python tools/preprocess/h36m.py      --dir data/h36m --set train --variant tight
python tools/preprocess/h36m.py      --dir data/h36m --set train --variant occ
python tools/preprocess/posetrack.py --dir data/posetrack --set train
python tools/preprocess/insta.py     --dir data/insta_variety
