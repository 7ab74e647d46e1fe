#!/usr/bin/env bash
# Generate pseudo-theta files for every DB variant
# (ref: scripts/prepare_pseudo_thetas.sh drives pseudo_theta.py over 18 DBs).
set -euo pipefail
for name in 3dpw_train 3dpw_train_occ 3dpw_val 3dpw_test 3dpw_test_all \
            mpii3d_train_scale12 mpii3d_train_scale12_occ \
            mpii3d_train_scale12_new_occ mpii3d_train_scale1 \
            mpii3d_val_scale12 posetrack_train posetrack_train_occ \
            insta_train pennaction_train_scale12 \
            h36m_train_25fps_tight h36m_train_25fps h36m_train_25fps_occ \
            h36m_test_25fps h36m_test_front_25fps_tight; do
  if [ -f "${TEPOSE_DB_DIR:-data/preprocessed_data}/${name}_db.pt" ] || \
     [ -f "${TEPOSE_DB_DIR:-data/preprocessed_data}/${name}_db.h5" ]; then
    python tools/preprocess/pseudo_theta.py --file_name "$name"
  fi
done
