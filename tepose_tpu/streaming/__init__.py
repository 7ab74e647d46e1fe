"""Streaming inference: video IO, person tracking, the live-stream engine
(layer L6/L7 for demo.py).

ref: demo.py, lib/utils/demo_utils.py, lib/utils/pose_tracker.py, the
external multi-person-tracker/yolo dependencies.
"""
