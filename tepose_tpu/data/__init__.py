"""Data pipeline: keypoint formats, chunking, DB readers, loaders (layer L3/L4).

ref: lib/dataset/, lib/data_utils/.
"""
