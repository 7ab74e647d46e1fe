"""Training engine: loss, optimisers, schedulers, trainer (layer L5).

ref: lib/core/ (loss.py, trainer.py, config.py), train.py.
"""
