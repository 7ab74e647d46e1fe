"""Shared utilities: logging, metric writing, experiment dirs, timers.

ref: lib/utils/utils.py.
"""
