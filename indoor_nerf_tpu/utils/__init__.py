"""Utilities: metrics logging, checkpointing, evaluation, media output."""
