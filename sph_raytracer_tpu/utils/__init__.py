"""Utility subsystems: checkpointing, debug tracing, profiling."""
from .checkpoint import load_checkpoint, save_checkpoint

__all__ = ["save_checkpoint", "load_checkpoint"]
