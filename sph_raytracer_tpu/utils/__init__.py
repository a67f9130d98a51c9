"""Utility subsystems: checkpointing, debug tracing, profiling."""
from .checkpoint import load_checkpoint, save_checkpoint
from .debug import debug_trace, format_trace
from . import profiling

__all__ = ["save_checkpoint", "load_checkpoint", "debug_trace",
           "format_trace", "profiling"]
