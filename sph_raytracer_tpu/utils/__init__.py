"""Utility subsystems: checkpointing, debug tracing, profiling, AOT
serving export."""
from .checkpoint import load_checkpoint, save_checkpoint
from .debug import debug_trace, format_trace
from .export import export_operator, load_exported
from . import profiling

__all__ = ["save_checkpoint", "load_checkpoint", "debug_trace",
           "format_trace", "profiling", "export_operator", "load_exported"]
