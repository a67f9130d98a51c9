"""Driver entry-point checks: entry() compiles single-device; the
multi-chip dry run executes a full sharded training step on fake devices."""
import sys

import jax
import numpy as np


def _graft():
    import importlib.util
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "__graft_entry__.py",
    )
    spec = importlib.util.spec_from_file_location("__graft_entry__", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_compiles():
    ge = _graft()
    fn, args = ge.entry()
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    out = compiled(*args)
    assert np.isfinite(np.asarray(out)).all()


def test_dryrun_multichip():
    ge = _graft()
    ge.dryrun_multichip(8)
