"""Driver entry points stay importable and runnable on the CPU mesh."""

import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, "/root/repo")


def test_entry_compiles_and_runs():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    img = jax.jit(fn)(*args)
    assert img.shape == (128, 128)
    assert np.isfinite(np.array(img)).all()
    assert float(img.sum()) > 0


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_dryrun_multichip():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)
