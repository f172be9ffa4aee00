"""Driver-interface regression tests: entry() and dryrun_multichip must
always compile and run."""

import jax
import numpy as np


def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    out = np.asarray(out)
    assert out.shape == (848, 480, 3) and out.dtype == np.uint8
    assert (out.sum(-1) > 0).mean() > 0.3


def test_dryrun_multichip_small():
    import __graft_entry__ as g

    g.dryrun_multichip(4)
