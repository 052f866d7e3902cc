"""Driver-contract checks for __graft_entry__ (entry compiles; dryrun runs)."""

import sys


def test_dryrun_multichip_four_devices():
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(4)


def test_entry_traces():
    """entry() must at least abstractly trace (full compile is the driver's
    single-chip check; tracing catches shape/dtype breakage cheaply)."""
    sys.path.insert(0, "/root/repo")
    import jax

    from __graft_entry__ import entry

    fn, args = entry()
    out = jax.eval_shape(fn, *args)
    assert out.shape == (4, 3)
