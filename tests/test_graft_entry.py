"""Guard the driver entry points: entry() traces and dryrun_multichip
compiles+runs the full sharded training step on the 8-device CPU mesh."""

import jax


def test_entry_traces():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.eval_shape(fn, *args)
    assert out.shape[-3:] == (1024, 1024, 3)


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
