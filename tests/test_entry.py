"""Driver entry points compile and run (CPU fabric)."""

import jax


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    state, diag = out
    assert int(diag.map_voxels) > 0


def test_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
