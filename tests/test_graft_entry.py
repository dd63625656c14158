"""Driver contract: dryrun_multichip compiles + runs on the virtual CPU mesh."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def test_dryrun_multichip_8():
    import jax

    assert len(jax.devices()) >= 8
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_builds():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    # don't run the full-size model on CPU; just check abstract eval traces
    import jax

    jax.eval_shape(fn, *args)
