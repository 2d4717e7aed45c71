"""Driver entry points (__graft_entry__.py) on the virtual CPU mesh."""

import os
import sys

import jax
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __graft_entry__ as graft  # noqa: E402


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    params, opt_state, loss = out
    assert float(loss) > 0


def test_dryrun_multichip_8(capsys):
    graft.dryrun_multichip(8)
    out = capsys.readouterr().out
    assert "dryrun_multichip OK" in out
    assert "2d-mesh" in out


def test_dryrun_multichip_2():
    graft.dryrun_multichip(2)  # no 2D-mesh leg below 4 devices
