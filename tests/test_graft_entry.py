"""Driver-contract tests for __graft_entry__."""

import os
import sys

import pytest

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dryrun_multichip_8():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_entry_returns_jittable():
    """entry() must return (fn, args) that at least trace/abstract-eval."""
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out_shape = jax.eval_shape(fn, *args)
    assert out_shape.shape == (4, 256, 256, 4)
