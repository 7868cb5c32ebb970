"""Driver-contract tests: entry() compiles single-chip; dryrun_multichip
runs a full sharded train step on the virtual 8-device mesh."""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import pytest


class TestGraftEntry:
    def test_entry_compiles_and_runs(self):
        import __graft_entry__ as ge

        fn, args = ge.entry()
        out = jax.jit(fn)(*args)
        log_probs, frame_mask = out
        assert log_probs.shape[0] == args[0].shape[0]
        assert frame_mask.dtype == jax.numpy.bool_

    def test_dryrun_multichip_8(self, eight_devices):
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)  # asserts internally (finite loss, step==1)

    def test_dryrun_multichip_2(self, eight_devices):
        import __graft_entry__ as ge

        ge.dryrun_multichip(2)
