"""Driver-contract tests: __graft_entry__.entry() must stay jittable and
dryrun_multichip must compile+run real shardings on the virtual mesh."""

import sys

import jax
import pytest

sys.path.insert(0, "/root/repo")
import __graft_entry__ as ge  # noqa: E402


class TestGraftEntry:
    def test_entry_compiles(self):
        fn, args = ge.entry()
        out = jax.eval_shape(jax.jit(fn), *args)
        assert out[0].shape == (8, 1000)

    def test_dryrun_multichip(self, capsys):
        ge.dryrun_multichip(8)
        assert "OK" in capsys.readouterr().out
