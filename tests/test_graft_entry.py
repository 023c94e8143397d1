"""Driver-contract tests for __graft_entry__."""

import sys

sys.path.insert(0, "/root/repo")

import __graft_entry__ as graft


class TestEntry:
    def test_entry_returns_jittable(self):
        import jax

        fn, args = graft.entry()
        scores, idx = jax.jit(fn)(*args)
        assert scores.shape == (8, 10)
        assert idx.shape == (8, 10)


class TestDryrun:
    def test_dryrun_on_virtual_mesh(self, capsys):
        graft.dryrun_multichip(8)
        assert "dryrun_multichip OK" in capsys.readouterr().out

    def test_dryrun_odd_device_count(self, capsys):
        graft.dryrun_multichip(4)
        assert "dryrun_multichip OK" in capsys.readouterr().out
