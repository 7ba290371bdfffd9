"""Driver-contract guard: __graft_entry__ must stay importable and its
multichip dryrun must compile+run on the virtual CPU mesh."""

import pytest


@pytest.mark.slow
class TestGraftEntry:
    def test_dryrun_multichip_two_devices(self):
        from __graft_entry__ import dryrun_multichip

        dryrun_multichip(2)

    def test_entry_returns_jittable(self):
        import jax

        from __graft_entry__ import entry

        fn, args = entry()
        out = jax.jit(fn)(*args)
        assert out.shape == (8, 83)
