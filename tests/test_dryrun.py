"""Multi-chip dry run: full training step jitted over an 8-device CPU mesh
(batch sharded over `data`, params replicated, XLA-inserted collectives) —
what the driver's dryrun_multichip check exercises."""
import jax
import pytest


def test_dryrun_multichip_8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices (see conftest XLA_FLAGS)")
    import __graft_entry__ as G
    G.dryrun_multichip(8)


def test_entry_compiles():
    """Single-chip entry(): abstract-trace only (full 256px compile on CPU is
    too slow for unit tests; the driver compile-checks on TPU)."""
    import __graft_entry__ as G
    fn, args = G.entry()
    shape = jax.eval_shape(fn, *args)
    assert shape.shape == (2, 256, 256, 3)
