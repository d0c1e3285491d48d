"""Driver-contract smoke for __graft_entry__.py.

The driver compile-checks entry() single-chip and runs dryrun_multichip(n)
on n virtual CPU devices; neither had regression coverage (round 2's
headline artifact broke exactly because the shipped file had none — see
tests/test_bench_smoke.py for the bench half of the contract).

entry()'s full-size I3D compile is exercised by the driver itself (and is
too slow for CPU CI), so here we check its contract shape only: it must
return a jit-traceable callable and matching example args without running
any computation.  dryrun_multichip is run for real at n=8 (the same
virtual-device count the driver uses) — it covers the sharded train step,
member×data ensemble forward/training, HBM-resident gather training,
temporal-halo inference/training, and sharded ragged-wire ingest.
"""

import os
import sys

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as graft


def test_entry_contract_shape():
    fn, example_args = graft.entry()
    assert callable(fn)
    variables, rgb = example_args
    assert rgb.shape == (2, 20, 224, 224, 3)
    # the driver jits this; tracing must at least produce a ClosedJaxpr
    # with abstract inputs (no FLOPs spent on CPU CI)
    jaxpr = jax.make_jaxpr(fn)(
        jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), variables),
        jax.ShapeDtypeStruct(rgb.shape, rgb.dtype),
    )
    assert jaxpr.out_avals[0].shape == (2, 11)


def test_dryrun_multichip_8_devices(capsys):
    graft.dryrun_multichip(8)
    assert "dryrun_multichip(8): ok" in capsys.readouterr().out
