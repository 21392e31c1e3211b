"""Pytest wrappers for the standing scale gates (VERDICT r3 #8).

`pytest tests/` excludes these by default (pytest.ini deselects the
`scale` marker); run them explicitly after touching any oracle:

    python -m pytest -m scale tests/test_scale_gates.py -q

They share the exact code paths of the CLI scripts, so there is one
implementation to trust.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, "/root/repo/scripts")

SF1_DIR = "/root/repo/.scale/sf1"


@pytest.mark.scale
def test_knife_edge_sweep_driver_scales():
    from knife_edge_sweep import FLOAT_SIG, sweep

    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        flagged = sweep(sf_dir)
        assert not flagged, [
            f"{n}.{c} = {v!r} ({format(v, FLOAT_SIG)})" for n, c, v in flagged
        ]


@pytest.mark.scale
def test_sf1_gate_all_green_zero_skips(spark):
    if not os.path.isdir(SF1_DIR):
        pytest.skip(
            f"{SF1_DIR} missing - run scripts/gen_scale_data.py first"
        )
    from sf1_gate import run_gate

    fails, skips, total = run_gate(SF1_DIR, timeout=600, spark=spark)
    assert total > 0
    assert fails == 0, f"{fails} sf1 oracle mismatches"
    assert skips == 0, f"{skips} watchdog skips (probes should prevent all)"
