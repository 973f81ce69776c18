"""The A68a hindcast as a standing regression (VERDICT r3 item 5).

Runs the PAPER's long-run configuration (reference
tests/a68_test/long_run.nml + long_run_for_paper.sh: 432 h at
dt=1800 s, MTS+DEM with per-substep stress fracture, broken-bond
substep contact, short-step grounding, constant-L/W interactions,
mixed melting) over the full 473-element square-packed A68a stand-in
with frozen synthetic forcing (the observational JRA-55/OSCAR/DUACS
files are not redistributable), and anchors the final order-invariant
chksum in tests/golden_a68.json (record-on-first-run, like
golden_scenarios.json).

The run itself prints the reference driver's wall-clock-per-simulated-
day line and writes the a68_hindcast.json artifact.

Substep count: 180 (dtf=10 s).  The paper script's ss=90 (dtf=20 s)
sits above the reference's own stability rule mts_fast_dt =
0.3/sqrt(spring_coef) = 11.7 s and blows up once fracture contacts
appear (TESTING.md round-3 findings).
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN = os.path.join(os.path.dirname(__file__), "golden_a68.json")

pytestmark = pytest.mark.slow


def test_a68_long_run_hindcast(tmp_path):
    data = tmp_path / "data"
    out = tmp_path / "out"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = "/root/.axon_site:" + REPO
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "run_a68.py"),
         "--synthetic", "--long-run", "--hours", "432",
         "--substeps", "180", "--data-dir", str(data), "--out", str(out)],
        env=env, capture_output=True, text=True, timeout=7200)
    assert p.returncode == 0, p.stdout[-3000:] + p.stderr[-2000:]
    assert "s per simulated day" in p.stdout

    with open(out / "a68_hindcast.json") as f:
        art = json.load(f)
    # full-geometry hindcast: 473 square-packed 3 km elements (the
    # reference's outline raster gives 472)
    assert art["elements"] == 473, art
    assert art["hours"] == 432 and art["substeps"] == 180
    # paper outcome: progressive rifting — a substantial share of the
    # 1784 directed bonds fracture, detached fragments melt away, and a
    # substantial core survives (TESTING.md recorded 1476 fractured /
    # 368 survivors with these fixtures)
    assert art["bonds_fractured"] > 200, art
    assert 100 <= art["nbergs_end"] <= art["elements"], art

    # chksum anchor (recorded on first run; guards every later change)
    if os.path.exists(GOLDEN):
        with open(GOLDEN) as f:
            gold = json.load(f)
        assert art["chksum"] == gold["chksum"], (art, gold)
        assert art["nbergs_end"] == gold["nbergs_end"], (art, gold)
    else:
        with open(GOLDEN, "w") as f:
            json.dump({"chksum": art["chksum"],
                       "nbergs_end": art["nbergs_end"],
                       "recorded_s_per_sim_day": art["s_per_sim_day"]},
                      f, indent=1)
