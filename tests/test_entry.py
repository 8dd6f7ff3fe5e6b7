"""The driver contract, exercised the way the driver exercises it.

`scripts/driver_sim.py` runs in a SUBPROCESS so it gets a genuinely
stock SparkSession (default-config local[8] builder) — inside the
pytest process the engine-factory session already exists and
`getOrCreate` would silently hand it back, defeating the point. The
sim smoke-checks `entry()`, pins the first-50 == DRIVER_WINDOW
ordering, and value-compares a representative window sample against
DuckDB at sf0.01 — a hard failure here is a failure the external
driver would record."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_driver_simulation_stock_session():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "driver_sim.py")],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
    )
    out = proc.stdout + "\n" + proc.stderr
    assert proc.returncode == 0, out[-4000:]
    assert "entry():" in proc.stdout
    assert "5/5 OK" in proc.stdout, out[-2000:]
