"""Scaling-record tripwire (VERDICT r04 "Next #8").

The north-rule N->4N scaling measurement is only meaningful when each half runs
long enough to dominate Spark fixed costs and host noise — the r04 driver
artifact regressed below 0.8 exactly because the flagship got fast enough that
the local[16] half shrank to ~3.2 s of mostly-constant cost. This test runs the
REAL local[16] scaling half (bench.py --worker 16 --scale) and fails if its
timed overlay wall drops below the floor, so a future flagship speedup can't
silently shrink the measurement back into the noise floor; the fix when it
fires is to raise SPARK_GRAFT_SCALE_REPS's default in bench.py.

Host noise only ever INFLATES wall-clock on this box (see bench.py's
measurement-model comment), so a lower-bound assert cannot flake slow-side.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

FLOOR_SEC = 8.0


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="sf0.1 testdata not present")
def test_local16_scaling_half_exceeds_noise_floor():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--worker", "16", "--scale"],
        capture_output=True,
        text=True,
        cwd=REPO,
        env={**os.environ, "SPARK_GRAFT_SF_DIR": SF_DIR},
        timeout=600,
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("WORKER_JSON:")]
    assert lines, f"scale worker failed:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    res = json.loads(lines[0][len("WORKER_JSON:"):])
    assert res["queries"]["overlay"] >= FLOOR_SEC, (
        f"local[16] scaling half ran {res['queries']['overlay']} s < {FLOOR_SEC} s "
        "floor — the scaling workload is under-sized for this engine speed; "
        "raise SPARK_GRAFT_SCALE_REPS's default in bench.py"
    )
