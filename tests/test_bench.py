"""The driver-facing benchmark artifact must always emit one valid JSON
line with the expected schema (worker mode; CPU, tiny config)."""

import json
import os
import subprocess
import sys


def test_bench_worker_json_schema():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    r = subprocess.run(
        [sys.executable, os.path.join(root, "bench.py"),
         "--cpu", "--nside", "16", "--nfreq", "4",
         "--repeats", "1", "--fchunk", "4"],
        # 900 s: the cold-cache table build is ~15 s alone but this 1-core
        # box is routinely oversubscribed (concurrent TPU benches, virtual
        # 8-device CPU meshes) — the timeout must survive ~10x contention.
        capture_output=True, text=True, timeout=900, cwd=root, env=env,
    )
    assert r.returncode == 0, r.stderr[-800:]
    lines = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
    assert len(lines) == 1, r.stdout
    rec = json.loads(lines[0])
    assert {"metric", "value", "unit", "vs_baseline"} <= set(rec)
    assert rec["unit"] == "s" and rec["value"] > 0
    assert "Nside=16" in rec["metric"]
    # MFU/FLOP reporting (VERDICT r1 item 10)
    assert rec["flops"] > 0 and rec["tflops"] >= 0
    assert rec["flops_source"] in ("xla", "analytic")
