"""The ray-job-submit-shaped CLI: fresh run writes all buckets; a rerun
resumes (skips every manifested bucket); --no-resume rewrites."""

from __future__ import annotations

import json
import subprocess
import sys


def _run(out_dir, *extra):
    r = subprocess.run(
        [sys.executable, "-m", "prlib_ray.runner",
         "--sf-dir", "/root/testdata/sf0.001", "--out", str(out_dir),
         "--num-buckets", "4", *extra],
        capture_output=True, text=True, timeout=600, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    return json.loads(r.stdout.strip().splitlines()[-1])


def test_runner_writes_then_resumes(tmp_path):
    out = tmp_path / "extract_out"
    first = _run(out)
    assert first["buckets_written"] == 4
    assert first["buckets_skipped"] == []
    assert first["rows"] > 0

    second = _run(out)
    assert second["buckets_written"] == 0
    assert sorted(second["buckets_skipped"]) == [0, 1, 2, 3]

    third = _run(out, "--no-resume")
    assert third["buckets_written"] == 4
    assert third["rows"] == first["rows"]
