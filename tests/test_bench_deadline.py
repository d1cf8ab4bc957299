"""bench.py driver-proofing (round 4, VERDICT r03 #1): the process must
print ONE parseable JSON line within its deadline no matter what the
tunnel does — BENCH_r03.json was rc=124/parsed:null because the
probe-retry loop outlived the driver's capture timeout with no output.

These tests run bench.py as a real subprocess (the same way the driver
does) with its test hooks faking a dead backend / hung worker, and
assert a parseable line lands on stdout before the deadline.
Reference anchor for the bounded-run discipline:
/root/reference/linux/instrumented_benchmark.cpp:107-142.
"""
import json
import os
import subprocess
import sys
import time
from pathlib import Path

BENCH = Path(__file__).resolve().parent.parent / "bench.py"


def _run(env_extra: dict, timeout: float = 90.0):
    env = dict(os.environ)
    env.update(env_extra)
    t0 = time.monotonic()
    proc = subprocess.run([sys.executable, str(BENCH)],
                          capture_output=True, text=True, env=env,
                          timeout=timeout)
    return proc, time.monotonic() - t0


def _last_json(stdout: str) -> dict:
    lines = [ln for ln in stdout.splitlines() if ln.strip().startswith("{")]
    assert lines, f"no JSON line on stdout: {stdout!r}"
    return json.loads(lines[-1])


def test_dead_backend_emits_error_line_within_deadline(tmp_path):
    """Tunnel down from the start, no stale cache: the outage give-up
    must fire (probe loop abandoned, one short worker attempted, worker
    produces nothing) and the zero-artifact error schema must print —
    all in seconds, not the driver's whole capture window."""
    proc, wall = _run({
        "LFS_BENCH_FORCE_OUTAGE": "1",
        "LFS_BENCH_OUTAGE_DEADLINE_S": "1",
        "LFS_BENCH_PROBE_RETRY_S": "0.2",
        "LFS_BENCH_DEADLINE_S": "60",
        "LFS_BENCH_LAST_GOOD": str(tmp_path / "absent.json"),
        # the one post-outage worker attempt: exits fast with no
        # WORKER_RESULT line, like a worker dying on a dead tunnel
        "LFS_BENCH_WORKER_CMD": f"{sys.executable} -c pass",
    })
    line = _last_json(proc.stdout)
    assert line["metric"] == "flagstat_words_per_sec"
    assert line["value"] == 0.0 and line["vs_baseline"] == 0.0
    assert "error" in line
    assert proc.returncode == 1
    assert wall < 45.0


def test_dead_backend_reprints_stale_cache_labeled(tmp_path):
    """With a last-good cache present, an outage reports that
    measurement clearly labeled stale instead of a zero artifact."""
    cached_line = {
        "metric": "flagstat_words_per_sec", "value": 3.6e11,
        "unit": "words/s", "vs_baseline": 0.97, "kernel_ms": 0.178,
        "gbytes_per_s": 747.0, "roofline_gbs": 755.0,
        "agreement": "cross_process", "backend": "tpu",
    }
    cache = tmp_path / "last_good.json"
    cache.write_text(json.dumps(
        {"saved_at_unix": time.time() - 3600.0, "line": cached_line}))
    proc, wall = _run({
        "LFS_BENCH_FORCE_OUTAGE": "1",
        "LFS_BENCH_OUTAGE_DEADLINE_S": "1",
        "LFS_BENCH_PROBE_RETRY_S": "0.2",
        "LFS_BENCH_DEADLINE_S": "60",
        "LFS_BENCH_LAST_GOOD": str(cache),
        "LFS_BENCH_WORKER_CMD": f"{sys.executable} -c pass",
    })
    line = _last_json(proc.stdout)
    assert line["agreement"] == "stale_cache"
    assert line["stale"] is True
    assert line["stale_age_s"] >= 3600.0
    assert line["value"] == 3.6e11 and line["vs_baseline"] == 0.97
    assert "note" in line
    assert proc.returncode == 0
    assert wall < 45.0


def test_watchdog_fires_through_a_hung_worker(tmp_path):
    """A worker that hangs forever (main thread stuck in subprocess.run)
    must not block the final line: the watchdog thread prints the
    fallback and hard-exits at the deadline."""
    proc, wall = _run({
        "LFS_BENCH_FORCE_PROBE_OK": "1",
        "LFS_BENCH_DEADLINE_S": "6",
        "LFS_BENCH_LAST_GOOD": str(tmp_path / "absent.json"),
        "LFS_BENCH_WORKER_CMD": "sleep 600",
    })
    line = _last_json(proc.stdout)
    assert line["value"] == 0.0
    assert "deadline" in line["error"]
    assert proc.returncode == 1
    assert wall < 40.0


def test_healthy_worker_result_saves_last_good(tmp_path):
    """Two agreeing fake workers produce a cross_process line AND
    populate the last-good cache the stale path replays."""
    worker = tmp_path / "fake_worker.py"
    res = {
        "backend": "tpu", "n_words": 1024, "mode": "full_parity",
        "nblk": 8, "kernel_ms": 0.18, "bytes_per_s": 7.4e11,
        "words_per_s": 3.7e11, "roofline_gbs": 750.0,
        "window_roofline_gbs": 750.0, "defended_roofline_gbs": 752.0,
        "roofline_kind": "read_xor_pallas", "vs_roofline": 0.97,
        "fit_residual": 0.01, "fit_dispersion": 0.02,
        "dispatch_ms": 50.0, "rejected_samples": 0,
    }
    worker.write_text(
        "import json\n"
        f"print('WORKER_RESULT ' + json.dumps({res!r}))\n")
    cache = tmp_path / "last_good.json"
    proc, _ = _run({
        "LFS_BENCH_FORCE_PROBE_OK": "1",
        "LFS_BENCH_DEADLINE_S": "60",
        "LFS_BENCH_LAST_GOOD": str(cache),
        "LFS_BENCH_WORKER_CMD": f"{sys.executable} {worker}",
    })
    line = _last_json(proc.stdout)
    assert line["agreement"] == "cross_process"
    assert proc.returncode == 0
    blob = json.loads(cache.read_text())
    assert blob["line"]["value"] == line["value"]
    assert blob["saved_at_unix"] <= time.time()
