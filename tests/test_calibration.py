"""Dispatch-crossover calibration round-trip (round 5, VERDICT r04 #4).

The sweep tool WRITES its measured thresholds to calibration.json and
ops/dispatch.py APPLIES them at import — so moving deployments (tunnel
-> co-located TPU) is a sweep run, not a source edit (reference
analogue: runtime-probed cached dispatch, libflagstats.h:2977-3022).
"""
import importlib.util
import json
import sys
from pathlib import Path

import pytest

from libflagstats_tpu import calibration
from libflagstats_tpu.ops import dispatch

TOOLS = Path(__file__).resolve().parent.parent / "tools"


def _sweep_module():
    spec = importlib.util.spec_from_file_location(
        "crossover_sweep", TOOLS / "crossover_sweep.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture
def cal_file(tmp_path, monkeypatch):
    path = tmp_path / "calibration.json"
    monkeypatch.setenv("LFS_CALIBRATION_FILE", str(path))
    yield path
    # restore the baked-in defaults for the rest of the suite
    monkeypatch.delenv("LFS_CALIBRATION_FILE")
    dispatch.NATIVE_DEVICE_MIN_TPU = 1 << 62
    dispatch.POSPOPCNT_NATIVE_DEVICE_MIN_TPU = 1 << 62
    dispatch.DEVICE_MIN_TPU = 1 << 20
    dispatch.XLA_MIN_CPU = 1 << 15
    dispatch._apply_calibration()


def test_write_load_roundtrip(cal_file):
    calibration.write_thresholds(
        {"DEVICE_MIN_TPU": 1 << 13, "NATIVE_DEVICE_MIN_TPU": 1 << 20},
        {"date": "2026-08-20", "backend": "tpu", "device_kind": "x",
         "dispatch_rtt_ms": 0.3, "tool": "crossover_sweep"})
    got = calibration.load_thresholds()
    assert got == {"DEVICE_MIN_TPU": 1 << 13,
                   "NATIVE_DEVICE_MIN_TPU": 1 << 20}
    # provenance rides along in the file
    blob = json.loads(cal_file.read_text())
    assert blob["thresholds"]["DEVICE_MIN_TPU"]["backend"] == "tpu"
    assert blob["thresholds"]["DEVICE_MIN_TPU"]["dispatch_rtt_ms"] == 0.3


def test_write_merges_across_sweeps(cal_file):
    """The flagstat and pospopcnt sweeps accumulate into one file."""
    calibration.write_thresholds({"DEVICE_MIN_TPU": 1 << 13},
                                 {"tool": "crossover_sweep"})
    calibration.write_thresholds({"POSPOPCNT_DEVICE_MIN_TPU": 1 << 22},
                                 {"tool": "crossover_sweep"})
    got = calibration.load_thresholds()
    assert got == {"DEVICE_MIN_TPU": 1 << 13,
                   "POSPOPCNT_DEVICE_MIN_TPU": 1 << 22}


def test_dispatch_applies_calibration(cal_file):
    """File -> dispatch: thresholds override the module constants, and
    auto_impl's decisions actually move."""
    calibration.write_thresholds(
        {"NATIVE_DEVICE_MIN_TPU": 1 << 10, "XLA_MIN_CPU": 1 << 4},
        {"tool": "test"})
    applied = dispatch._apply_calibration()
    assert sorted(applied) == ["NATIVE_DEVICE_MIN_TPU", "XLA_MIN_CPU"]
    assert dispatch.NATIVE_DEVICE_MIN_TPU == 1 << 10
    assert dispatch.XLA_MIN_CPU == 1 << 4


def test_dispatch_auto_impl_moves_with_calibration(cal_file):
    """On this CPU-forced suite the native tier wins at every size by
    default; a calibrated (tiny) XLA_MIN_CPU must not disturb that, but
    with native unavailable the numpy->xla crossover must follow the
    file."""
    from libflagstats_tpu.ops import native_host

    calibration.write_thresholds({"XLA_MIN_CPU": 1 << 4}, {"tool": "test"})
    dispatch._apply_calibration()
    if native_host.available():
        assert dispatch.auto_impl(1 << 3) == "native"
    orig = native_host.available
    try:
        native_host.available = lambda: False
        assert dispatch.auto_impl(1 << 3) == "numpy"
        assert dispatch.auto_impl(1 << 5) == "xla"   # calibrated crossover
    finally:
        native_host.available = orig


def test_malformed_file_warns_and_falls_back(cal_file, capsys):
    cal_file.write_text("{not json")
    assert calibration.load_thresholds() == {}
    assert "unusable" in capsys.readouterr().err
    cal_file.write_text(json.dumps(
        {"version": 1, "thresholds": {"DEVICE_MIN_TPU": {"value": "big"}}}))
    assert calibration.load_thresholds() == {}


def test_unknown_names_ignored_on_load_rejected_on_write(cal_file):
    cal_file.write_text(json.dumps(
        {"version": 1,
         "thresholds": {"FUTURE_KNOB": {"value": 7},
                        "DEVICE_MIN_TPU": {"value": 64}}}))
    assert calibration.load_thresholds() == {"DEVICE_MIN_TPU": 64}
    with pytest.raises(ValueError, match="unknown threshold"):
        calibration.write_thresholds({"TYPO_MIN": 1}, {})


def test_env_empty_disables(monkeypatch):
    monkeypatch.setenv("LFS_CALIBRATION_FILE", "")
    assert calibration.calibration_path() is None
    assert calibration.load_thresholds() == {}


def test_sweep_writer_maps_suggestions_to_thresholds(cal_file, monkeypatch):
    """The sweep-side mapping: suggestions -> named thresholds with
    provenance, None suggestions dropped, no-measurement -> no write."""
    sweep = _sweep_module()
    sweep._write_calibration({"DEVICE_MIN_TPU": 1 << 20,
                              "NATIVE_DEVICE_MIN_TPU": None},
                             "tpu", rtt_ms=62.0)
    got = calibration.load_thresholds()
    assert got == {"DEVICE_MIN_TPU": 1 << 20}
    blob = json.loads(cal_file.read_text())
    ent = blob["thresholds"]["DEVICE_MIN_TPU"]
    assert ent["dispatch_rtt_ms"] == 62.0
    assert ent["tool"] == "crossover_sweep"
    # all-None: untouched file
    before = cal_file.read_text()
    sweep._write_calibration({"XLA_MIN_CPU": None}, "cpu", rtt_ms=None)
    assert cal_file.read_text() == before


def test_sweep_rtt_median():
    sweep = _sweep_module()
    rows = [(1, 0, 0, 0.050, 0.001), (2, 0, 0, 0.060, 0.002),
            (3, 0, 0, float("nan"), 0.001)]
    assert sweep._rtt_ms(rows, 3, 4) == pytest.approx(58.0)


def test_malformed_shapes_never_crash_import(cal_file, capsys):
    """Round-5 review finding: a thresholds value of the wrong SHAPE
    (list, string, non-dict blob) must fall back with a warning — it
    is loaded at `import libflagstats_tpu.ops.dispatch` time, so an
    uncaught error bricks the whole library."""
    import json as _json

    for blob in ('{"version": 1, "thresholds": [1, 2]}',
                 '{"version": 1, "thresholds": "DEVICE_MIN_TPU"}',
                 '[1, 2, 3]', '"just a string"', "3"):
        cal_file.write_text(blob)
        assert calibration.load_thresholds() == {}, blob
        assert dispatch._apply_calibration() == []
    assert "unusable" in capsys.readouterr().err
