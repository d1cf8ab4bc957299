"""bench.py final-line assembly: reproduction rule + degraded fallback.

The reference prints min+avg of every run unconditionally
(linux/instrumented_benchmark.cpp:107-142); our headline instead defends
itself against this environment's caching artifacts, but must still
emit an honest lower bound — never a 0.0 artifact — when the shared
chip denies cross-process agreement.
"""
import bench


def _res(wps: float) -> dict:
    return {
        "words_per_s": wps,
        "vs_roofline": wps / 400e9,
        "kernel_ms": 64 * 1024 * 1024 / wps * 1e3,
        "bytes_per_s": 2 * wps,
        "roofline_gbs": 800.0,
        "fit_residual": 0.01,
        "backend": "tpu",
    }


def test_agreeing_pair_picks_slower():
    a, b = _res(360e9), _res(365e9)
    line, rc = bench.assemble_final([a, b], agree_pct=5.0)
    assert rc == 0
    assert line["agreement"] == "cross_process"
    assert line["value"] == round(360e9, 1)
    assert 0 < line["cross_process_spread_pct"] <= 5.0


def test_no_agreement_degrades_to_slowest_unconfirmed():
    a, b = _res(300e9), _res(380e9)  # 23% apart
    line, rc = bench.assemble_final([a, b], agree_pct=5.0)
    assert rc == 0
    assert line["agreement"] == "unconfirmed"
    assert line["value"] == round(300e9, 1)
    assert line["cross_process_spread_pct"] is None
    assert line["n_valid_workers"] == 2
    assert line["vs_baseline"] > 0


def test_agreement_found_after_disagreeing_first_pair():
    rs = [_res(300e9), _res(380e9), _res(378e9)]
    line, rc = bench.assemble_final(rs, agree_pct=5.0)
    assert rc == 0
    assert line["agreement"] == "cross_process"
    assert line["value"] == round(378e9, 1)


def test_no_results_is_an_error():
    line, rc = bench.assemble_final([], agree_pct=5.0)
    assert line is None and rc == 1
