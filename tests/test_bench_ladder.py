"""bench.py's config-3 flag ladder: the unattended driver run must survive
rungs whose kernels fail to compile and report the best rung that ran."""

import sys

import pytest

sys.path.insert(0, ".")
import bench  # noqa: E402


def _fake_bench_train(results):
    """bench_train stub keyed by the pallas flags of the benched config."""

    def fake(cfg_kwargs, metric, batch):
        import os
        key = (bool(cfg_kwargs.get("pallas_reproj")),
               os.environ.get("FUSIONDEPTH_PALLAS_POOL", "1") == "0")
        out = results[key]
        if isinstance(out, Exception):
            raise out
        return None, None, None, None, {
            "metric": metric, "value": out, "unit": "samples/s",
            "step_ms": {"median": 1.0, "min": 1.0, "max": 1.0}}

    return fake


def test_ladder_picks_best_and_survives_failures(monkeypatch):
    results = {
        (False, False): RuntimeError("mosaic lowering failed"),
        (True, False): 120.0,
        (False, True): 50.0,
    }
    monkeypatch.setattr(bench, "bench_train", _fake_bench_train(results))
    r = bench.bench_train_ladder({}, explicit=False, on_tpu=True)
    assert r["value"] == 120.0
    assert r["config_flags"] == "r3_reproj"
    assert "error" in r["ladder"]["r3_banded_strip"]
    # the no-Pallas-pool fallback rung ran and was recorded
    assert r["ladder"]["r2_no_pallas_pool"]["value"] == 50.0


def test_ladder_all_rungs_failing_raises(monkeypatch):
    err = RuntimeError("tunnel down")
    results = {k: err for k in [
        (False, False), (True, False), (False, True)]}
    monkeypatch.setattr(bench, "bench_train", _fake_bench_train(results))
    with pytest.raises(RuntimeError, match="every ladder rung failed"):
        bench.bench_train_ladder({}, explicit=False, on_tpu=True)


def test_explicit_set_bypasses_ladder(monkeypatch):
    calls = []

    def fake(cfg_kwargs, metric, batch):
        calls.append(cfg_kwargs)
        return None, None, None, None, {"metric": metric, "value": 1.0}

    monkeypatch.setattr(bench, "bench_train", fake)
    r = bench.bench_train_ladder({"pallas_reproj": True}, explicit=True,
                                 on_tpu=True)
    assert len(calls) == 1 and "ladder" not in r
    assert calls[0] == {"pallas_reproj": True}
