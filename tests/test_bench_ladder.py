"""bench.py's config-3 flag ladder: the unattended driver run must survive
rungs whose kernels fail to compile, report the best rung that ran, always
measure the first LADDER_MIN_RUNGS rungs, and flag step-time regressions."""

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


# rung names by role, resolved from the CURRENT ladder so renames between
# rounds don't strand this test (VERDICT r3 weak #7)
DEFAULT_RUNGS = [n for n, f in bench.TRAIN_LADDER
                 if not f.get("pallas_reproj") and "_pool" not in f]
REPROJ_RUNG = next(n for n, f in bench.TRAIN_LADDER
                   if f.get("pallas_reproj"))
POOL_RUNG = next(n for n, f in bench.TRAIN_LADDER if f.get("_pool") == "0")


def test_ladder_picks_best_and_survives_failures(monkeypatch):
    results = {
        (False, False): RuntimeError("mosaic lowering failed"),
        (True, False): 120.0,
        (False, True): 50.0,
    }
    monkeypatch.setattr(bench, "bench_train", _fake_bench_train(results))
    r = bench.bench_train_ladder({}, explicit=False, on_tpu=True)
    assert r["value"] == 120.0
    assert r["config_flags"] == REPROJ_RUNG
    for name in DEFAULT_RUNGS:
        assert "error" in r["ladder"][name]
    # the no-Pallas-pool fallback rung ran and was recorded
    assert r["ladder"][POOL_RUNG]["value"] == 50.0


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


def test_min_rungs_measured_despite_budget(monkeypatch):
    """Even with a zero budget, the first LADDER_MIN_RUNGS rungs (defaults
    at b24 AND b12 plus the first fallback) must all be measured so the
    recorded artifact carries cross-round-comparable numbers."""

    def fake(cfg_kwargs, metric, batch):
        return None, None, None, None, {
            "metric": metric, "value": 100.0, "unit": "samples/s",
            "step_ms": {"median": 1.0, "min": 1.0, "max": 1.0}}

    monkeypatch.setattr(bench, "bench_train", fake)
    monkeypatch.setattr(bench, "LADDER_BUDGET_S", 0.0)
    r = bench.bench_train_ladder({}, explicit=False, on_tpu=True)
    names = [n for n, _ in bench.TRAIN_LADDER]
    for name in names[:bench.LADDER_MIN_RUNGS]:
        assert r["ladder"][name].get("value") == 100.0, r["ladder"]
    for name in names[bench.LADDER_MIN_RUNGS:]:
        assert r["ladder"][name] == {"skipped": "budget"}


def test_regression_gate_flags_slow_rung(monkeypatch):
    """A measured rung >10% over its recorded best step_ms is reported in
    result['regressions'] (the drive script greps for it)."""
    rung = next(iter(bench.BEST_KNOWN_STEP_MS))
    slow = bench.BEST_KNOWN_STEP_MS[rung] * 1.5

    def fake(cfg_kwargs, metric, batch):
        return None, None, None, None, {
            "metric": metric, "value": 10.0, "unit": "samples/s",
            "step_ms": {"median": slow, "min": slow, "max": slow}}

    monkeypatch.setattr(bench, "bench_train", fake)
    r = bench.bench_train_ladder({}, explicit=False, on_tpu=True)
    assert rung in r["regressions"]
    assert r["regressions"][rung]["best_known_ms"] == \
        bench.BEST_KNOWN_STEP_MS[rung]
