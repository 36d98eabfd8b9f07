"""bench.py tunnel-outage hardening (VERDICT r2 #1): the TPU attempt
ladder retries across rounds before conceding to the CPU fallback, and a
success short-circuits immediately."""

import importlib.util
import json
import sys


def _load_bench():
    spec = importlib.util.spec_from_file_location("bench", "/root/repo/bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _run_main(monkeypatch, capsys, results):
    """Drive bench.main() with a scripted _measure_subprocess. ``results``
    maps call index -> (ips, latency) ; default = failure (None, None)."""
    bench = _load_bench()
    calls = []

    def fake_measure(batch, cpu, budget):
        idx = len(calls)
        calls.append((batch, cpu, budget))
        return results.get(idx, (None, None))

    sleeps = []
    monkeypatch.setattr(bench, "_measure_subprocess", fake_measure)
    monkeypatch.setattr(bench.time, "sleep", lambda s: sleeps.append(s))
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(out), calls, sleeps


class TestBenchRetry:
    def test_success_short_circuits_first_attempt(self, monkeypatch, capsys):
        rec, calls, sleeps = _run_main(
            monkeypatch, capsys, {0: (90000.0, 24.0)})
        assert rec["value"] == 90000.0
        assert "tpu" in rec["unit"]
        assert "roofline" in rec
        assert len(calls) == 1 and sleeps == []

    def test_three_tpu_rounds_before_cpu_fallback(self, monkeypatch, capsys):
        # every attempt fails except the very last (the CPU fallback)
        rec, calls, sleeps = _run_main(
            monkeypatch, capsys, {12: (900.0, 39.0)})
        # 3 rounds x 4 batches tried on TPU, then CPU
        assert len(calls) == 13
        assert [c[1] for c in calls] == [False] * 12 + [True]
        assert len(sleeps) == 2  # one sleep between each retry round
        assert "cpu-fallback" in rec["unit"]
        assert "roofline" not in rec

    def test_recovery_in_second_round(self, monkeypatch, capsys):
        # tunnel blips through round 0, recovers at the first batch of
        # round 1 — exactly the r02 scenario the retries exist for
        rec, calls, sleeps = _run_main(
            monkeypatch, capsys, {4: (95000.0, 25.0)})
        assert len(calls) == 5
        assert "tpu" in rec["unit"]
        assert rec["vs_baseline"] > 500
        assert len(sleeps) == 1
