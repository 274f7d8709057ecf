"""bench.py resilience contract (VERDICT r3 weak #1): a dead or wrong
backend must always produce the distinguishable ``env_down`` JSON line —
never a bare traceback, and never a normal-looking number measured on the
CPU host. These tests drive bench's control flow with the measurement
stubbed; the real measurement path is exercised on the chip."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import types

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench


class _Ran:
    def __init__(self, returncode=0, stdout="", stderr=""):
        self.returncode = returncode
        self.stdout = stdout
        self.stderr = stderr


def _fake_run(result):
    def run(*a, **kw):
        if isinstance(result, Exception):
            raise result
        return result

    return run


def test_probe_accepts_tpu_platforms(monkeypatch):
    for plat in ("tpu", "axon"):
        monkeypatch.setattr(subprocess, "run", _fake_run(_Ran(0, plat + "\n")))
        ok, msg = bench._probe_backend(5.0)
        assert ok and msg == plat


def test_probe_rejects_cpu_fallback(monkeypatch):
    """JAX silently falling back to CPU must read as environment-down: a
    clips/sec/chip number measured on the 1-core host would be a
    normal-looking bad artifact."""
    monkeypatch.setattr(subprocess, "run", _fake_run(_Ran(0, "cpu\n")))
    ok, msg = bench._probe_backend(5.0)
    assert not ok and "cpu" in msg


def test_probe_handles_hang_and_failure(monkeypatch):
    monkeypatch.setattr(
        subprocess, "run", _fake_run(subprocess.TimeoutExpired("cmd", 5.0))
    )
    ok, msg = bench._probe_backend(5.0)
    assert not ok and "hung" in msg
    monkeypatch.setattr(
        subprocess, "run",
        _fake_run(_Ran(1, "", "RuntimeError: Unable to initialize backend 'axon'")),
    )
    ok, msg = bench._probe_backend(5.0)
    assert not ok and "axon" in msg


def _last_json(capsys):
    out = capsys.readouterr().out.strip().splitlines()
    return json.loads(out[-1])


def test_main_emits_env_down_when_backend_never_up(monkeypatch, capsys):
    monkeypatch.setattr(bench, "_wait_for_backend", lambda: "tunnel stall")
    with pytest.raises(SystemExit) as e:
        bench.main()
    assert e.value.code == 1
    payload = _last_json(capsys)
    assert payload["env_down"] is True and payload["value"] is None
    assert "tunnel stall" in payload["error"]


def test_main_emits_env_down_on_final_attempt_unavailable(monkeypatch, capsys):
    """A tunnel death on the LAST retry must still produce the JSON line,
    not a bare traceback."""
    monkeypatch.setenv("BENCH_RUN_RETRIES", "2")
    monkeypatch.setattr(bench, "_wait_for_backend", lambda: None)

    def dead(*a, **kw):
        raise RuntimeError("UNAVAILABLE: tunnel died mid-run")

    monkeypatch.setattr(bench, "bench_jax_tpu", dead)
    with pytest.raises(SystemExit) as e:
        bench.main()
    assert e.value.code == 1
    payload = _last_json(capsys)
    assert payload["env_down"] is True
    assert "UNAVAILABLE" in payload["error"]


def test_main_clamps_zero_retries(monkeypatch, capsys):
    """BENCH_RUN_RETRIES=0 must not skip the attempt loop and crash on
    round(None) — it clamps to one attempt (ADVICE r4)."""
    monkeypatch.setenv("BENCH_RUN_RETRIES", "0")
    monkeypatch.setattr(bench, "_wait_for_backend", lambda: None)
    guard = {"min_embed_cos": 0.99999, "argmax_agreement": 1.0}
    monkeypatch.setattr(bench, "bench_jax_tpu", lambda: (2700.0, 0.181, guard))
    monkeypatch.setattr(bench, "bench_torch_cpu", lambda: 3.6)
    bench.main()
    payload = _last_json(capsys)
    assert payload["value"] == 2700.0 and "env_down" not in payload


def test_main_emits_env_down_on_timing_noise(monkeypatch, capsys):
    """A tunnel too noisy for the two-point timing is an environmental
    condition and must produce the distinguishable JSON line (ADVICE r4)."""
    from audio_residual_tpu.utils.profiling import TimingUnreliableError

    monkeypatch.setenv("BENCH_RUN_RETRIES", "2")
    monkeypatch.setattr(bench, "_wait_for_backend", lambda: None)

    def noisy(*a, **kw):
        raise TimingUnreliableError(
            "measure_seconds: timing delta 3.0us did not clear the rep jitter"
        )

    monkeypatch.setattr(bench, "bench_jax_tpu", noisy)
    with pytest.raises(SystemExit) as e:
        bench.main()
    assert e.value.code == 1
    payload = _last_json(capsys)
    assert payload["env_down"] is True
    assert "rep jitter" in payload["error"]


def test_main_propagates_real_bugs(monkeypatch):
    """Non-UNAVAILABLE errors are real bugs and must raise, not be eaten
    by the resilience wrapper."""
    monkeypatch.setattr(bench, "_wait_for_backend", lambda: None)

    def broken(*a, **kw):
        raise RuntimeError("shape mismatch in zero_shot")

    monkeypatch.setattr(bench, "bench_jax_tpu", broken)
    with pytest.raises(RuntimeError, match="shape mismatch"):
        bench.main()


def test_main_happy_path_payload(monkeypatch, capsys):
    monkeypatch.setattr(bench, "_wait_for_backend", lambda: None)
    guard = {"min_embed_cos": 0.99999, "argmax_agreement": 1.0}
    monkeypatch.setattr(bench, "bench_jax_tpu", lambda: (2700.0, 0.181, guard))
    monkeypatch.setattr(bench, "bench_torch_cpu", lambda: 3.6)
    bench.main()
    payload = _last_json(capsys)
    assert payload["value"] == 2700.0
    assert payload["unit"] == "clips/sec"
    assert payload["vs_baseline"] == 750.0
    assert payload["mfu"] == 0.181
    assert payload["acc_guard"] == guard
    assert "env_down" not in payload
