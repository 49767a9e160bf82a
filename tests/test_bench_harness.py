"""Forced-wedge self-tests for the bench artifact harness (VERDICT r4 item 1).

Round 4's driver benchmark recorded NOTHING (BENCH_r04.json rc=124,
parsed=null) because bench.py printed its single JSON line only at the very
end. These tests drive bench.main() with fake sections — including a section
that hangs forever — and assert the LAST stdout line is always a parseable
cumulative JSON artifact carrying everything that did finish.

No device work happens here: the headline and all sections are replaced with
stubs, so only the harness (deadlined threads, incremental emission, global
budget, fake-hang knob) is under test.
"""

import json
import os
import sys
import time

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402


def _last_json_line(out: str) -> dict:
    lines = [ln for ln in out.strip().splitlines() if ln.startswith("{")]
    assert lines, f"no JSON line in output: {out!r}"
    return json.loads(lines[-1])


def _all_json_lines(out: str) -> list[dict]:
    return [json.loads(ln) for ln in out.strip().splitlines() if ln.startswith("{")]


@pytest.fixture
def harness(monkeypatch):
    """Stub the headline + sections; keep the harness logic real."""
    monkeypatch.setenv("KF2VEC_BENCH_NO_HARD_EXIT", "1")
    monkeypatch.setattr(bench, "bench_train_steps", lambda: 42.5)
    monkeypatch.setattr(bench, "HEADLINE_TIMEOUT_S", 30.0)
    monkeypatch.setattr(bench, "DEFAULT_SECTION_TIMEOUT_S", 1.0)
    monkeypatch.setattr(bench, "SECTION_TIMEOUT_S", {})
    return monkeypatch


def test_hung_section_degrades_not_kills(harness, capfd):
    """A section that wedges (sleeps past its deadline) costs ONE error
    field; earlier AND later sections' results survive in the last line."""
    harness.setattr(bench, "fake_fast", lambda: {"fast_field": 1}, raising=False)
    harness.setattr(bench, "fake_hang", lambda: time.sleep(120), raising=False)
    harness.setattr(bench, "fake_after", lambda: {"after_field": 2}, raising=False)
    harness.setattr(bench, "SECTIONS", ("fake_fast", "fake_hang", "fake_after"))
    bench.main()
    result = _last_json_line(capfd.readouterr().out)
    assert result["value"] == 42.5
    assert result["fast_field"] == 1
    assert result["fake_hang_error"] == "timeout"
    assert result["after_field"] == 2
    assert result["metric"] == "train_steps_per_s_per_chip"


def test_fake_hang_env_knob(harness, capfd):
    """KF2VEC_BENCH_FAKE_HANG replaces a real section by name — the live
    forced-wedge drill: the artifact must still parse with the hang marked."""
    harness.setattr(bench, "fake_a", lambda: {"a": 1}, raising=False)
    harness.setattr(bench, "fake_b", lambda: {"b": 2}, raising=False)
    harness.setattr(bench, "SECTIONS", ("fake_a", "fake_b"))
    harness.setenv("KF2VEC_BENCH_FAKE_HANG", "fake_b")
    bench.main()
    result = _last_json_line(capfd.readouterr().out)
    assert result["a"] == 1
    assert "b" not in result
    assert result["fake_b_error"] == "timeout"


def test_hung_headline_still_emits(harness, capfd):
    """Even a wedged HEADLINE leaves a parseable artifact (value 0 + error)
    and the sections still run."""
    harness.setattr(bench, "bench_train_steps", lambda: time.sleep(120))
    harness.setattr(bench, "HEADLINE_TIMEOUT_S", 1.0)
    harness.setattr(bench, "fake_a", lambda: {"a": 1}, raising=False)
    harness.setattr(bench, "SECTIONS", ("fake_a",))
    bench.main()
    result = _last_json_line(capfd.readouterr().out)
    assert result["value"] == 0.0
    assert result["headline_error"] == "timeout"
    assert result["a"] == 1


def test_incremental_emission_every_section(harness, capfd):
    """One cumulative line lands after the headline and after every section:
    a driver kill at ANY point costs only the unfinished tail."""
    harness.setattr(bench, "fake_a", lambda: {"a": 1}, raising=False)
    harness.setattr(bench, "fake_b", lambda: {"b": 2}, raising=False)
    harness.setattr(bench, "SECTIONS", ("fake_a", "fake_b"))
    bench.main()
    lines = _all_json_lines(capfd.readouterr().out)
    assert len(lines) == 3  # headline, +fake_a, +fake_b
    assert "a" not in lines[0] and lines[0]["value"] == 42.5
    assert lines[1]["a"] == 1 and "b" not in lines[1]
    assert lines[2]["a"] == 1 and lines[2]["b"] == 2
    # cumulative: every later line carries everything earlier ones had
    assert all("value" in ln and "backend" in ln for ln in lines)


def test_global_budget_skips_tail(harness, capfd):
    """Once the wall-clock budget is spent, remaining sections are skipped
    and RECORDED as skipped (no silent truncation)."""
    harness.setenv("KF2VEC_BENCH_BUDGET_S", "0")
    harness.setattr(bench, "fake_a", lambda: {"a": 1}, raising=False)
    harness.setattr(bench, "fake_b", lambda: {"b": 2}, raising=False)
    harness.setattr(bench, "SECTIONS", ("fake_a", "fake_b"))
    bench.main()
    result = _last_json_line(capfd.readouterr().out)
    # headline always runs (it IS the metric); sections are what the budget
    # sheds
    assert result["value"] == 42.5
    assert result["bench_sections_skipped"] == ["fake_a", "fake_b"]
    assert "a" not in result and "b" not in result


def test_section_exception_recorded(harness, capfd):
    """A raising section records its error and later sections still run."""

    def boom():
        raise RuntimeError("tunnel dropped")

    harness.setattr(bench, "fake_boom", boom, raising=False)
    harness.setattr(bench, "fake_c", lambda: {"c": 3}, raising=False)
    harness.setattr(bench, "SECTIONS", ("fake_boom", "fake_c"))
    bench.main()
    result = _last_json_line(capfd.readouterr().out)
    assert "tunnel dropped" in result["fake_boom_error"]
    assert result["c"] == 3
