"""Pin the round-15 regression-gate semantics (bench.find_regressions):
suspects are computed per prior artifact (drift = that artifact's pack
median) and a key is flagged only when suspect against EVERY artifact
that recorded it — one ancient fast-host artifact can no longer flag a
key that every other comparison shows improved (the r15 false positive:
dedup_minhash_banded vs a probe-less r11 wall)."""

from __future__ import annotations

import glob
import json

import bench


def _write(tmp_path, name, queries):
    p = tmp_path / name
    p.write_text(
        json.dumps({"metric": "m", "sf": 0.1, "queries": queries})
    )
    return str(p)


def test_gate_flags_only_intersection(tmp_path, monkeypatch):
    # ancient artifact: key x recorded on a much faster host (or an older
    # algorithm generation) -> x looks regressed against IT only
    p1 = _write(
        tmp_path, "BENCH_r01.json", {"x": 0.5, "y": 1.0, "z": 1.0, "w": 1.0}
    )
    # recent artifact: x actually improved; z regressed here too
    p2 = _write(
        tmp_path, "BENCH_r02.json", {"x": 1.0, "y": 1.0, "z": 1.0, "w": 1.0}
    )
    monkeypatch.setattr(glob, "glob", lambda pat: [p1, p2])
    timings = {"x": 0.9, "y": 1.0, "z": 2.0, "w": 1.0}
    samples = {k: [v, v, v] for k, v in timings.items()}
    out = bench.find_regressions(timings, samples)
    # sanity of the construction: x IS suspect against the ancient
    # artifact alone (ratio 1.8 vs bar 1.2*1.4) but improved vs recent
    assert "x" not in out["flagged"], out
    # z is over the bar against EVERY artifact -> flagged
    assert "z" in out["flagged"], out
    # drift reported vs the most recent artifact's pack
    assert out["machine_drift"] == 1.0


def test_gate_flags_key_missing_from_some_artifacts(tmp_path, monkeypatch):
    # a key recorded by only SOME artifacts must still be flaggable: the
    # intersection runs over the artifacts that recorded it, not all
    # artifacts (r15 review finding — a plain all-artifact intersection
    # permanently exempted every key added after any recorded round)
    p1 = _write(tmp_path, "BENCH_r01.json", {"y": 1.0, "z": 1.0, "w": 1.0})
    p2 = _write(
        tmp_path, "BENCH_r02.json", {"x": 1.0, "y": 1.0, "z": 1.0, "w": 1.0}
    )
    monkeypatch.setattr(glob, "glob", lambda pat: [p1, p2])
    timings = {"x": 5.0, "y": 1.0, "z": 1.0, "w": 1.0}
    samples = {k: [v, v, v] for k, v in timings.items()}
    out = bench.find_regressions(timings, samples)
    assert "x" in out["flagged"], out
    # and its details come from the artifact that recorded it
    assert out["flagged"]["x"]["prior_median"] == 1.0


def test_gate_min_spread_shield(tmp_path, monkeypatch):
    # a slow MEDIAN whose fastest pass is under the bar is spread, not a
    # shift -> never flagged (the r3/r4 adjudication, carried over)
    p1 = _write(tmp_path, "BENCH_r01.json", {"x": 1.0, "y": 1.0, "z": 1.0})
    monkeypatch.setattr(glob, "glob", lambda pat: [p1])
    timings = {"x": 2.0, "y": 1.0, "z": 1.0}
    samples = {"x": [1.1, 2.0, 2.2], "y": [1.0], "z": [1.0]}
    out = bench.find_regressions(timings, samples)
    assert out["flagged"] == {}, out


def test_gate_skips_mismatched_sf(tmp_path, monkeypatch):
    p1 = tmp_path / "BENCH_r01.json"
    p1.write_text(
        json.dumps({"metric": "m", "sf": 0.01, "queries": {"x": 0.1}})
    )
    monkeypatch.setattr(glob, "glob", lambda pat: [str(p1)])
    out = bench.find_regressions({"x": 1.0}, {"x": [1.0]})
    assert out == {"machine_drift": None, "flagged": {}}
