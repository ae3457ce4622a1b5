"""Split-process gate apparatus: the result-size guard.

The tool exists for |V|-sized grouped oracle results; a fact-table
query routed through it would re-introduce the very driver-memory and
disk pressure the split exists to relieve. The guard must refuse —
loudly, before pickling — instead of letting the failure masquerade as
an apparatus (disk/OOM) error.
"""

from __future__ import annotations

import os

import pytest

import tools.split_gate as sg
from tests.conftest import SF_SMALL


def test_over_cap_result_refused_before_pickling(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(sg, "MAX_ROWS", 5)
    out = str(tmp_path / "half.pkl")
    # customer_padded_keys returns 10 rows (LIMIT 10) > the 5-row cap
    with pytest.raises(SystemExit, match="exceeds 5 rows"):
        sg.spark_phase(SF_SMALL, "customer_padded_keys", out)
    assert not os.path.exists(out), "over-cap payload must not be written"


def test_under_cap_result_pickled(spark, tmp_path, monkeypatch):
    # spark_phase stops its (subprocess) session on exit; in-process the
    # fixture session must survive for the rest of the suite
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    out = str(tmp_path / "half.pkl")
    sg.spark_phase(SF_SMALL, "event_type_counts", out)
    import pickle

    with open(out, "rb") as f:
        payload = pickle.load(f)
    assert payload["cols"] and payload["rows"]
    assert len(payload["rows"]) <= sg.MAX_ROWS


def test_oracle_only_replays_saved_pickle(spark, tmp_path, monkeypatch):
    """--oracle-only resumes from a saved Spark half: the oracle runs
    and the verdict is green without re-running Spark (the recovery
    path for killed sf10 oracle phases)."""
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    out = str(tmp_path / "half.pkl")
    sg.spark_phase(SF_SMALL, "event_type_counts", out)
    monkeypatch.setattr(
        sg.sys,
        "argv",
        ["split_gate.py", "--strict", "--oracle-only", SF_SMALL,
         "event_type_counts", out],
    )
    assert sg.main() == 0


def test_pickle_embeds_provenance(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    out = str(tmp_path / "half.pkl")
    sg.spark_phase(SF_SMALL, "event_type_counts", out)
    import pickle

    with open(out, "rb") as f:
        prov = pickle.load(f)["provenance"]
    assert prov["query"] == "event_type_counts"
    assert prov["sf_dir"] == os.path.abspath(SF_SMALL)
    assert len(prov["git_head"]) == 40  # a real commit hash, not "unknown"


def test_oracle_only_refuses_wrong_query_pickle(spark, tmp_path, monkeypatch):
    """A pickle from a DIFFERENT query must fail the gate loudly — a
    schema-compatible stale half would otherwise green-wash the verdict
    for a Spark half that never ran."""
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    out = str(tmp_path / "half.pkl")
    sg.spark_phase(SF_SMALL, "event_type_counts", out)
    assert sg.oracle_phase(
        SF_SMALL, "part_copurchase_triangles", out, strict=True
    ) is False


def test_oracle_only_warns_on_legacy_pickle(
    spark, tmp_path, monkeypatch, capsys
):
    """Pre-r14 pickles (no provenance) still replay — the r13 sf10
    Spark halves must stay usable — but with a loud warning."""
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    out = str(tmp_path / "half.pkl")
    sg.spark_phase(SF_SMALL, "event_type_counts", out)
    import pickle

    with open(out, "rb") as f:
        payload = pickle.load(f)
    del payload["provenance"]
    with open(out, "wb") as f:
        pickle.dump(payload, f)
    ok = sg.oracle_phase(SF_SMALL, "event_type_counts", out, strict=True)
    assert ok is True
    assert "NO provenance" in capsys.readouterr().out


def test_oracle_crash_preserves_spark_half(spark, tmp_path, monkeypatch):
    """An oracle-phase crash must leave the pickled Spark half on disk
    with the --oracle-only retry line printed — a cap retry must never
    re-pay the Spark minutes (r14: the kcore_exact OOM deleted a
    35-minute half before this guard existed)."""
    monkeypatch.setattr(type(spark), "stop", lambda self: None)

    def boom(sf_dir, name, in_path, strict):
        raise MemoryError("failed to pin block")

    monkeypatch.setattr(sg, "oracle_phase", boom)
    monkeypatch.setattr(sg.subprocess, "run", None)  # not reached

    # drive main() with the spark phase stubbed to an in-process run
    real_spark_phase = sg.spark_phase

    class _OK:
        returncode = 0

    def fake_run(cmd, cwd=None):
        real_spark_phase(cmd[-3], cmd[-2], cmd[-1])
        return _OK()

    monkeypatch.setattr(sg.subprocess, "run", fake_run)
    monkeypatch.setattr(sg.os, "getcwd", lambda: str(tmp_path))
    monkeypatch.setenv("TMPDIR", str(tmp_path))
    monkeypatch.setattr(
        sg.sys, "argv",
        ["split_gate.py", "--strict", SF_SMALL, "event_type_counts"],
    )
    assert sg.main() == 1
    import glob

    kept = glob.glob(str(tmp_path / "split_gate_event_type_counts_*.pkl"))
    assert kept, "spark-half pickle must survive an oracle crash"
