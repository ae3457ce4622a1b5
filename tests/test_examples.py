"""The flagship example must run end-to-end offline: extraction (canned
payloads) → fusion → quality gate → star schema parquet with zero orphans.
"""

from __future__ import annotations

import sys


def test_multi_source_pipeline_offline(spark, tmp_path):
    sys.path.insert(0, "examples")
    from examples.multi_source_pipeline import main

    out = main(output_dir=str(tmp_path))
    assert all(r.success for r in out["results"].values())
    assert out["fused_rows"] == 3
    assert out["report"].passed
    assert out["build"].success
    assert out["build"].rows_by_table == {
        "dim_country": 3,
        "fact_country_indicators": 3,
    }
    assert set(out["orphans"].values()) == {0}
    # written parquet is readable with the expected grain
    dim = spark.read.parquet(str(tmp_path / "dim_country"))
    assert dim.count() == 3 and "country_sk" in dim.columns
