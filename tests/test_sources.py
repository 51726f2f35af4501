"""Source/sink abstraction: format round-trips; Iceberg gated by import-try."""

from __future__ import annotations

import pytest

from gazetteer_spark import sources


def test_parquet_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    p = str(tmp_path / "t_parquet")
    sources.write_table(df, p, "parquet")
    back = sources.read_table(spark, p)
    assert sorted(tuple(r) for r in back.collect()) == [(1, "a"), (2, "b")]


def test_csv_json_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    for fmt in ("csv", "json"):
        p = str(tmp_path / f"t_{fmt}")
        sources.write_table(df, p, fmt)
        back = sources.read_table(spark, p, fmt)
        assert back.count() == 2
        assert sorted(back.columns) == ["id", "v"]


def test_partitioned_sink(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "x", "a"), (2, "y", "b"), (3, "x", "c")], "id long, part string, v string"
    )
    p = str(tmp_path / "t_part")
    sources.write_table(df, p, "parquet", partition_by=("part",))
    import os

    assert sorted(d for d in os.listdir(p) if d.startswith("part=")) == [
        "part=x", "part=y",
    ]
    assert sources.read_table(spark, p).count() == 3


def test_iceberg_gated(spark, tmp_path):
    # the runtime jar is absent in this image: detection must return False
    # and the engine must not route table names to the Iceberg reader
    assert sources.iceberg_available(spark) is False
    with pytest.raises(Exception):
        sources.read_table(spark, str(tmp_path / "nonexistent"))


def test_unknown_format_rejected(spark, tmp_path):
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError, match="unknown format"):
        sources.write_table(df, str(tmp_path / "x"), "orcish")
    with pytest.raises(ValueError, match="unknown format"):
        sources.read_table(spark, "x", "orcish")
