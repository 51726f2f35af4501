"""Source/sink abstraction: Iceberg when available, parquet otherwise.

The north-rule input is "an Iceberg table of source-code repositories".
This container has no Iceberg runtime jar, so the engine reads/writes
parquet and supplies its own Iceberg-style commit layer (index/spimi.py
manifests). When the jar IS on the classpath, `read_table`/`write_table`
route through the real catalog — the engine code does not change.

Reference parity for the sink surface: gazetteer writes line-delimited JSON
(`join/out_handlers/GazetteerOutWriter.java`) and CSV with typed column
extractors (`out/CSVOutWriter.java`); :func:`write_table` covers json/csv
for export interchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

SOURCE_SCHEMA = "repo string, path string, commit string, lang string, content string"


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        return True
    except Exception:
        return False


def read_table(spark: SparkSession, location: str, fmt: str | None = None) -> DataFrame:
    """Read a table by location/name.

    fmt=None auto-detects: ``catalog.db.table`` names go to Iceberg (if the
    runtime is present), paths go to parquet; explicit 'csv'/'json' for
    interchange files."""
    if fmt is None:
        fmt = "iceberg" if ("/" not in location and iceberg_available(spark)) else "parquet"
    if fmt == "iceberg":
        return spark.read.format("iceberg").load(location)
    if fmt == "parquet":
        return spark.read.parquet(location)
    if fmt == "csv":
        return spark.read.csv(location, header=True, inferSchema=False)
    if fmt == "json":
        return spark.read.json(location)
    raise ValueError(f"unknown format {fmt!r}")


def write_table(
    df: DataFrame, location: str, fmt: str = "parquet",
    mode: str = "overwrite", partition_by: tuple[str, ...] = (),
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if fmt == "iceberg":
        w.format("iceberg").save(location)
    elif fmt == "parquet":
        w.parquet(location)
    elif fmt == "csv":
        w.option("header", True).csv(location)
    elif fmt == "json":
        w.json(location)
    else:
        raise ValueError(f"unknown format {fmt!r}")
