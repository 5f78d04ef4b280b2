"""Source/sink dispatch — the reference's DfSet family, Spark-first.

Parity map (SURVEY §2.1): ``make_dfset`` factory-by-filetype
(reference: python/dfset.py:624-646) → ``read_table``/``write_table``
format dispatch; ``CsvDfSet`` (python/dfset.py:424-442) → ``spark.read
.csv(header, inferSchema)``; ``copy_from_csvs_dir`` (python/dfset.py:
96-111) → a directory-wide csv read; ``ParquetDfSet`` with
``compression=None`` so codec effects stay measurable
(python/dfset.py:578-597) → ``write_table(..., compression='none')``.
One-file-per-column storage has no Spark analog (Parquet is already
columnar inside row groups), so tables are whole DataFrames.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

_EXT_FMT = {".parquet": "parquet", ".csv": "csv", ".json": "json"}


def _infer_fmt(path: str, fmt: str | None) -> str:
    if fmt:
        return fmt
    ext = os.path.splitext(path)[1].lower()
    if ext in _EXT_FMT:
        return _EXT_FMT[ext]
    return "parquet"


def read_table(
    spark: SparkSession, path: str, fmt: str | None = None, schema=None
) -> DataFrame:
    """Format-dispatched scan (csv reads get header+schema inference unless
    an explicit schema pins the types)."""
    fmt = _infer_fmt(path, fmt)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        return reader.options(
            header=True, **({} if schema is not None else {"inferSchema": True})
        ).csv(path)
    if fmt == "json":
        return reader.json(path)
    return reader.parquet(path)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str | None = None,
    mode: str = "overwrite",
    compression: str | None = None,
) -> None:
    """Format-dispatched sink. ``compression='none'`` mirrors the
    reference's uncompressed-parquet baseline so the engine codec's effect
    is measurable in isolation."""
    fmt = _infer_fmt(path, fmt)
    writer = df.write.mode(mode)
    if compression is not None:
        writer = writer.option("compression", compression)
    if fmt == "csv":
        writer.option("header", True).csv(path)
    elif fmt == "json":
        writer.json(path)
    else:
        writer.parquet(path)


def copy_from_csv_dir(
    spark: SparkSession, dirpath: str, schema=None
) -> DataFrame:
    """Ingest a directory of CSVs as one DataFrame (reference:
    copy_from_csvs_dir, python/dfset.py:96-111)."""
    return read_table(spark, dirpath, fmt="csv", schema=schema)
