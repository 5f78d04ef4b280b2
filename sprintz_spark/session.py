"""SparkSession factory with engine defaults.

Scale notes (1000-executor / 100 TB target): these configs are the
local-mode stand-ins; on a real cluster the same settings apply with
shuffle.partitions sized ~2-3x total cores and AQE coalescing/skew-join
left on. Everything else (salting, bucketed encode groups, manifest
resume) is handled explicitly by the engine, not session conf.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession


def package_zip() -> str:
    """Zip the sprintz_spark package for --py-files-style shipping.

    Executors run their own Python workers that do NOT inherit the
    driver's sys.path; the package must travel via addPyFile/--py-files
    (north_star: 'ships as a spark-submit --py-files package').
    """
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    out = os.path.join(tempfile.gettempdir(), "sprintz_spark_pkg.zip")
    with zipfile.ZipFile(out, "w") as z:
        for root, _dirs, files in os.walk(pkg_dir):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    rel = os.path.join(
                        "sprintz_spark", os.path.relpath(full, pkg_dir)
                    )
                    z.write(full, rel)
    return out


def get_spark(
    app: str = "sprintz_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra: dict | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    b = (
        SparkSession.builder.appName(app)
        .master(master)
        # Arrow transfer for pandas UDFs — the codec hot path
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # AQE: runtime coalescing + skew-join splitting
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or int(cpus) * 2),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.addPyFile(package_zip())
    return spark
