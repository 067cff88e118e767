"""Batch source connectors beyond parquet.

The reference reads only Kafka topics (SURVEY §2 Part C: no file
formats at all); a complete engine ingests the common lake formats
with explicit schemas (schema inference is a correctness and
performance hazard at 100 TB — a schema-on-read engine should never
scan data twice to guess types).

Every reader takes an explicit StructType and returns a plain
DataFrame, so downstream operators are format-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    *,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    """CSV with explicit schema — no inferSchema pass.

    Scale note: inferSchema=True reads the data twice; with an explicit
    schema the scan is single-pass and the parser can fail fast on
    malformed rows (mode=FAILFAST surfaces corruption instead of
    silently nulling)."""
    return (
        spark.read.schema(schema)
        .option("header", header)
        .option("delimiter", delimiter)
        .option("mode", "FAILFAST")
        .csv(path)
    )


def read_json(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """JSON-lines with explicit schema (single-pass, FAILFAST)."""
    return spark.read.schema(schema).option("mode", "FAILFAST").json(path)


def read_delimited_text(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """The reference's wire format (value_format='delimited') as a
    batch source: raw text lines CSV-decoded into typed columns."""
    from streams_prototyping_spark.streaming.sources import decode_delimited

    return decode_delimited(spark.read.text(path), schema)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — the other columnar lake format (Hive-lineage
    warehouses). Spark's vectorized ORC reader gives the same
    pushdown/pruning properties as parquet (PushedFilters reach the
    scan; tests/test_sources.py pins the round trip), so operators
    stay format-agnostic."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def spark_avro_available(spark: SparkSession) -> bool:
    """True iff the external spark-avro data source is on the classpath."""
    try:
        spark.read.format("avro").load("/nonexistent-avro-probe")
    except Exception as e:  # noqa: BLE001
        return "Failed to find data source" not in str(e)
    return True  # pragma: no cover


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Avro scan (the reference ships Avro schemas for its datagen —
    src/main/resources/*.avro). Uses the external spark-avro module
    when it is on the classpath (vectorized JVM decode — the 100 TB
    path: ``--packages org.apache.spark:spark-avro_2.13:<version>``);
    otherwise falls back to the pure-Python Object Container File
    reader (avro_py, built from the public Avro spec), which
    parallelizes per file: Spark schedules one task per container file
    and each task decodes its own files via Arrow `mapInPandas` — no
    driver-side data movement, the same file-granular parallelism
    spark-avro has for deflate-coded files."""
    if spark_avro_available(spark):
        return spark.read.format("avro").load(path)  # pragma: no cover

    import glob as _glob
    import os

    from streams_prototyping_spark.sources import avro_py

    files = sorted(
        _glob.glob(os.path.join(path, "*.avro"))
        if os.path.isdir(path)
        else _glob.glob(path)
    )
    if not files:
        raise FileNotFoundError(f"no .avro files under {path!r}")
    schema = avro_py.read_avro_header(files[0])
    struct = avro_py.spark_struct_of(schema)
    names = [f.name for f in struct.fields]

    def decode(batches):
        import pandas as pd

        for pdf in batches:
            for fp in pdf["path"]:
                _, recs = avro_py.read_avro_file(fp)
                yield pd.DataFrame(
                    {n: [r[n] for r in recs] for n in names}, columns=names
                )

    paths = spark.createDataFrame(
        [(f,) for f in files], "path string"
    ).repartition(min(len(files), 32))
    return paths.mapInPandas(decode, struct)


def write_avro(df: DataFrame, path: str, mode: str = "overwrite") -> list:
    """Distributed Avro write: each partition encodes its rows to one
    part-NNNNN.avro container file from inside the executor (deflate
    codec), the standard part-file layout — the writer twin of
    read_avro's per-file parallel read. Returns [(file, rows)] so
    callers/tests can assert the layout. Timestamp columns must be
    converted to epoch longs first (the reference's own datagen
    schemas model time as unix_long — avro_schema_of raises
    actionably on unmapped types)."""
    import os

    from streams_prototyping_spark.sources import avro_py

    schema = avro_py.avro_schema_of(df.schema)
    names = df.columns
    if mode != "overwrite":
        # 'append' would need unique part-file names (uuid/task-attempt
        # suffix) to avoid silently clobbering same-pid files from a
        # previous write; 'error'/'ignore' aren't implemented either.
        # Refuse loudly rather than present data loss as success.
        raise NotImplementedError(
            f"write_avro supports only mode='overwrite', got {mode!r}"
        )
    if os.path.isdir(path):
        import shutil

        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)

    def encode(batches):
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        recs: list = []
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                recs.append(dict(zip(names, row)))
        if recs:
            fp = os.path.join(path, f"part-{pid:05d}.avro")
            avro_py.write_avro_file(fp, schema, recs)
            yield pd.DataFrame({"file": [fp], "rows": [len(recs)]})

    out = df.mapInPandas(encode, "file string, rows long")
    return [(r.file, r.rows) for r in out.collect()]
