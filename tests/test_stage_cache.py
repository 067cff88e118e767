"""stage_cache lifetime management — in particular the ADVICE r5
finding that Dataset.unpersist() is a NO-OP for localCheckpoint()ed
DataFrames (it consults the SQL cache manager; localCheckpoint persists
the raw RDD), so block release must go through the underlying RDD."""

from pyspark.sql import functions as F

from streams_prototyping_spark.stage_cache import release_local_checkpoint


def _persisted_rdd_ids(spark):
    info = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    return {info[i].id() for i in range(len(info))}


def test_release_local_checkpoint_frees_blocks(spark):
    before = _persisted_rdd_ids(spark)
    df = spark.range(50_000).select(F.col("id"), (F.col("id") * 2).alias("x"))
    cp = df.localCheckpoint()  # eager: blocks exist now
    held = _persisted_rdd_ids(spark) - before
    assert held, "localCheckpoint should have persisted an RDD"

    # the documented no-op: Dataset.unpersist does NOT release them
    cp.unpersist(blocking=True)
    assert _persisted_rdd_ids(spark) - before == held

    # the real release path
    release_local_checkpoint(cp)
    assert not (_persisted_rdd_ids(spark) - before)


def test_release_is_safe_on_non_checkpointed_frames(spark):
    df = spark.range(10)
    release_local_checkpoint(df)  # best-effort: must not raise
    assert df.count() == 10
