"""Training-corpus export: hash-sharded JSONL, the interchange format LLM
data pipelines consume (one JSON object per line, fixed shard count).

The reference's only sink is parquet (src/transformers/base_transformer.py
write path; SURVEY.md §2.A13). A corpus that feeds a tokenizer/training job
needs line-delimited shards with DETERMINISTIC membership: the same corpus
must always produce byte-identical shard assignment so exports are
resumable, diffable, and cacheable by shard. Shard = pmod(xxhash64(key),
n_shards) — content-independent, engine-stable, no RNG.

Scale: one hash-repartition to n_shards (the only shuffle), then a straight
JSON encode per partition — Spark's native JSON writer, no Python in the
row path. Shard count picks file size: at 100 TB target ~1 GB shards
(n_shards ≈ corpus_bytes / 1e9), far below the small-files regime and far
above the giant-file regime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SHARD_COL = "shard"


def with_shard(df: DataFrame, key_col: str, n_shards: int) -> DataFrame:
    """Attach the deterministic shard id pmod(xxhash64(key), n_shards)."""
    return df.withColumn(
        SHARD_COL,
        F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_shards)).cast("int"),
    )


def export_jsonl_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    n_shards: int,
    compression: str | None = None,
) -> None:
    """Write ``df`` as JSONL under ``path``, one directory per shard
    (``shard=K/``). Rows land in shards by key hash, so re-exporting the
    same frame reproduces the exact same membership; each shard is one
    output file (the pre-write repartition clusters shards, and JSON
    preserves every column including nested arrays/structs).
    """
    writer = (
        with_shard(df, key_col, n_shards)
        .repartition(n_shards, F.col(SHARD_COL))
        .write.partitionBy(SHARD_COL)
        .mode("overwrite")
    )
    if compression is not None:
        writer = writer.option("compression", compression)
    writer.json(path)


def read_jsonl_shards(spark, path: str, schema=None) -> DataFrame:
    """Round-trip reader: the shard id comes back as a partition column.
    Pass the export's schema to skip inference (mandatory at scale —
    inference scans the corpus twice)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.option("basePath", path).json(f"{path}/{SHARD_COL}=*")


def write_compacted_parquet(
    df: DataFrame,
    path: str,
    *,
    target_rows_per_file: int,
    partition_by: list[str] | None = None,
) -> int:
    """Small-files governance: write parquet with a bounded file count
    sized from the data — ``ceil(rows / target_rows_per_file)`` files —
    instead of one file per shuffle partition. A 100 TB pipeline that
    writes a 32-partition frame per run accretes millions of tiny files
    (metadata pressure on every subsequent scan); compacting at write
    time costs one round-robin repartition and keeps file sizes in the
    efficient scan range. Returns the file count used.

    With ``partition_by``, files-per-write applies per write overall (the
    repartition spreads rows evenly; hive partitioning then splits each
    task's rows into its partition directories)."""
    total = df.count()
    n_files = max(1, -(-total // target_rows_per_file))
    writer = df.repartition(n_files).write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    return n_files
