"""Declared storage-layout / maintenance queries (SURVEY.md 2.1/2.12
EXT): Z-order clustering, runtime-filter join pruning, incremental
aggregate maintenance.

All three produce layout- or plan-invariant results, so each ships with
a plain-SQL DuckDB oracle: the *optimization* is in the physical plan
and file layout, which tests and `.explain` assert separately.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators import sketch, zorder
from ..tables import ORACLE_DEC_SUM, dec_sum, load
from .registry import query


def _sf_tag(sf_dir: str) -> str:
    return os.path.basename(os.path.normpath(sf_dir)) or "sf"


@query(
    "q_zorder_sink",
    oracle=f"""
    SELECT count(*) AS n,
           {ORACLE_DEC_SUM.format(col="l_extendedprice")} AS sum_price,
           min(l_partkey) AS min_pk, max(l_partkey) AS max_pk,
           min(l_suppkey) AS min_sk, max(l_suppkey) AS max_sk
    FROM lineitem
    WHERE l_partkey BETWEEN 200 AND 400 AND l_suppkey BETWEEN 10 AND 40
    """,
)
def q_zorder_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustered parquet layout (operators/zorder.py): lineitem
    rewritten clustered by the Morton code of (l_partkey, l_suppkey), so
    every file covers a compact 2-D neighborhood and parquet footer
    min/max stats skip files for predicates on EITHER dimension — the
    Delta ``OPTIMIZE ZORDER BY`` layout.  The read-back two-dimensional
    range aggregate matches the unclustered oracle (layout-invariant
    results; per-file stats narrowing is asserted in tests)."""
    out = f"/tmp/spark_graft_zorder_{_sf_tag(sf_dir)}"
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        zorder.write_zordered(
            load(spark, sf_dir, "lineitem").select(
                "l_partkey", "l_suppkey", "l_extendedprice"
            ),
            out,
            "l_partkey",
            "l_suppkey",
            num_files=8,
        )
    back = spark.read.parquet(out).where(
        F.col("l_partkey").between(200, 400)
        & F.col("l_suppkey").between(10, 40)
    )
    return back.agg(
        F.count(F.lit(1)).alias("n"),
        dec_sum("l_extendedprice", "sum_price"),
        F.min("l_partkey").alias("min_pk"),
        F.max("l_partkey").alias("max_pk"),
        F.min("l_suppkey").alias("min_sk"),
        F.max("l_suppkey").alias("max_sk"),
    )


@query(
    "q_bloom_prune_join",
    oracle=f"""
    SELECT o_orderpriority,
           count(*) AS n,
           {ORACLE_DEC_SUM.format(col="l_extendedprice")} AS sum_price
    FROM lineitem
    JOIN orders ON o_orderkey = l_orderkey
    WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 150000
    GROUP BY o_orderpriority
    """,
)
def q_bloom_prune_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime-filter join pruning (sketch.hash_bucket_prefilter): the
    selective orders side collapses to ≤ m hash buckets per seed
    (fixed-size summary, broadcastable at ANY build cardinality — unlike
    the key set itself); lineitem is semi-join pre-filtered before the
    exact shuffle join, so only probe rows that can match ever shuffle.
    False negatives impossible ⇒ result equals the plain join oracle."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    build = load(spark, sf_dir, "orders").where(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_totalprice") > 150000)
    )
    pruned = sketch.hash_bucket_prefilter(
        li, build, "l_orderkey", "o_orderkey", m=4096, seeds=(41, 97)
    )
    return (
        pruned.join(
            build.select("o_orderkey", "o_orderpriority"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dec_sum("l_extendedprice", "sum_price"),
        )
    )


@query(
    "q_incremental_agg",
    oracle=f"""
    SELECT event_type,
           count(*) AS n,
           {ORACLE_DEC_SUM.format(col="value")} AS sum_value
    FROM events
    GROUP BY event_type
    """,
)
def q_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance (materialized-view refresh):
    partial aggregates over the FIRST 80% of events (by event_id high
    watermark) are persisted as the stored MV; the query merges them
    with partials over only the 20% delta — count and DECIMAL sum are
    commutative monoids, so merged == full recompute (the oracle).  At
    100 TB the refresh reads the delta + an aggregate-sized MV instead
    of re-scanning the fact table; the decimal-typed stored sum keeps
    the merge exact across checkpoints."""
    ev = load(spark, sf_dir, "events")
    cutoff = ev.agg(F.expr("max(event_id) * 4 div 5")).collect()[0][0]

    def partials(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("dec_sum"),
        )

    mv_path = f"/tmp/spark_graft_incragg_{_sf_tag(sf_dir)}"
    if not os.path.exists(os.path.join(mv_path, "_SUCCESS")):
        partials(ev.where(F.col("event_id") <= cutoff)).write.mode(
            "overwrite"
        ).parquet(mv_path)
    stored = spark.read.parquet(mv_path)
    delta = partials(ev.where(F.col("event_id") > cutoff))
    return (
        stored.unionByName(delta)
        .groupBy("event_type")
        .agg(
            F.sum("n").alias("n"),
            F.round(F.sum("dec_sum").cast("double"), 2).alias("sum_value"),
        )
    )


@query(
    "q_compact_small_files",
    oracle=f"""
    SELECT event_type, count(*) AS n,
           {ORACLE_DEC_SUM.format(col="value")} AS sum_value
    FROM events
    GROUP BY event_type
    """,
)
def q_compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction (the OPTIMIZE/bin-packing maintenance op):
    a fragmented table (64 shards — what per-micro-batch streaming
    writes or over-parallel jobs leave behind) is rewritten into 4
    right-sized files.  Small files are a top-3 operational scale
    problem: footer/open overhead per file, task-per-file scheduling,
    and memory-starved row groups; compaction is coalesce-rewrite, NO
    shuffle (coalesce merges co-located splits).  Both layouts are read
    back and the aggregate matches the source oracle — compaction is
    lossless."""
    tag = _sf_tag(sf_dir)
    frag = f"/tmp/spark_graft_frag_{tag}"
    compact = f"/tmp/spark_graft_compact_{tag}"
    ev = load(spark, sf_dir, "events").select("event_type", "value")
    if not os.path.exists(os.path.join(frag, "_SUCCESS")):
        ev.repartition(64).write.mode("overwrite").parquet(frag)
    if not os.path.exists(os.path.join(compact, "_SUCCESS")):
        spark.read.parquet(frag).coalesce(4).write.mode(
            "overwrite"
        ).parquet(compact)
    back = spark.read.parquet(compact)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        dec_sum("value", "sum_value"),
    )


@query(
    "q_bucketed_join",
    oracle=f"""
    SELECT o_orderpriority, count(*) AS n_items,
           {ORACLE_DEC_SUM.format(col="l_extendedprice")} AS sum_price
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderdate >= DATE '1995-01-01'
    GROUP BY o_orderpriority
    """,
)
def q_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located join — the storage-layout half of shuffle
    elimination (the brief's "pre-partition for co-located joins"):
    lineitem and orders are written ONCE as external bucketed tables
    (``bucketBy(8, <orderkey>)`` + in-bucket sort, Hive-compatible file
    naming), after which EVERY join on the bucket key runs with ZERO
    Exchange on either side — the scans come up pre-partitioned and
    pre-sorted, so SortMergeJoin starts immediately
    (``tests/test_plan_properties.py::test_bucketed_join_no_exchange``
    pins ``Bucketed: true`` scans and an Exchange-free join subtree).
    At 100 TB this is THE amortization: one bucketed rewrite, then every
    daily fact-to-fact join on the key skips both terabyte shuffles.

    The aggregate (priority-level revenue after a date filter)
    hash-matches the plain-SQL oracle, proving the layout transform is
    semantics-free."""
    tag = _sf_tag(sf_dir).replace(".", "_")  # identifier-safe ("sf0.01")
    spec = (
        ("lineitem", "l_orderkey"),
        ("orders", "o_orderkey"),
    )
    for name, key in spec:
        tbl = f"nes_bucketed_{name}_{tag}"
        if not spark.catalog.tableExists(tbl):
            (
                load(spark, sf_dir, name)
                .write.format("parquet")
                .option("path", f"/tmp/spark_graft_bucketed_{tag}/{name}")
                .mode("overwrite")
                .bucketBy(8, key)
                .sortBy(key)
                .saveAsTable(tbl)
            )
    li = spark.table(f"nes_bucketed_lineitem_{tag}")
    od = spark.table(f"nes_bucketed_orders_{tag}").where(
        F.col("o_orderdate") >= F.lit("1995-01-01").cast("date")
    )
    return (
        li.join(od, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dec_sum("l_extendedprice", "sum_price"),
        )
    )


@query(
    "q_schema_evolution",
    oracle="""
    WITH d AS (
        SELECT doc_id, source,
               CAST(length(text) AS BIGINT) AS text_len,
               doc_id % 2 AS gen
        FROM documents
    )
    SELECT CAST(gen AS BIGINT) AS gen,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(text_len) AS BIGINT) AS len_sum,
           CAST(sum(CASE WHEN gen = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_lang_null,
           CAST(count(DISTINCT CASE WHEN gen = 1 THEN source END)
                AS BIGINT) AS n_langs
    FROM d GROUP BY gen
    """,
)
def q_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet SCHEMA EVOLUTION read (``mergeSchema``): generation 0 of
    a dataset was written WITHOUT the ``lang`` column, generation 1
    WITH it — the layout every long-lived ingest pipeline accumulates
    as its schema grows.  The union read must reconcile the two file
    schemas (new column nulled for old files), and the audit aggregates
    per generation: doc count, byte mass, how many rows carry the
    nulled column, and the distinct values the new column actually
    holds.  A silent mis-merge (column dropped, or old rows given a
    default instead of NULL) shifts a count and breaks the hash.

    Scale: schema merge costs one footer read per FILE (not per row) at
    planning time; the data path stays columnar.  The maintenance
    posture (write-once temp layout keyed by sf) matches
    q_compact_small_files."""
    tag = _sf_tag(sf_dir)
    root = f"/tmp/spark_graft_evolve_{tag}"
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.length("text").cast("long").alias("text_len"),
        (F.col("doc_id") % 2).cast("long").alias("gen"),
    )
    g0, g1 = f"{root}/g0", f"{root}/g1"
    if not os.path.exists(os.path.join(g0, "_SUCCESS")):
        docs.where(F.col("gen") == 0).select(
            "doc_id", "text_len", "gen"
        ).write.mode("overwrite").parquet(g0)
    if not os.path.exists(os.path.join(g1, "_SUCCESS")):
        docs.where(F.col("gen") == 1).select(
            "doc_id",
            "text_len",
            "gen",
            F.col("source").alias("lang"),
        ).write.mode("overwrite").parquet(g1)
    merged = spark.read.option("mergeSchema", "true").parquet(g0, g1)
    return merged.groupBy("gen").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("text_len").cast("long").alias("len_sum"),
        F.sum(F.when(F.col("lang").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_lang_null"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
    )


@query(
    "q_content_address",
    oracle="""
    WITH h AS (
        SELECT doc_id, sha256(text) AS cid FROM documents
    ),
    s AS (
        SELECT cid,
               CAST(concat('0x', substring(cid, 1, 2)) AS BIGINT) AS shard,
               doc_id
        FROM h
    )
    SELECT shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT cid) AS BIGINT) AS n_objects,
           min(cid) AS first_cid
    FROM s GROUP BY shard
    """,
)
def q_content_address(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTENT-ADDRESSED storage audit (the CAS layout object stores
    and dedup-by-digest pipelines use): every document keyed by
    sha256(text), sharded by the digest's first byte — per shard the
    doc count, distinct object count (dedup granularity), and the
    lexicographically first content id.  SHA-256 is the second hash
    both engines implement bit-identically (Spark ``sha2(x, 256)`` ==
    DuckDB ``sha256``), extending the md5-only cross-engine hash
    vocabulary this repo's oracles had until now.

    Scale: digests shuffle (32 bytes/row), documents never move; the
    256-way shard histogram is the balance audit before a digest-
    partitioned write."""
    docs = load(spark, sf_dir, "documents")
    h = docs.select("doc_id", F.sha2(F.col("text"), 256).alias("cid"))
    s = h.select(
        "cid",
        F.conv(F.substring("cid", 1, 2), 16, 10).cast("long").alias("shard"),
    )
    return s.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("cid").cast("long").alias("n_objects"),
        F.min("cid").alias("first_cid"),
    )


@query(
    "q_partition_overwrite_dynamic",
    oracle="""
    WITH src AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN user_id % 10 = 3 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_v2
        FROM events GROUP BY event_type
    )
    SELECT event_type,
           CASE WHEN event_type = 'click' THEN n_v2 ELSE n END AS n_rows,
           CAST(CASE WHEN event_type = 'click' THEN 2 ELSE 1 END AS BIGINT)
               AS version
    FROM src
    """,
)
def q_partition_overwrite_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC partition overwrite (``partitionOverwriteMode=dynamic``)
    — the incremental-reprocessing write pattern: v1 writes the full
    event table partitioned by event_type; a v2 job recomputes ONLY the
    'click' partition (a filtered subset tagged version=2) and
    overwrites in dynamic mode, which must replace exactly the
    partitions present in the incoming data and leave every other
    partition's files untouched (STATIC mode would wipe them — the
    classic data-loss foot-gun this mode exists to fix).  The read-back
    audit pins both effects: 'click' carries v2's rows and version tag,
    all other types still carry v1's.

    Scale: the overwrite's unit of work is the PARTITION, so a 100 TB
    table's nightly re-run rewrites only the touched partitions'
    files; the audit is one read-back aggregate."""
    tag = _sf_tag(sf_dir)
    path = f"/tmp/spark_graft_dynover_{tag}"
    ev = load(spark, sf_dir, "events").select("event_type", "user_id")
    marker = os.path.join(path, "_v2_done")
    if not os.path.exists(marker):
        ev.withColumn("version", F.lit(1).cast("long")).write.mode(
            "overwrite"
        ).partitionBy("event_type").parquet(path)
        v2 = (
            ev.where(
                (F.col("event_type") == "click") & (F.col("user_id") % 10 == 3)
            )
            .withColumn("version", F.lit(2).cast("long"))
        )
        (
            v2.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("event_type")
            .parquet(path)
        )
        open(marker, "w").close()
    back = spark.read.parquet(path)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.max("version").cast("long").alias("version"),
    )


@query(
    "q_csv_permissive",
    oracle="""
    WITH src AS (
        SELECT event_id, event_type,
               CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents,
               event_id % 7 = 0 AS corrupt
        FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN corrupt THEN 1 ELSE 0 END) AS BIGINT)
               AS n_corrupt,
           CAST(sum(CASE WHEN corrupt THEN 0 ELSE cents END) AS BIGINT)
               AS cents_sum
    FROM src GROUP BY event_type
    """,
)
def q_csv_permissive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERMISSIVE CSV ingestion with corrupt-record capture — the
    dirty-feed reality every ingest layer handles: a CSV export of the
    events table is synthesized with a deterministic 1-in-7 corruption
    (the numeric column replaced by a non-numeric token), read back
    with an explicit schema + ``columnNameOfCorruptRecord``, and the
    audit counts rows, captured corrupt records, and the value sum over
    clean rows per type.  PERMISSIVE semantics under test: the bad
    TOKEN nulls out, the row's other fields still parse (so the group
    key survives), and the raw line lands in the corrupt column —
    FAILFAST would kill the job, DROPMALFORMED would silently lose the
    1-in-7 (both wrong for an auditable pipeline).

    Scale: CSV parse is per-row scan work; the corrupt-capture column
    costs nothing on clean rows.  The write-once layout is keyed by sf
    (the q_compact_small_files posture)."""
    tag = _sf_tag(sf_dir)
    path = f"/tmp/spark_graft_csvperm_{tag}"
    ev = load(spark, sf_dir, "events")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        lines = ev.select(
            F.concat_ws(
                ",",
                F.col("event_id").cast("string"),
                F.col("event_type"),
                F.when(F.col("event_id") % 7 == 0, F.lit("xx")).otherwise(
                    F.floor(F.col("value") * 100.0 + F.lit(0.5))
                    .cast("long")
                    .cast("string")
                ),
            ).alias("value")
        )
        lines.coalesce(4).write.mode("overwrite").text(path)
    schema = (
        "event_id BIGINT, event_type STRING, cents BIGINT, _bad STRING"
    )
    back = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_bad")
        .csv(path)
    )
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.when(F.col("_bad").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_corrupt"),
        F.sum(F.coalesce(F.col("cents"), F.lit(0)))
        .cast("long")
        .alias("cents_sum"),
    )


# ---------------------------------------------------------------------------
# Hilbert-curve clustering audit (round 9b)
# ---------------------------------------------------------------------------


def _hilbert_cluster_oracle() -> str:
    from ..operators.hilbert import hilbert_oracle_rounds

    return f"""
    WITH bounds AS (
        SELECT min(l_partkey) AS lpa, max(l_partkey) AS hpa,
               min(l_suppkey) AS lpb, max(l_suppkey) AS hpb
        FROM lineitem
    ),
    base AS (
        SELECT l_partkey AS pk, l_suppkey AS sk,
               CAST((l_partkey - b.lpa) AS BIGINT) * 255
                   // (b.hpa - b.lpa) AS x,
               CAST((l_suppkey - b.lpb) AS BIGINT) * 255
                   // (b.hpb - b.lpb) AS y
        FROM lineitem, bounds b
    ),
    {hilbert_oracle_rounds("base", "pk, sk", order=8)}
    SELECT d // 1365 AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(pk) AS BIGINT) AS min_pk,
           CAST(max(pk) AS BIGINT) AS max_pk,
           CAST(min(sk) AS BIGINT) AS min_sk,
           CAST(max(sk) AS BIGINT) AS max_sk,
           CAST(max(pk) - min(pk) AS BIGINT) AS span_pk,
           CAST(max(sk) - min(sk) AS BIGINT) AS span_sk
    FROM h_8 GROUP BY 1
    """


@query("q_hilbert_cluster", oracle=_hilbert_cluster_oracle())
def q_hilbert_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HILBERT-CURVE 2-D clustering audit (Faloutsos & Roseman 1989):
    every lineitem row mapped to its order-8 Hilbert index over the
    min/max-scaled (l_partkey, l_suppkey) grid, cut into 49 curve
    segments by `d div 1365` — 48 full 1365-cell segments plus a 16-cell
    remainder bucket (49 × 1365 = 66,885 > 65,536; ADVICE r09 corrected
    the earlier "48 equal segments" prose — the CONSTANT stays, the
    committed hash evidence pins it).  1365 is deliberately NOT a power
    of 4: aligned
    4^k segments tile both curves into identical quadrant blocks and
    the comparison degenerates; real file counts aren't powers of 4
    either), and per segment the bounding box of BOTH keys — the
    per-file min/max footprint a Hilbert-clustered layout would give
    the scan pruner.  Hilbert beats Z-order because the curve has no
    long jumps: segment bboxes stay compact everywhere, where Morton
    segments straddling a quadrant seam cover half the grid —
    tests/test_round9c_ops.py pins the win on the dense grid (summed
    bbox area 97k vs 173k at these 48 cuts; operators/hilbert.py has
    the full argument).

    The index itself is hash-gated: ONE aggregate-HOF fold over the 8
    bit levels (JVM codegen, linear expression tree — a per-level
    Column rewrite would double the tree each level), mirrored by 8
    unrolled CTE rounds in DuckDB (the q_dtw_band device).  The fold
    runs over the 64Ki-cell DOMAIN TABLE (order-8 grid = 256×256),
    which then broadcast-joins onto the fact rows — the fact scan pays
    one hash probe per row instead of the 8-level fold (A/B at ×10:
    fold 38 s, lookup 2.1 s — an 18× win; the same plan holds at any
    corpus size because the domain is order-bounded, not data-bounded).
    Bounds ride a 1-row scalar agg (the zorder zvalue posture); the
    bucket audit is one map-side-combinable 48-group aggregate."""
    from ..operators.hilbert import hilbert_expr

    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    lo_a, hi_a, lo_b, hi_b = li.agg(
        F.min("l_partkey"),
        F.max("l_partkey"),
        F.min("l_suppkey"),
        F.max("l_suppkey"),
    ).collect()[0]
    # Zero-span guard (ADVICE r09): a degenerate constant key would make
    # `div 0` NULL in Spark (rows silently vanish through the LUT join)
    # while DuckDB raises — divergent failure modes.  Same policy as
    # write_hilbert_clustered: a zero span maps to constant cell 0.
    def _scale(col: str, lo: int, hi: int) -> str:
        if hi == lo:
            return "CAST(0 AS BIGINT)"
        return f"CAST(({col} - {lo}) AS BIGINT) * 255 div {hi - lo}"

    keyed = li.select(
        F.col("l_partkey").alias("pk"),
        F.col("l_suppkey").alias("sk"),
        F.expr(_scale("l_partkey", lo_a, hi_a)).alias("hx"),
        F.expr(_scale("l_suppkey", lo_b, hi_b)).alias("hy"),
    )
    lut = spark.range(256 * 256).select(
        (F.col("id") % 256).alias("hx"),
        F.expr("id div 256").alias("hy"),
    )
    lut = lut.withColumn("d", hilbert_expr("hx", "hy", order=8))
    d = keyed.join(F.broadcast(lut), ["hx", "hy"])
    return d.groupBy(F.expr("d div 1365").alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("pk").cast("long").alias("min_pk"),
        F.max("pk").cast("long").alias("max_pk"),
        F.min("sk").cast("long").alias("min_sk"),
        F.max("sk").cast("long").alias("max_sk"),
        (F.max("pk") - F.min("pk")).cast("long").alias("span_pk"),
        (F.max("sk") - F.min("sk")).cast("long").alias("span_sk"),
    )


# ---------------------------------------------------------------------------
# First-Fit-Decreasing compaction bin packing (round 9b)
# ---------------------------------------------------------------------------

_FFD_GROUPS = 40  # input file-groups (doc_id % 40)
_FFD_BINS = 8  # output files


def _ffd_oracle() -> str:
    nb = _FFD_BINS
    cols = ", ".join(f"CAST(0 AS BIGINT) AS b{i}" for i in range(1, nb + 1))
    parts = [
        f"""WITH g AS (
        SELECT doc_id % {_FFD_GROUPS} AS grp,
               CAST(sum(n_chars) AS BIGINT) AS bytes
        FROM documents GROUP BY 1
    ),
    it AS (
        SELECT grp, bytes,
               row_number() OVER (ORDER BY bytes DESC, grp) AS rnk
        FROM g
    ),
    capt AS (
        SELECT greatest(CAST(sum(bytes) AS BIGINT) * 5 // 32,
                        CAST(max(bytes) AS BIGINT)) AS cap
        FROM g
    ),
    s_0 AS (SELECT CAST(NULL AS BIGINT) AS grp, CAST(NULL AS BIGINT)
                   AS bytes, CAST(NULL AS BIGINT) AS bin, {cols})"""
    ]
    first_fit = " ".join(
        f"WHEN s.b{i} + i.bytes <= (SELECT cap FROM capt) THEN {i}"
        for i in range(1, nb + 1)
    )
    minload = "least(" + ", ".join(f"s.b{i}" for i in range(1, nb + 1)) + ")"
    argmin = " ".join(
        f"WHEN s.b{i} = {minload} THEN {i}" for i in range(1, nb + 1)
    )
    for k in range(1, _FFD_GROUPS + 1):
        newloads = ", ".join(
            f"s.b{i} + CASE WHEN ch.bin = {i} THEN i.bytes ELSE 0 END"
            f" AS b{i}"
            for i in range(1, nb + 1)
        )
        parts.append(
            f"""s_{k} AS MATERIALIZED (
        SELECT i.grp, i.bytes, ch.bin, {newloads}
        FROM s_{k - 1} s,
             (SELECT grp, bytes FROM it WHERE rnk = {k}) i,
             LATERAL (SELECT CASE {first_fit}
                             ELSE (CASE {argmin} END) END AS bin) ch
    )"""
        )
    finals = " UNION ALL ".join(
        f"SELECT grp, bytes, CAST({k} AS BIGINT) AS rnk, bin FROM s_{k}"
        for k in range(1, _FFD_GROUPS + 1)
    )
    return ",\n    ".join(parts) + "\n    " + finals


@query("q_ffd_binpack", oracle=_ffd_oracle())
def q_ffd_binpack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST-FIT-DECREASING compaction planning (Johnson 1973, the
    11/9·OPT+1 classic): 40 input file-groups packed by byte mass into
    8 output files of capacity max(totalx5/32, largest input) — the bin
    assignment a compaction service computes before rewriting small
    files (q_compact_small_files executes a fixed plan; this PLANS one;
    q_shard_plan's head-to-tail cut is the order-preserving
    alternative).  First fit scans bins in index order; when nothing
    fits, the least-loaded bin takes the overflow (smallest-index tie).

    Scale: the only fact-scale work is the per-group byte aggregate —
    packing runs on FILE METADATA (the group table), which is bounded
    by file count, not corpus size; the plan is an inherently
    sequential greedy, so it runs driver-side on the collected
    ~40-row metadata table (the file-footer-stats collect class) and
    the oracle unrolls the 40 placement rounds with the 8 bin loads as
    CTE columns."""
    docs = load(spark, sf_dir, "documents")
    g = docs.groupBy((F.col("doc_id") % _FFD_GROUPS).alias("grp")).agg(
        F.sum("n_chars").cast("long").alias("bytes")
    )
    items = sorted(
        ((r["bytes"], r["grp"]) for r in g.collect()),
        key=lambda t: (-t[0], t[1]),
    )
    total = sum(b for b, _ in items)
    cap = max(total * 5 // 32, max(b for b, _ in items))
    loads = [0] * _FFD_BINS
    rows = []
    for rnk, (bts, grp) in enumerate(items, start=1):
        bin_idx = next(
            (
                i
                for i in range(_FFD_BINS)
                if loads[i] + bts <= cap
            ),
            None,
        )
        if bin_idx is None:
            bin_idx = min(range(_FFD_BINS), key=lambda i: (loads[i], i))
        loads[bin_idx] += bts
        rows.append((int(grp), int(bts), rnk, bin_idx + 1))
    return spark.createDataFrame(
        rows, "grp long, bytes long, rnk long, bin long"
    )
