"""Decompose q_link_predict's cost (VERDICT r12 item #3): time each
sub-plan with the noop sink in ONE session — edge build, wedge join,
anti join, degree joins, top-k — so the optimization targets the stage
that actually costs, not the one the plan suggests.

Usage: python scripts/probe_wedge.py
Builder-side measurement tooling only.
"""

from __future__ import annotations

import os
import sys
import time

import pyspark.sql.functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nomad_event_streamer_spark.operators.graph import (  # noqa: E402
    coactivity_edges,
)
from nomad_event_streamer_spark.session import get_spark  # noqa: E402
from nomad_event_streamer_spark.tables import events  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def timed(label: str, fn, n: int = 3) -> float:
    runs = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        runs.append(round(time.perf_counter() - t0, 3))
    med = sorted(runs)[len(runs) // 2]
    print(f"# {label}: median {med:.3f}s runs={runs}", file=sys.stderr, flush=True)
    return med


def main() -> None:
    spark = get_spark(master=f"local[{CPUS}]")
    sc = spark.sparkContext

    def cell():
        return (
            events(spark, SF_DIR)
            .select(
                "user_id",
                "event_type",
                F.expr("ts_us div 3600000000").alias("h"),
            )
            .distinct()
        )

    # warm
    force(cell())

    sc.setJobDescription("probe: cell distinct")
    timed("cell_distinct", lambda: force(cell()))

    sc.setJobDescription("probe: edge build (no cut)")
    timed("edges_nocut", lambda: force(coactivity_edges(cell(), min_cells=3)))

    sc.setJobDescription("probe: edge build + eager cut")
    timed(
        "edges_cut",
        lambda: coactivity_edges(cell(), min_cells=3).localCheckpoint(
            eager=True
        ),
    )

    # a fixed checkpointed edge table for the downstream probes
    e = coactivity_edges(cell(), min_cells=3).localCheckpoint(eager=True)

    nb = e.select(F.col("a").alias("x"), F.col("b").alias("y")).unionAll(
        e.select(F.col("b").alias("x"), F.col("a").alias("y"))
    )
    deg = nb.groupBy("x").agg(F.count(F.lit(1)).cast("long").alias("d"))

    sc.setJobDescription("probe: degrees only")
    timed("degrees", lambda: force(deg))

    j1 = nb.select(F.col("x").alias("m"), F.col("y").alias("a"))
    j2 = nb.select(F.col("x").alias("m"), F.col("y").alias("b"))
    wedge = (
        j1.join(j2, "m")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    sc.setJobDescription("probe: wedge agg from cut e")
    timed("wedge_agg", lambda: force(wedge))

    cand = wedge.join(e, ["a", "b"], "left_anti")
    sc.setJobDescription("probe: wedge + anti")
    timed("wedge_anti", lambda: force(cand))

    scored_full = (
        cand.join(
            deg.select(F.col("x").alias("a"), F.col("d").alias("da")), "a"
        )
        .join(deg.select(F.col("x").alias("b"), F.col("d").alias("db")), "b")
        .select(
            "a",
            "b",
            "n_common",
            F.expr("(n_common * 1000) div (da + db - n_common)")
            .cast("long")
            .alias("jacc_milli"),
        )
    )
    sc.setJobDescription("probe: + degree joins")
    timed("scored", lambda: force(scored_full))

    top = scored_full.orderBy(
        F.col("n_common").desc(),
        F.col("jacc_milli").desc(),
        F.col("a").asc(),
        F.col("b").asc(),
    ).limit(20)
    sc.setJobDescription("probe: + topk")
    timed("topk", lambda: force(top))

    # the registered query end to end (its own fresh edge build + cut)
    from nomad_event_streamer_spark.plans import all_queries

    q = all_queries()["q_link_predict"]
    sc.setJobDescription("probe: full q_link_predict")
    timed("full_query", lambda: force(q(spark, SF_DIR)))
    sc.setJobDescription(None)


if __name__ == "__main__":
    main()
