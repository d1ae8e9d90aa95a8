"""PySpark-native analytics engine with the capabilities of
axsuul/nomad-event-streamer, rebuilt Spark-first.

The reference (``/root/reference/app.rb:1-278``) is a single-threaded Ruby
stream processor: NDJSON over HTTP -> nested-JSON event walk -> stateful
per-key dedup -> filters -> classification -> webhook fan-out.  This package
re-expresses every one of those dataflow operators as idiomatic
DataFrame / Structured Streaming plans (so Catalyst + Tungsten pick the
physical strategy), and adds the relational + LLM-data-pipeline operator
surface mandated by the build contract (SURVEY.md section 2).

Layout:
    session    SparkSession builder + runtime confs (AQE, Arrow, ns-parquet)
    tables     testdata parquet loaders with canonical column handling
    plans      declared q_* queries + DuckDB oracle SQL (the t2 surface)
    operators  dedup / similarity / text-analysis / multimodal building blocks
    functions  REF-derived scalar logic (classification, identifiers)
    sources    NDJSON incremental parser + Nomad stream DataSource
    streaming  the REF pipeline as Structured Streaming + stateful dedup
"""

__version__ = "0.1.0"
