"""Round-8 curation operators: URL canonicalization + domain rollup,
encoding-damage (mojibake) detection, PII scanning, license
classification, Kneser-Ney bigram LM, source-concentration HHI, and
balanced output-shard planning (SURVEY.md §2.12, round-8 additions).

None of this exists in the reference (a single-stream Ruby event relay,
`app.rb:1-278`); these are the EXT LLM-data-pipeline operators
BASELINE.json mandates.  Every query ships a FULL DuckDB hash oracle.

Shared-literal discipline: wherever a derived input (synthetic URL,
injected damage/PII/license text) feeds both engines, the expression is
ONE SQL string evaluated via ``F.expr`` on the Spark side and
interpolated verbatim into the DuckDB oracle — the two renderings
cannot drift because there is only one rendering.  (Both engines accept
the common subset used here: ``CASE``, ``||`` with implicit int→string
cast, ``replace``, ``contains``, ``upper``, ``length``, ``lpad``.)
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..operators import urls
from ..tables import load, rebalance_for_cpu
from .registry import query

# ---------------------------------------------------------------------------
# Shared derived-input expressions (ONE string, both engines)
# ---------------------------------------------------------------------------

# Deterministic messy URL per document: mixed-case scheme/host, optional
# www, default and non-default ports, trailing-slash variants, utm_*
# tracking params in shuffled positions, and a fragment — every branch
# of the canonicalizer exercised, reproducibly, from (doc_id, source).
URL_EXPR = (
    "(CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'http' END)"
    " || '://'"
    " || (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END)"
    " || (CASE WHEN doc_id % 4 = 0 THEN upper(source) ELSE source END)"
    " || '.'"
    " || (CASE WHEN length(source) % 3 = 0 THEN 'com'"
    "          WHEN length(source) % 3 = 1 THEN 'org'"
    "          ELSE 'net' END)"
    " || (CASE WHEN doc_id % 11 = 0 THEN ':8080'"
    "          WHEN doc_id % 2 = 0 THEN ':443'"
    "          ELSE ':80' END)"
    " || '/Docs/Page-' || (doc_id % 7)"
    " || (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END)"
    " || '?utm_source=feed&id=' || doc_id"
    " || '&utm_campaign=x&ref=' || (doc_id % 5)"
    " || '#sec' || (doc_id % 3)"
)

# Deterministic mojibake injection: UTF-8 text mis-decoded as Latin-1
# leaves characteristic artifact sequences ('Ã¡' for á, 'â€™' for ’,
# U+FFFD replacement runs).  1-in-5 docs clean; three damage classes.
MOJIBAKE_EXPR = (
    "CASE WHEN doc_id % 5 = 0 THEN replace(text, 'a', 'Ã¡')"
    "     WHEN doc_id % 5 = 1 THEN replace(text, 'e', 'â€™')"
    "     WHEN doc_id % 5 = 2 THEN text || ' ï¿½ï¿½data'"
    "     ELSE text END"
)
MOJI_PATTERNS = {
    "hits_latin1": "Ã",
    "hits_punct": "â€",
    "hits_replacement": "ï¿½",
}

# Deterministic PII injection: emails / US-phone shapes / private IPs
# appended to 3 of every 4 docs.
PII_EXPR = (
    "text || (CASE"
    " WHEN doc_id % 4 = 0 THEN ' contact user' || doc_id"
    "      || '@mail' || (doc_id % 3) || '.com now'"
    " WHEN doc_id % 4 = 1 THEN ' call 555-'"
    "      || lpad('' || (doc_id % 10000), 4, '0') || ' today'"
    " WHEN doc_id % 4 = 2 THEN ' host 10.' || (doc_id % 256)"
    "      || '.' || (doc_id % 250) || '.7 up'"
    " ELSE '' END)"
)
PII_PATTERNS = {
    "n_emails": "[a-z0-9]+@[a-z0-9]+\\.[a-z]+",
    "n_phones": "555-[0-9]{4}",
    "n_ips": "10\\.[0-9]+\\.[0-9]+\\.[0-9]+",
}

# Deterministic license-notice injection: 5 of every 6 docs carry one
# of the notices an SPDX-rule scanner classifies.
LICENSE_EXPR = (
    "text || (CASE doc_id % 6"
    " WHEN 0 THEN ' released under the mit license'"
    " WHEN 1 THEN ' licensed under the apache license, version 2.0'"
    " WHEN 2 THEN ' terms of the gnu general public license'"
    " WHEN 3 THEN ' all rights reserved'"
    " WHEN 4 THEN ' available under cc by-sa 4.0'"
    " ELSE '' END)"
)
# First-match-wins rule ladder (rendered identically in both engines —
# contains() exists in both).
LICENSE_RULES = [
    ("apache license", "apache-2.0", 1),
    ("mit license", "mit", 1),
    ("general public license", "gpl", 0),
    ("cc by", "cc-by-sa-4.0", 1),
    ("all rights reserved", "proprietary", 0),
]
LICENSE_CASE_SQL = (
    "CASE "
    + " ".join(
        f"WHEN contains(t2, '{pat}') THEN '{lic}'" for pat, lic, _ in LICENSE_RULES
    )
    + " ELSE 'none' END"
)
PERMISSIVE_SQL = (
    "CASE "
    + " ".join(
        f"WHEN contains(t2, '{pat}') THEN {perm}"
        for pat, _, perm in LICENSE_RULES
    )
    + " ELSE 0 END"
)

_KN_D_MILLI = 750  # absolute discount d = 0.75 in milli units
_KN_TOPK = 40
_SHARDS = 8
_DOMAIN_CUT_PPM = 52_000  # token-share threshold for the domain cut


# ---------------------------------------------------------------------------
# 1. URL canonicalization
# ---------------------------------------------------------------------------


@query(
    "q_url_canon",
    oracle=f"""
    WITH raw AS (
        SELECT doc_id, {URL_EXPR} AS url FROM documents
    ),
    {urls.canonicalize_sql("raw", "doc_id, url")}
    SELECT doc_id, url, canon_url, domain, path,
           n_params_kept, n_tracking
    FROM uc3
    """,
)
def q_url_canon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization (RFC 3986 §6 syntax normalization + the
    tracking-param strip): lowercase scheme/host, strip ``www.`` and
    default ports, drop fragments and ``utm_*`` params, sort surviving
    params, collapse trailing slashes — the key-normalization pass URL
    dedup and domain rollups depend on.  The messy input URL is derived
    deterministically from (doc_id, source) by ONE shared SQL expression
    both engines evaluate, exercising every canonicalizer branch
    (mixed-case scheme/host, www/:443/:80/:8080, trailing slash,
    shuffled params, fragment).

    Plan: pure regexp/array-HOF Column pipeline — per-row, shuffle-free,
    whole-stage codegen; at 100 TB this runs at scan speed with zero
    state (operators/urls.py holds the one definition per engine)."""
    docs = rebalance_for_cpu(load(spark, sf_dir, "documents"))
    raw = docs.select("doc_id", F.expr(URL_EXPR).alias("url"))
    c = urls.canonicalize(F.col("url"))
    return raw.select(
        "doc_id",
        "url",
        c["canon_url"].alias("canon_url"),
        c["domain"].alias("domain"),
        c["path"].alias("path"),
        c["n_params_kept"].alias("n_params_kept"),
        c["n_tracking"].alias("n_tracking"),
    )


# ---------------------------------------------------------------------------
# 2. Domain-frequency rollup (the Dolma-style domain cut)
# ---------------------------------------------------------------------------


@query(
    "q_domain_rollup",
    oracle=f"""
    WITH raw AS (
        SELECT doc_id, {URL_EXPR} AS url,
               len(string_split(text, ' ')) AS n_tok
        FROM documents
    ),
    {urls.canonicalize_sql("raw", "doc_id, url, n_tok")}
    , per_dom AS (
        SELECT domain,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS tok_sum
        FROM uc3 GROUP BY domain
    ),
    tot AS (SELECT sum(tok_sum) AS wtot FROM per_dom)
    SELECT domain, n_docs, tok_sum,
           CAST(tok_sum * 1000000 // wtot AS BIGINT) AS tok_share_ppm,
           CAST(CASE WHEN tok_sum * 1000000 // wtot > {_DOMAIN_CUT_PPM}
                THEN 0 ELSE 1 END AS BIGINT) AS kept
    FROM per_dom CROSS JOIN tot
    """,
)
def q_domain_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-level frequency rollup over canonical registered domains
    (the Dolma-style over-represented-domain cut): per domain, document
    count, token mass, corpus token share in ppm, and the keep/cut flag
    at a share threshold — the spam/SEO-farm suppression a crawl
    curation applies before doc-level quality scoring.

    Plan: the per-row canonicalization (q_url_canon's codegen pipeline)
    followed by ONE map-side-combinable domain aggregate; the share join
    is a 1-row broadcast.  Domain cardinality, not corpus size, bounds
    everything after the scan — the 100 TB shape."""
    docs = rebalance_for_cpu(load(spark, sf_dir, "documents"))
    raw = docs.select(
        "doc_id",
        F.expr(URL_EXPR).alias("url"),
        F.size(F.split("text", " ")).cast("long").alias("n_tok"),
    )
    c = urls.canonicalize(F.col("url"))
    per_dom = (
        raw.select(c["domain"].alias("domain"), "n_tok")
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("tok_sum"),
        )
    )
    tot = per_dom.agg(F.sum("tok_sum").alias("wtot"))
    share = F.expr("tok_sum * 1000000 div wtot")
    return (
        per_dom.crossJoin(F.broadcast(tot))
        .select(
            "domain",
            "n_docs",
            "tok_sum",
            share.cast("long").alias("tok_share_ppm"),
            F.when(share > _DOMAIN_CUT_PPM, F.lit(0))
            .otherwise(F.lit(1))
            .cast("long")
            .alias("kept"),
        )
    )


# ---------------------------------------------------------------------------
# 3. Mojibake / encoding-damage detector
# ---------------------------------------------------------------------------


@query(
    "q_mojibake",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, source, {MOJIBAKE_EXPR} AS t2 FROM documents
    ),
    hits AS (
        SELECT source,
               len(regexp_extract_all(t2, '{MOJI_PATTERNS["hits_latin1"]}')) AS h1,
               len(regexp_extract_all(t2, '{MOJI_PATTERNS["hits_punct"]}')) AS h2,
               len(regexp_extract_all(t2, '{MOJI_PATTERNS["hits_replacement"]}')) AS h3
        FROM d
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN h1 + h2 + h3 > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_damaged,
           CAST(sum(h1) AS BIGINT) AS hits_latin1,
           CAST(sum(h2) AS BIGINT) AS hits_punct,
           CAST(sum(h3) AS BIGINT) AS hits_replacement,
           CAST(sum(CASE WHEN h1 + h2 + h3 > 0 THEN 1 ELSE 0 END) * 1000000
                // count(*) AS BIGINT) AS damaged_ppm
    FROM hits GROUP BY source
    """,
)
def q_mojibake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding-damage (mojibake) detector: counts the artifact
    sequences a UTF-8→Latin-1 mis-decode leaves behind ('Ã?' pairs,
    'â€?' punctuation wrecks, U+FFFD replacement runs) and rolls the
    damage rate up per source — the encoding-hygiene gate a crawl
    pipeline runs before tokenization (damaged docs poison BPE merges).
    Damage is INJECTED deterministically by one shared expression (3 of
    5 docs across three damage classes), so detector recall is
    hash-verified, not assumed.

    Plan: per-row regexp counts (codegen, no Python), one source-keyed
    map-side-combinable aggregate — scan-bound at any corpus size."""
    docs = rebalance_for_cpu(load(spark, sf_dir, "documents"))
    d = docs.select("doc_id", "source", F.expr(MOJIBAKE_EXPR).alias("t2"))
    h = d.select(
        "source",
        *[
            F.size(F.regexp_extract_all("t2", F.lit(pat), F.lit(0))).alias(k)
            for k, pat in (
                ("h1", MOJI_PATTERNS["hits_latin1"]),
                ("h2", MOJI_PATTERNS["hits_punct"]),
                ("h3", MOJI_PATTERNS["hits_replacement"]),
            )
        ],
    )
    damaged = (F.col("h1") + F.col("h2") + F.col("h3") > 0).cast("long")
    return h.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(damaged).cast("long").alias("n_damaged"),
        F.sum("h1").cast("long").alias("hits_latin1"),
        F.sum("h2").cast("long").alias("hits_punct"),
        F.sum("h3").cast("long").alias("hits_replacement"),
        F.expr(
            "sum(CASE WHEN h1 + h2 + h3 > 0 THEN 1 ELSE 0 END) * 1000000"
            " div count(*)"
        )
        .cast("long")
        .alias("damaged_ppm"),
    )


# ---------------------------------------------------------------------------
# 4. PII scorecard
# ---------------------------------------------------------------------------


@query(
    "q_pii_scorecard",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, source, {PII_EXPR} AS t2 FROM documents
    ),
    hits AS (
        SELECT source,
               len(regexp_extract_all(t2, '{PII_PATTERNS["n_emails"]}')) AS e,
               len(regexp_extract_all(t2, '{PII_PATTERNS["n_phones"]}')) AS p,
               len(regexp_extract_all(t2, '{PII_PATTERNS["n_ips"]}')) AS i
        FROM d
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(e) AS BIGINT) AS n_emails,
           CAST(sum(p) AS BIGINT) AS n_phones,
           CAST(sum(i) AS BIGINT) AS n_ips,
           CAST(sum(CASE WHEN e + p + i > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS docs_with_pii,
           CAST(sum(CASE WHEN e + p + i = 0 THEN 1 ELSE 0 END) * 1000000
                // count(*) AS BIGINT) AS pii_free_ppm
    FROM hits GROUP BY source
    """,
)
def q_pii_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII exposure scorecard: per-source counts of email / phone /
    IP-address shapes and the PII-free document rate — the privacy
    audit that runs BEFORE q_redact's scrub decides what to mask (the
    scorecard prices the exposure; the scrub removes it).  PII is
    injected deterministically by one shared expression (3 of 4 docs
    across the three shape classes), so detector recall is
    hash-verified.

    Plan: identical posture to q_mojibake — per-row regexp_extract_all
    counts in codegen, one source-keyed partial aggregate; nothing
    scales beyond the scan."""
    docs = rebalance_for_cpu(load(spark, sf_dir, "documents"))
    d = docs.select("doc_id", "source", F.expr(PII_EXPR).alias("t2"))
    h = d.select(
        "source",
        F.size(
            F.regexp_extract_all("t2", F.lit(PII_PATTERNS["n_emails"]), F.lit(0))
        ).alias("e"),
        F.size(
            F.regexp_extract_all("t2", F.lit(PII_PATTERNS["n_phones"]), F.lit(0))
        ).alias("p"),
        F.size(
            F.regexp_extract_all("t2", F.lit(PII_PATTERNS["n_ips"]), F.lit(0))
        ).alias("i"),
    )
    return h.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("e").cast("long").alias("n_emails"),
        F.sum("p").cast("long").alias("n_phones"),
        F.sum("i").cast("long").alias("n_ips"),
        F.sum((F.col("e") + F.col("p") + F.col("i") > 0).cast("long"))
        .cast("long")
        .alias("docs_with_pii"),
        F.expr(
            "sum(CASE WHEN e + p + i = 0 THEN 1 ELSE 0 END) * 1000000"
            " div count(*)"
        )
        .cast("long")
        .alias("pii_free_ppm"),
    )


# ---------------------------------------------------------------------------
# 5. License-rule classification
# ---------------------------------------------------------------------------


@query(
    "q_license_detect",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, source, {LICENSE_EXPR} AS t2,
               len(string_split(text, ' ')) AS n_tok
        FROM documents
    ),
    c AS (
        SELECT source, n_tok,
               {LICENSE_CASE_SQL} AS license,
               {PERMISSIVE_SQL} AS permissive
        FROM d
    )
    SELECT source, license,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS tok_sum,
           CAST(max(permissive) AS BIGINT) AS permissive
    FROM c GROUP BY source, license
    """,
)
def q_license_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPDX-style license classification by first-match rule ladder
    (apache-2.0 > mit > gpl > cc-by-sa > proprietary > none) with
    per-(source, license) doc and token rollups plus the permissive
    flag — the license-compliance cut a code/text corpus applies before
    training inclusion (only permissive-licensed mass survives).
    Notices are injected deterministically (5 of 6 docs), and the rule
    ladder is rendered from ONE Python table into both engines' CASE
    expressions, so precedence cannot drift.

    Plan: per-row contains() ladder in codegen, one (source, license)
    partial aggregate — scan-bound; the rollup key cardinality is
    sources × licenses, never corpus-sized."""
    docs = rebalance_for_cpu(load(spark, sf_dir, "documents"))
    d = docs.select(
        "source",
        F.expr(LICENSE_EXPR).alias("t2"),
        F.size(F.split("text", " ")).cast("long").alias("n_tok"),
    )
    c = d.select(
        "source",
        "n_tok",
        F.expr(LICENSE_CASE_SQL).alias("license"),
        F.expr(PERMISSIVE_SQL).alias("permissive"),
    )
    return c.groupBy("source", "license").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("tok_sum"),
        F.max("permissive").cast("long").alias("permissive"),
    )


# ---------------------------------------------------------------------------
# 6. Kneser-Ney bigram LM (interpolated, integer micro units)
# ---------------------------------------------------------------------------


@query(
    "q_kneser_ney",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    b AS (
        SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2
        FROM t, LATERAL (SELECT unnest(range(1, len(toks))) AS i) r
    ),
    cb AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_vw FROM b GROUP BY 1, 2),
    ctx AS (
        SELECT w1, CAST(sum(c_vw) AS BIGINT) AS c_v,
               CAST(count(*) AS BIGINT) AS n1_fwd
        FROM cb GROUP BY w1
    ),
    cont AS (SELECT w2, CAST(count(*) AS BIGINT) AS n1_back FROM cb GROUP BY w2),
    tt AS (SELECT CAST(count(*) AS BIGINT) AS t_types FROM cb),
    p AS (
        SELECT w1, w2, c_vw, c_v, n1_fwd, n1_back,
               CAST(CASE WHEN c_vw * 1000 > {_KN_D_MILLI}
                    THEN ((c_vw * 1000 - {_KN_D_MILLI}) * 1000000)
                         // (c_v * 1000)
                    ELSE 0 END
                    + ({_KN_D_MILLI} * n1_fwd * n1_back * 1000000)
                      // (c_v * 1000 * t_types)
                    AS BIGINT) AS p_kn_micro
        FROM cb JOIN ctx USING (w1) JOIN cont USING (w2) CROSS JOIN tt
    )
    SELECT w1, w2, c_vw, c_v, n1_fwd, n1_back, p_kn_micro,
           CAST(row_number() OVER (ORDER BY p_kn_micro DESC, w1, w2)
                AS BIGINT) AS rnk
    FROM (
        SELECT * FROM p ORDER BY p_kn_micro DESC, w1, w2 LIMIT {_KN_TOPK}
    )
    """,
)
def q_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram LM (Kneser & Ney 1995; Chen &
    Goodman 1999 — the standard n-gram smoothing), integer-exact in
    micro units with discount d = 0.75: P(w|v) = max(c(vw)−d,0)/c(v) +
    d·N1+(v·)/c(v) · N1+(·w)/|bigram types| — the continuation-count
    device that makes KN the right LM for perplexity-based quality
    filtering (q_perplexity_buckets' stupid-backoff upgraded to the
    model CCNet actually trains).  Emits the top-40 model rows with
    every component count, so smoothing arithmetic is hash-gated
    end-to-end.

    Plan: the model IS three count tables off one bigram stream —
    bigram counts (map-side combinable), context marginals and
    continuation counts both derived from the DISTINCT-bigram table
    (vocabulary-scale, corpus-sublinear), one 1-row broadcast for the
    type total; final top-k is TakeOrderedAndProject with rank attached
    to the 40 survivors (q_path_topk device), never a global window."""
    docs = rebalance_for_cpu(load(spark, sf_dir, "documents"))
    t = docs.select("doc_id", F.split("text", " ").alias("toks"))
    b = t.select(
        "doc_id",
        F.explode(
            F.expr(
                "CASE WHEN size(toks) >= 2 "
                "THEN sequence(1, size(toks) - 1) ELSE array() END"
            )
        ).alias("i"),
        "toks",
    ).select(
        F.element_at("toks", F.col("i")).alias("w1"),
        F.element_at("toks", F.col("i") + 1).alias("w2"),
    )
    # Eager base cut (optimization round 12): the bigram count table
    # feeds the context marginals, the continuation counts, the type
    # total AND the model join's probe side — four concurrent consumers
    # in one action (the eager-not-lazy shape); uncut, the documents
    # scan + bigram explode + count replayed per consumer (8 parquet
    # scans in this plan).  Vocabulary-scale, so the cut is cheap.
    cb = (
        b.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("c_vw"))
        .localCheckpoint(eager=True)
    )
    ctx = cb.groupBy("w1").agg(
        F.sum("c_vw").cast("long").alias("c_v"),
        F.count(F.lit(1)).cast("long").alias("n1_fwd"),
    )
    cont = cb.groupBy("w2").agg(F.count(F.lit(1)).cast("long").alias("n1_back"))
    tt = cb.agg(F.count(F.lit(1)).cast("long").alias("t_types"))
    p = (
        cb.join(ctx, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(tt))
        .select(
            "w1",
            "w2",
            "c_vw",
            "c_v",
            "n1_fwd",
            "n1_back",
            F.expr(
                f"CASE WHEN c_vw * 1000 > {_KN_D_MILLI}"
                f" THEN ((c_vw * 1000 - {_KN_D_MILLI}) * 1000000)"
                f"      div (c_v * 1000)"
                f" ELSE 0 END"
                f" + ({_KN_D_MILLI} * n1_fwd * n1_back * 1000000)"
                f"   div (c_v * 1000 * t_types)"
            )
            .cast("long")
            .alias("p_kn_micro"),
        )
    )
    top = p.orderBy(
        F.col("p_kn_micro").desc(), F.col("w1").asc(), F.col("w2").asc()
    ).limit(_KN_TOPK)
    w = Window.orderBy(
        F.col("p_kn_micro").desc(), F.col("w1").asc(), F.col("w2").asc()
    )
    return top.withColumn("rnk", F.row_number().over(w).cast("long"))


# ---------------------------------------------------------------------------
# 7. Source-concentration HHI
# ---------------------------------------------------------------------------


@query(
    "q_hhi_concentration",
    oracle="""
    WITH toks AS (
        SELECT source, len(string_split(text, ' ')) AS n FROM documents
    ),
    per_src AS (
        SELECT source, CAST(sum(n) AS BIGINT) AS n_tok FROM toks GROUP BY source
    ),
    tot AS (
        SELECT CAST(sum(n_tok) AS BIGINT) AS wtot,
               CAST(sum(n_tok * n_tok) AS BIGINT) AS sq
        FROM per_src
    )
    SELECT source, n_tok,
           CAST(n_tok * 1000000 // wtot AS BIGINT) AS share_ppm,
           CAST(row_number() OVER (ORDER BY n_tok DESC, source) AS BIGINT)
               AS rnk,
           CAST(sq * 1000000 // (wtot * wtot) AS BIGINT) AS hhi_ppm
    FROM per_src CROSS JOIN tot
    """,
)
def q_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman concentration index of token mass across
    sources — the "is the training mix dominated by a few sources"
    audit (HHI = Σ share², in ppm: 10⁶/N = perfectly uniform over N
    sources, 10⁶ = single-source monopoly); per-source share and rank
    ride along.  Complements q_gini (inequality of the size
    distribution) with the antitrust-style concentration number a mix
    dashboard quotes.  Exact: shares and HHI are integer floor-div —
    int64 holds to ~3×10⁶ tokens/source at the ×10⁶ ppm scale; a
    100 TB corpus widens the two 1-row totals to DECIMAL(38,0)/
    HUGEINT, nothing else changes.

    Plan: one source-keyed partial aggregate over the token scan, then
    everything is source-cardinality (the rank window partitions a
    20-row table; the HHI total is a 1-row broadcast)."""
    docs = load(spark, sf_dir, "documents")
    per_src = (
        docs.select("source", F.size(F.split("text", " ")).alias("n"))
        .groupBy("source")
        .agg(F.sum("n").cast("long").alias("n_tok"))
    )
    tot = per_src.agg(
        F.sum("n_tok").cast("long").alias("wtot"),
        F.sum(F.col("n_tok") * F.col("n_tok")).cast("long").alias("sq"),
    )
    w = Window.orderBy(F.col("n_tok").desc(), F.col("source").asc())
    return (
        per_src.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_tok",
            F.expr("n_tok * 1000000 div wtot").cast("long").alias("share_ppm"),
            F.row_number().over(w).cast("long").alias("rnk"),
            F.expr("sq * 1000000 div (wtot * wtot)")
            .cast("long")
            .alias("hhi_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# 8. Balanced output-shard plan
# ---------------------------------------------------------------------------


@query(
    "q_shard_plan",
    oracle=f"""
    WITH base AS (
        SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
               n_chars AS bytes
        FROM documents
    ),
    tot AS (SELECT CAST(sum(bytes) AS BIGINT) AS wtot FROM base),
    cum AS (
        SELECT doc_id, bytes,
               CAST(sum(bytes) OVER (ORDER BY h, doc_id
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS cum
        FROM base
    ),
    assigned AS (
        SELECT doc_id, bytes,
               CAST(least(((cum - bytes) * {_SHARDS}) // wtot,
                          {_SHARDS} - 1) AS BIGINT) AS shard
        FROM cum CROSS JOIN tot
    )
    SELECT shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(bytes) AS BIGINT) AS bytes_sum,
           CAST(sum(bytes) * {_SHARDS} * 1000000 // max(wtot) AS BIGINT)
               AS load_ppm
    FROM assigned CROSS JOIN tot
    GROUP BY shard
    """,
)
def q_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced output-shard planning: documents in hash-shuffled order
    are laid head-to-tail by byte mass and cut into S = 8 equal-mass
    shards (shard = floor(start_offset · S / total)) — the
    "write N same-sized training shards" assignment that is
    reproducible across runs/engines/partitionings, unlike
    round-robin-by-task.  Per shard: doc count, byte mass, and load vs
    the perfect 1/S split in ppm (10⁶ = perfectly balanced) — the skew
    number the writer's reviewer checks.

    Plan: the q_systematic_sample 16-nibble-group distributed prefix
    sum (per-group window cumsums + a broadcast 16-row offset table —
    NO single-partition global window), one 1-row total broadcast, one
    8-group aggregate.  Int64 envelope: cum·S ≤ total_bytes·8.  The
    assignment lives in ``operators/sharding.py`` (shared with
    ``write_balanced_shards``, the writer that materializes this plan
    as path/shard=K/ parquet directories)."""
    from ..operators import sharding

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.col("n_chars").cast("long").alias("bytes")
    )
    assigned = sharding.assign_shards(
        docs, id_col="doc_id", bytes_col="bytes", num_shards=_SHARDS
    )
    return assigned.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("bytes").cast("long").alias("bytes_sum"),
        F.expr(f"sum(bytes) * {_SHARDS} * 1000000 div max(wtot)")
        .cast("long")
        .alias("load_ppm"),
    )


# ---------------------------------------------------------------------------
# Hierarchical path-prefix rollup (round 9)
# ---------------------------------------------------------------------------


@query(
    "q_path_prefix_rollup",
    oracle="""
    WITH p AS (
        SELECT doc_id, CAST(n_chars AS BIGINT) AS bytes,
               '/a' || (doc_id % 3) AS p1,
               '/a' || (doc_id % 3) || '/b' || (doc_id % 5) AS p2,
               '/a' || (doc_id % 3) || '/b' || (doc_id % 5)
                    || '/c' || (doc_id % 7) AS p3,
               '/a' || (doc_id % 3) || '/b' || (doc_id % 5)
                    || '/c' || (doc_id % 7) || '/d-' || (doc_id % 11) AS p4
        FROM documents
    ),
    lv AS (
        SELECT doc_id, bytes, 1 AS depth, p1 AS prefix, p4 FROM p
        UNION ALL SELECT doc_id, bytes, 2, p2, p4 FROM p
        UNION ALL SELECT doc_id, bytes, 3, p3, p4 FROM p
        UNION ALL SELECT doc_id, bytes, 4, p4, p4 FROM p
    )
    SELECT prefix, CAST(depth AS BIGINT) AS depth,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(bytes) AS BIGINT) AS bytes_sum,
           CAST(count(DISTINCT p4) AS BIGINT) AS n_leaves
    FROM lv GROUP BY 1, 2
    """,
)
def q_path_prefix_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical PATH-PREFIX rollup — the `du`-style crawl-layout
    audit: every cumulative directory prefix of each document's
    (synthesized, 4-level) path gets doc count, byte mass, and distinct
    leaf-path count, so a curation dashboard can spot the subtrees that
    dominate the corpus before sharding or sampling by path.  The
    prefix explosion is the classic hierarchy-flattening device: depth
    levels become an array-of-structs explode (4 rows per doc — depth
    is a small constant), then ONE map-side-combinable groupBy on
    (prefix, depth); no joins, no window.

    At 100 TB: rollup keys are path prefixes (bytes ~100), so the
    shuffle carries prefix keys + partial aggregates, never documents —
    and the distinct-leaf count rides the same shuffle as a per-group
    COUNT DISTINCT on a co-partitioned key."""
    docs = rebalance_for_cpu(load(spark, sf_dir, "documents"))
    p = docs.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("bytes"),
        F.concat(F.lit("/a"), F.col("doc_id") % 3).alias("p1"),
    ).select(
        "doc_id",
        "bytes",
        "p1",
        F.concat(F.col("p1"), F.lit("/b"), F.col("doc_id") % 5).alias("p2"),
    ).select(
        "doc_id",
        "bytes",
        "p1",
        "p2",
        F.concat(F.col("p2"), F.lit("/c"), F.col("doc_id") % 7).alias("p3"),
    ).select(
        "doc_id",
        "bytes",
        "p1",
        "p2",
        "p3",
        F.concat(F.col("p3"), F.lit("/d-"), F.col("doc_id") % 11).alias("p4"),
    )
    lv = p.select(
        "bytes",
        "p4",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).cast("long").alias("depth"),
                        F.col(f"p{i}").alias("prefix"),
                    )
                    for i in (1, 2, 3, 4)
                ]
            )
        ).alias("l"),
    ).select("bytes", "p4", "l.depth", "l.prefix")
    return lv.groupBy("prefix", "depth").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("bytes").cast("long").alias("bytes_sum"),
        F.countDistinct("p4").cast("long").alias("n_leaves"),
    )


# ---------------------------------------------------------------------------
# Greedy set cover for source selection (round 9b)
# ---------------------------------------------------------------------------

_SC_K = 5  # greedy rounds / sources to select


def _set_cover_oracle() -> str:
    parts = [
        """WITH tt AS (
        SELECT source, string_split(text, ' ') AS toks FROM documents
    ),
    st AS (
        SELECT DISTINCT source, toks[i] || ' ' || toks[i + 1] AS tok
        FROM tt, LATERAL (SELECT unnest(range(1, len(toks))) AS i) r
    ),
    g_1 AS (
        SELECT source, CAST(count(*) AS BIGINT) AS gain
        FROM st GROUP BY source
    ),
    w_1 AS (SELECT source, gain FROM g_1 ORDER BY gain DESC, source LIMIT 1),
    c_1 AS (SELECT DISTINCT tok FROM st JOIN w_1 USING (source))"""
    ]
    for r in range(2, _SC_K + 1):
        prev_winners = " UNION ALL ".join(
            f"SELECT source FROM w_{i}" for i in range(1, r)
        )
        parts.append(
            f"""g_{r} AS (
        SELECT s.source, CAST(count(*) AS BIGINT) AS gain
        FROM st s LEFT JOIN c_{r - 1} c ON s.tok = c.tok
        WHERE c.tok IS NULL
          AND s.source NOT IN ({prev_winners})
        GROUP BY s.source
    ),
    w_{r} AS (SELECT source, gain FROM g_{r}
              ORDER BY gain DESC, source LIMIT 1),
    c_{r} AS (SELECT tok FROM c_{r - 1}
              UNION SELECT tok FROM st JOIN w_{r} USING (source))"""
        )
    finals = " UNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS rnk, source, gain, "
        f"(SELECT CAST(count(*) AS BIGINT) FROM c_{r}) AS covered_total "
        f"FROM w_{r}"
        for r in range(1, _SC_K + 1)
    )
    return ",\n    ".join(parts) + "\n    " + finals


@query("q_greedy_set_cover", oracle=_set_cover_oracle())
def q_greedy_set_cover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GREEDY SET COVER source selection — pick the 5 sources that
    together cover the most BIGRAM types, one greedy argmax round at a
    time (each round scores every unpicked source by its count of
    still-uncovered bigrams; bigrams deliberately — the 31-word unigram
    vocabulary saturates in one round, the q_hapax_bigrams rationale).  The submodular-selection baseline a
    data-mixing pipeline runs to choose corpus slices for coverage
    (the 1−1/e-approximate dual of q_mix_budget's proportional
    allocation; Nemhauser et al. 1978), and the token-level complement
    of q_kcenter_seed's embedding-space farthest-first.

    Scale: the universe stays DISTRIBUTED — covered-token state is a
    vocabulary-scale DataFrame updated by union+distinct, marginal
    gains are one anti-join aggregate per round, and only the 1-row
    argmax ever reaches the driver (the q_kcenter_seed collect
    posture).  k rounds = k scans of the (source, token) table; at
    100 TB that table is vocabulary·sources, corpus-sublinear.  Oracle
    unrolls the k argmax rounds as chained CTEs."""
    docs = load(spark, sf_dir, "documents")
    t = docs.select("source", F.split("text", " ").alias("toks"))
    st = (
        t.select(
            "source",
            F.explode(
                F.expr(
                    "CASE WHEN size(toks) >= 2 "
                    "THEN sequence(1, size(toks) - 1) ELSE array() END"
                )
            ).alias("i"),
            "toks",
        )
        .select(
            "source",
            F.concat_ws(
                " ",
                F.element_at("toks", F.col("i")),
                F.element_at("toks", F.col("i") + 1),
            ).alias("tok"),
        )
        .distinct()
        # lazy: round 1's argmax collect materializes it (round 12)
        .localCheckpoint(eager=False)
    )
    covered = None
    picked: list[str] = []
    rows: list[tuple] = []
    for r in range(1, _SC_K + 1):
        cand = st
        if picked:
            cand = cand.where(~F.col("source").isin(picked))
        if covered is not None:
            cand = cand.join(covered, "tok", "left_anti")
        gains = cand.groupBy("source").agg(
            F.count(F.lit(1)).cast("long").alias("gain")
        )
        top = gains.orderBy(
            F.col("gain").desc(), F.col("source").asc()
        ).limit(1).collect()
        if not top:
            break
        src, gain = top[0]["source"], top[0]["gain"]
        picked.append(src)
        new_toks = st.where(F.col("source") == src).select("tok")
        covered = (
            new_toks
            if covered is None
            else covered.union(new_toks).distinct()
        ).localCheckpoint(eager=False)  # lazy: the count materializes it
        rows.append((r, src, gain, covered.count()))
    return spark.createDataFrame(
        rows, "rnk long, source string, gain long, covered_total long"
    )


# ---------------------------------------------------------------------------
# Consistent-hash ring sharding + rebalance audit (round 11)
# ---------------------------------------------------------------------------

_RING_VNODES = 16


def _ring_intervals_sql(n_shards: int, alias: str) -> str:
    """Ring-interval CTE body for an ``n_shards``-shard layout: 16
    vnodes per shard hashed onto [0, 2^60), each ring point owning the
    interval (prev_point, point]; keys below the smallest point or
    above the largest wrap to the smallest point's shard."""
    return f"""
    {alias}_pts AS (
        SELECT s.s AS shard, v.v AS vn,
               CAST(concat('0x', substring(md5(
                   concat('shard:', CAST(s.s AS VARCHAR), ':',
                          CAST(v.v AS VARCHAR))), 1, 15)) AS BIGINT) AS pos
        FROM range(1, {n_shards + 1}) s(s)
        CROSS JOIN range(0, {_RING_VNODES}) v(v)
    ),
    {alias}_iv AS (
        SELECT shard, pos,
               coalesce(lag(pos) OVER (ORDER BY pos, shard, vn) + 1, 0)
                   AS lo,
               pos AS hi
        FROM {alias}_pts
    ),
    {alias}_wrap AS (
        -- order BEFORE projecting: an ORDER BY after a SELECT list that
        -- re-binds `pos` to a constant alias would sort by the constant
        -- (found against the python referee during round-11 bring-up)
        SELECT shard,
               (SELECT max(pos) FROM {alias}_pts) + 1 AS lo,
               1152921504606846976 AS hi
        FROM (SELECT shard, pos, vn FROM {alias}_pts
              ORDER BY pos, shard, vn LIMIT 1)
    ),
    {alias} AS (
        SELECT shard, lo, hi FROM {alias}_iv
        UNION ALL SELECT shard, lo, hi FROM {alias}_wrap
    )"""


@query(
    "q_consistent_hash_ring",
    oracle=f"""
    WITH k AS (
        SELECT DISTINCT user_id,
               CAST(concat('0x', substring(md5(
                   concat('key:', CAST(user_id AS VARCHAR))), 1, 15))
                   AS BIGINT) AS h
        FROM events
    ),
    {_ring_intervals_sql(8, "r8")},
    {_ring_intervals_sql(9, "r9")},
    a AS (
        SELECT k.user_id,
               (SELECT r8.shard FROM r8
                WHERE k.h BETWEEN r8.lo AND r8.hi) AS s8,
               (SELECT r9.shard FROM r9
                WHERE k.h BETWEEN r9.lo AND r9.hi) AS s9
        FROM k
    )
    SELECT s.s AS shard,
           CAST(coalesce(sum(CASE WHEN a.s8 = s.s THEN 1 END), 0)
                AS BIGINT) AS n_users_8,
           CAST(coalesce(sum(CASE WHEN a.s9 = s.s THEN 1 END), 0)
                AS BIGINT) AS n_users_9,
           CAST(coalesce(sum(CASE WHEN a.s9 = s.s AND a.s8 <> a.s9
                                  THEN 1 END), 0)
                AS BIGINT) AS moved_in
    FROM range(1, 10) s(s) LEFT JOIN a ON TRUE
    GROUP BY s.s
    """,
)
def q_consistent_hash_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONSISTENT-HASH RING sharding with virtual nodes (Karger et al.
    1997; the Dynamo/Cassandra placement scheme) plus the REBALANCE
    AUDIT that is its whole point: assign every user to one of 8 shards
    via a 128-vnode md5 ring, re-assign under a 9-shard ring, and
    report per-shard populations and moved-in counts — consistent
    hashing's promise is that ~1/9 of keys move, vs ~8/9 under mod-N
    (q_shard_plan's range device answers a different question: byte-
    balanced WRITE planning; this is KEY-STABLE placement).

    Plan shape (the part that matters at 100 TB): the ring is a
    129-interval BROADCAST table built from the vnode points with one
    bounded lag (ring-size window, metadata scale); each key resolves
    with ONE broadcast range join — no 128× row expansion, no shuffle
    of the key table at all.  md5-int positions make both engines
    derive the identical ring from the same bytes; collided ring
    points degrade to empty intervals deterministically (lo > hi).

    Scale: one distinct-user agg + two broadcast range joins + a 9-key
    rollup."""
    ev = load(spark, sf_dir, "events")

    def md5_int(col):
        return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")

    keys = (
        ev.select("user_id")
        .distinct()
        .select(
            "user_id",
            md5_int(
                F.concat(F.lit("key:"), F.col("user_id").cast("string"))
            ).alias("h"),
        )
    )
    # probed by both layouts — eager: the two layout probes are
    # concurrent stages; a lazy cut lets them race and recompute the
    # distinct+md5 pass
    keys = keys.localCheckpoint(eager=True)

    def intervals(n_shards: int) -> DataFrame:
        pts = spark.createDataFrame(
            [(s, v) for s in range(1, n_shards + 1)
             for v in range(_RING_VNODES)],
            "shard int, vn int",
        ).select(
            "shard",
            "vn",
            md5_int(
                F.concat(
                    F.lit("shard:"),
                    F.col("shard").cast("string"),
                    F.lit(":"),
                    F.col("vn").cast("string"),
                )
            ).alias("pos"),
        )
        w = Window.orderBy("pos", "shard", "vn")  # ring-size window only
        iv = pts.select(
            "shard",
            F.coalesce(F.lag("pos").over(w) + 1, F.lit(0)).alias("lo"),
            F.col("pos").alias("hi"),
        )
        wrap = (
            pts.orderBy("pos", "shard", "vn")
            .limit(1)
            .crossJoin(pts.agg(F.max("pos").alias("mx")))
            .select(
                "shard",
                (F.col("mx") + 1).alias("lo"),
                F.lit(1152921504606846976).alias("hi"),
            )
        )
        return iv.unionByName(wrap)

    # BOTH layouts resolve on ONE pass of the key table (two chained
    # broadcast range joins) — assigning separately and re-joining on
    # user_id would add a user-scale SortMergeJoin for nothing.
    iv8 = intervals(8).select(
        F.col("shard").alias("s8"),
        F.col("lo").alias("lo8"),
        F.col("hi").alias("hi8"),
    )
    iv9 = intervals(9).select(
        F.col("shard").alias("s9"),
        F.col("lo").alias("lo9"),
        F.col("hi").alias("hi9"),
    )
    a = (
        keys.join(
            F.broadcast(iv8),
            (F.col("h") >= F.col("lo8")) & (F.col("h") <= F.col("hi8")),
        )
        .join(
            F.broadcast(iv9),
            (F.col("h") >= F.col("lo9")) & (F.col("h") <= F.col("hi9")),
        )
        .select("user_id", "s8", "s9")
    )
    shards = spark.createDataFrame(
        [(s,) for s in range(1, 10)], "shard int"
    )
    agg = a.groupBy("s9").agg(
        F.count(F.lit(1)).cast("long").alias("n_users_9"),
        F.sum(F.when(F.col("s8") != F.col("s9"), 1).otherwise(0))
        .cast("long")
        .alias("moved_in"),
    )
    agg8 = a.groupBy("s8").agg(
        F.count(F.lit(1)).cast("long").alias("n_users_8")
    )
    return (
        shards.join(F.broadcast(agg8), shards.shard == agg8.s8, "left")
        .join(F.broadcast(agg), shards.shard == agg.s9, "left")
        .select(
            F.col("shard").cast("long").alias("shard"),
            F.coalesce("n_users_8", F.lit(0)).cast("long").alias("n_users_8"),
            F.coalesce("n_users_9", F.lit(0)).cast("long").alias("n_users_9"),
            F.coalesce("moved_in", F.lit(0)).cast("long").alias("moved_in"),
        )
    )


@query(
    "q_rendezvous_hash",
    oracle="""
    WITH k AS (SELECT DISTINCT user_id FROM events),
    w AS (
        SELECT k.user_id, s.s,
               CAST(concat('0x', substring(md5(
                   concat('hrw:', CAST(s.s AS VARCHAR), ':',
                          CAST(k.user_id AS VARCHAR))), 1, 14))
                   AS BIGINT) * 16 + s.s AS packed
        FROM k CROSS JOIN range(1, 10) s(s)
    ),
    a AS (
        SELECT user_id,
               max(packed) FILTER (WHERE s <= 8) % 16 AS s8,
               max(packed) % 16 AS s9
        FROM w GROUP BY user_id
    )
    SELECT s.s AS shard,
           CAST(coalesce(sum(CASE WHEN a.s8 = s.s THEN 1 END), 0)
                AS BIGINT) AS n_users_8,
           CAST(coalesce(sum(CASE WHEN a.s9 = s.s THEN 1 END), 0)
                AS BIGINT) AS n_users_9,
           CAST(coalesce(sum(CASE WHEN a.s9 = s.s AND a.s8 <> a.s9
                                  THEN 1 END), 0)
                AS BIGINT) AS moved_in
    FROM range(1, 10) s(s) LEFT JOIN a ON TRUE
    GROUP BY s.s
    """,
)
def q_rendezvous_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RENDEZVOUS (HIGHEST-RANDOM-WEIGHT) sharding (Thaler &
    Ravishankar 1998 — the OTHER classic stable-placement scheme,
    q_consistent_hash_ring's companion): every key goes to the shard with
    the highest hash weight h(key, shard), no ring, no vnodes.  Same
    audit as the ring query — assign every user under 8 shards, again
    under 9, report per-shard populations and moved-in counts — but
    HRW's guarantee is STRONGER than the ring's ~1/9: keys move ONLY
    when the NEW shard wins their argmax, so moved_in is hash-pinned
    to 0 for shards 1..8 and all movement lands on shard 9 (exactly
    minimal migration, and the hash gate proves it on this corpus).

    Integer argmax without max_by tie ambiguity: weight = 56-bit md5
    int (14 hex chars) packed as w*16 + shard, one BIGINT max per
    world (s<=8 filtered / all 9), shard = max % 16 — deterministic in
    both engines even under (never-observed) weight collisions.

    Scale: the per-key cost is 9 hash evaluations (one explode by a
    9-element literal range — data-scale projection, NO join at all,
    where the ring needs its broadcast range join), one combinable
    per-key max, and a 9-row rollup.  HRW trades the ring's O(1)
    per-key lookup for O(shards) hashes — the standard trade until
    shard counts reach thousands; q_consistent_hash_ring covers that
    regime."""
    ev = load(spark, sf_dir, "events")
    keys = ev.select("user_id").distinct()
    w = keys.select(
        "user_id", F.explode(F.sequence(F.lit(1), F.lit(9))).alias("s")
    ).select(
        "user_id",
        "s",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("hrw:"),
                            F.col("s").cast("string"),
                            F.lit(":"),
                            F.col("user_id").cast("string"),
                        )
                    ),
                    1,
                    14,
                ),
                16,
                10,
            ).cast("long")
            * 16
            + F.col("s")
        ).alias("packed"),
    )
    a = w.groupBy("user_id").agg(
        (F.max(F.when(F.col("s") <= 8, F.col("packed"))) % 16).alias("s8"),
        (F.max("packed") % 16).alias("s9"),
    )
    spine = spark.range(1, 10).select(F.col("id").cast("int").alias("shard"))
    agg = (
        a.groupBy("s9")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users_9"),
            F.sum(F.when(F.col("s8") != F.col("s9"), 1).otherwise(0))
            .cast("long")
            .alias("moved_in"),
        )
        .withColumnRenamed("s9", "shard")
    )
    agg8 = (
        a.groupBy("s8")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users_8"))
        .withColumnRenamed("s8", "shard")
    )
    return (
        spine.join(F.broadcast(agg8), "shard", "left")
        .join(F.broadcast(agg), "shard", "left")
        .select(
            "shard",
            F.coalesce("n_users_8", F.lit(0)).cast("long").alias("n_users_8"),
            F.coalesce("n_users_9", F.lit(0)).cast("long").alias("n_users_9"),
            F.coalesce("moved_in", F.lit(0)).cast("long").alias("moved_in"),
        )
    )
