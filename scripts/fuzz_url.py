"""Differential fuzz for URL canonicalization (the round-8
`operators/urls.py` surface) — THREE independent implementations per
seed:

1. the Spark Column pipeline (`urls.canonicalize`),
2. the DuckDB SQL rendering (`urls.canonicalize_sql`),
3. a pure-Python referee built on `urllib.parse.urlsplit` (shares no
   code and no regexes with either engine).

Spark vs DuckDB are hash-compared with the driver's normalization
(tests.oracle_compare.compare); Python is asserted cell-by-cell against
the Spark rows.  A bug in the shared regex set would slip a two-way
compare (both renderings interpolate the same literals) — the urllib
referee exists to catch exactly that class.

Grammar (seeded random): scheme case/choice (http/https/ftp), optional
mixed-case ``www.``, 1-3 host labels with digits, optional port
(default 80/443 and non-default 8080/8443), 0-3 mixed-case path
segments with optional trailing slash, 0-5 query params (utm_* tracking
keys, duplicate keys, valueless keys, empty segments from ``&&``), and
an optional fragment.  Every URL carries an explicit path (at least
``/``): the operator's documented contract parses the query out of the
path-and-after region, so authority-only URLs (``http://h?q``) are out
of scope by design — generator and docstring agree.

Usage: python scripts/fuzz_url.py [n_seeds] [out.json]
Exit code 0 iff every seed matches across all three implementations.
"""

from __future__ import annotations

import json
import random
import sys
from urllib.parse import urlsplit

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402

_SCHEMES = ["http", "https", "ftp", "HTTP", "HTTPS", "Http", "hTTps"]
_LABELS = ["example", "Example", "CDN", "data", "files", "a1", "x9y", "site"]
_TLDS = ["com", "org", "net", "io", "COM", "Org"]
_SEGS = ["Docs", "page-1", "A", "deep", "X2", "index.html", "%7Euser"]
_PARAMS = [
    "utm_source=feed",
    "utm_campaign=x",
    "utm_medium=a&b",  # '&' splits: yields a valueless 'b' param
    "id=42",
    "id=7",
    "ref=3",
    "a=1",
    "b=2",
    "flag",
    "z=",
    "",
]
_FRAGS = ["", "#sec1", "#", "#x/y?z"]


def gen_url(seed: int) -> str:
    rng = random.Random(seed)
    scheme = rng.choice(_SCHEMES)
    www = rng.choice(["", "www.", "WWW.", "WwW."])
    labels = [rng.choice(_LABELS) for _ in range(rng.randint(1, 2))]
    host = www + ".".join(labels) + "." + rng.choice(_TLDS)
    port = rng.choice(["", ":80", ":443", ":8080", ":8443"])
    segs = [rng.choice(_SEGS) for _ in range(rng.randint(0, 3))]
    path = "/" + "/".join(segs) + ("/" if segs and rng.random() < 0.4 else "")
    n_params = rng.randint(0, 5)
    query = (
        "?" + "&".join(rng.choice(_PARAMS) for _ in range(n_params))
        if n_params
        else ""
    )
    frag = rng.choice(_FRAGS)
    return f"{scheme}://{host}{port}{path}{query}{frag}"


def py_canon(url: str) -> dict:
    """Independent referee: urllib parse + the documented rules."""
    s = urlsplit(url)
    scheme = s.scheme.lower()
    host = (s.hostname or "").lower()
    if host.startswith("www."):
        host = host[4:]
    port = ""
    if s.port is not None and not (
        (scheme == "https" and s.port == 443)
        or (scheme == "http" and s.port == 80)
    ):
        port = f":{s.port}"
    path = s.path.rstrip("/") or "/"
    all_params = [p for p in s.query.split("&") if p]
    kept = sorted(p for p in all_params if not p.startswith("utm_"))
    labels = host.split(".")
    domain = ".".join(labels[-2:]) if len(labels) >= 2 else ""
    return {
        "canon_url": f"{scheme}://{host}{port}{path}"
        + ("?" + "&".join(kept) if kept else ""),
        "domain": domain,
        "path": path,
        "n_params_kept": len(kept),
        "n_tracking": len(all_params) - len(kept),
    }


def run(n_seeds: int, out_path: str | None, stop: bool = True) -> int:
    import pandas as pd

    import pyspark.sql.functions as F
    from nomad_event_streamer_spark.operators import urls
    from tests.oracle_compare import compare

    import duckdb

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("fuzz-url")
        .getOrCreate()
    )
    rows = [(i, gen_url(i)) for i in range(n_seeds)]
    sdf = spark.createDataFrame(rows, "uid long, url string")
    c = urls.canonicalize(F.col("url"))
    out = sdf.select(
        "uid",
        "url",
        c["canon_url"].alias("canon_url"),
        c["domain"].alias("domain"),
        c["path"].alias("path"),
        c["n_params_kept"].alias("n_params_kept"),
        c["n_tracking"].alias("n_tracking"),
    )

    con = duckdb.connect()
    urls_pdf = pd.DataFrame(rows, columns=["uid", "url"])  # noqa: F841
    con.execute("CREATE TABLE fuzz_urls AS SELECT * FROM urls_pdf")
    sql = f"""
    WITH raw AS (SELECT uid, url FROM fuzz_urls),
    {urls.canonicalize_sql("raw", "uid, url")}
    SELECT uid, url, canon_url, domain, path, n_params_kept, n_tracking
    FROM uc3
    """

    n_fail = 0
    detail: list[dict] = []
    # two-way engine compare (driver normalization) over ALL seeds at once
    try:
        compare(out, con, sql)
    except AssertionError as exc:
        n_fail += 1
        detail.append({"stage": "spark_vs_duckdb", "err": str(exc)[:400]})
        print(f"spark-vs-duckdb FAIL: {str(exc)[:200]}")

    # three-way: Python referee vs the Spark rows, per seed
    spark_rows = {r["uid"]: r for r in out.collect()}
    ref_fail = 0
    for uid, url in rows:
        exp = py_canon(url)
        got = spark_rows[uid]
        mism = {
            k: (got[k], exp[k]) for k in exp if got[k] != exp[k]
        }
        if mism:
            ref_fail += 1
            if len(detail) < 20:
                detail.append({"stage": "python_referee", "uid": uid, "url": url, "mismatch": {k: list(v) for k, v in mism.items()}})
            print(f"seed {uid} referee FAIL {url}: {mism}")
    n_fail += ref_fail

    summary = {
        "n_seeds": n_seeds,
        "n_fail": n_fail,
        "protocol": (
            "three-way: Spark Column pipeline vs DuckDB SQL rendering "
            "(driver normalization, all seeds one compare) vs pure-Python "
            "urllib referee (per-seed, shares no regex with the engines); "
            "random scheme/host case, www, default+nondefault ports, "
            "trailing slashes, duplicate/valueless/tracking params, "
            "fragments"
        ),
        "detail": detail,
    }
    if out_path:
        with open(out_path, "w") as f:
            json.dump(summary, f, indent=1)
    print(f"url fuzz: {n_seeds} seeds, {n_fail} fail")
    if stop:  # keep the session alive when run under a pytest fixture
        spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    out = sys.argv[2] if len(sys.argv) > 2 else None
    raise SystemExit(run(n, out))
