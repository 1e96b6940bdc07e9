"""URL feature columns for crawl curation — pure codegen, no UDF.

A web-corpus pipeline filters and stratifies by URL shape before it ever
reads a page body: protocol allowlists, per-domain caps
(sampling.cap_per_group keyed on ``registered_domain``), path-depth
heuristics, tracking-parameter counts. Everything here is a plain
Column expression over Spark's built-in ``parse_url``; the
registered-domain heuristic is the label rule (last two labels, three
when the second-level label is a known generic under a 2-letter ccTLD
— co.uk, com.au, ...), not the full Public Suffix List: the PSL is a
data file, and a production deploy broadcast-joins it instead
(documented here so nobody mistakes the heuristic for PSL-complete).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# generic second-level labels commonly registered under ccTLDs
_GENERIC_2LD = ("co", "com", "ac", "gov", "edu", "org", "net")


def _part(c: Column, part: str) -> Column:
    return F.parse_url(c, F.lit(part))


def registered_domain(host: Column) -> Column:
    """Registrable-domain heuristic from a hostname column: last two
    labels, or three when the middle label is a generic 2LD under a
    2-letter ccTLD (``a.b.co.uk`` → ``b.co.uk``)."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    second = F.element_at(labels, -2)
    tld = F.element_at(labels, -1)
    take3 = (
        (n >= 3)
        & (F.length(tld) == 2)
        & second.isin(*_GENERIC_2LD)
    )
    return F.when(n <= 1, host).otherwise(
        F.when(take3, F.concat_ws(".", F.element_at(labels, -3), second, tld)).otherwise(
            F.concat_ws(".", second, tld)
        )
    )


def url_features(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Append the curation columns to ``df``: protocol, host,
    registered_domain, tld, path_depth (non-empty path segments),
    n_query_params, and is_secure — one projection, all codegen."""
    c = F.col(url_col)
    host = F.lower(_part(c, "HOST"))
    path = _part(c, "PATH")
    query = _part(c, "QUERY")
    return df.select(
        "*",
        F.lower(F.regexp_extract(c, r"^([A-Za-z][A-Za-z0-9+.-]*):", 1)).alias("protocol"),
        host.alias("host"),
        registered_domain(host).alias("registered_domain"),
        F.element_at(F.split(host, r"\."), -1).alias("tld"),
        F.size(F.filter(F.split(path, "/"), lambda s: s != "")).alias("path_depth"),
        F.when(query.isNull() | (query == ""), F.lit(0))
        .otherwise(F.size(F.split(query, "&")))
        .alias("n_query_params"),
        (F.lower(F.regexp_extract(c, r"^([A-Za-z][A-Za-z0-9+.-]*):", 1)) == "https").alias(
            "is_secure"
        ),
    )
