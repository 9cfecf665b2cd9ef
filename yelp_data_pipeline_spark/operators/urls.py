"""URL / domain-layer curation — the web-corpus pipeline stage.

Every large-scale web corpus (C4, CCNet, RefinedWeb, Dolma) runs a
URL layer before any text op: canonicalize the URL (so the same page
fetched under tracking-param / case / default-port / fragment variants
dedups to one key), extract the REGISTRABLE domain (the public-suffix
rule: one label + the longest matching public suffix — the unit
domain-level policy applies to), then cap documents per domain and
audit the domain mixture (a handful of boilerplate-heavy domains
otherwise dominate the corpus).

Design for 100 TB:

- Canonicalization is a PURE Catalyst expression (regexp extracts +
  array filter/sort) — map-side, codegen'd, zero shuffle; the
  canonical string then serves as an exact-dedup / groupBy key.
- The public-suffix list is a small static table (the real PSL is
  ~9k rows) — broadcast; suffix matching explodes each host into its
  ≤``max_suffix_labels`` trailing-label candidates and resolves the
  LONGEST match with one broadcast hash join + one combinable
  max-aggregate keyed on the caller's id column. No theta join, no
  regex over the suffix list.
- Per-domain caps use one domain-keyed window over an md5 priority —
  deterministic across engines/retries (the repo's rand()-free
  sampling rule); at extreme skew (one domain = half the corpus) the
  single hot window partition is the known bottleneck — the fix is
  the two-pass variant: broadcast the over-cap domain list (tiny) and
  window only those rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Name-exact tracking params dropped by canonicalization, plus the
# `utm_` prefix family. Public knowledge (every web pipeline strips
# these); extend per deployment.
TRACKING_PARAMS = ["fbclid", "gclid", "mc_cid", "mc_eid", "ref"]

# Minimal public-suffix sample for tests/fixtures — swap in the full
# publicsuffix.org list (a ~9k-row broadcast table) in production.
# (suffix, label_count); multi-label entries (co.uk, github.io) are
# what make longest-match logic necessary at all.
DEFAULT_PUBLIC_SUFFIXES = [
    "com", "org", "net", "io", "dev", "edu", "gov", "uk",
    "co.uk", "ac.uk", "github.io",
]


def canonicalize_url(url: Column) -> Column:
    """Canonical form of an absolute URL, as one Catalyst expression:
    lowercase scheme + host, strip a leading ``www.``, drop the
    fragment, drop default ports (http:80 / https:443, others kept),
    strip trailing slashes from the path, drop tracking query params
    (``utm_*`` prefix + :data:`TRACKING_PARAMS`) and emit the
    survivors sorted — so param order never splits a dedup group.
    Path case is PRESERVED (paths are case-sensitive; only scheme and
    host are case-insensitive per RFC 3986)."""
    u = F.regexp_replace(url, "#.*$", "")
    scheme = F.lower(F.regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(u, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    hostport = F.regexp_extract(rest, "^([^/?]+)", 1)
    pathq = F.regexp_replace(rest, "^[^/?]+", "")
    host0 = F.lower(F.regexp_extract(hostport, "^([^:]+)", 1))
    port = F.regexp_extract(hostport, ":([0-9]+)$", 1)
    host = F.when(
        host0.startswith("www."), F.substring(host0, 5, 2 ** 30)
    ).otherwise(host0)
    keep_port = (port != "") & ~(
        ((scheme == F.lit("http")) & (port == F.lit("80")))
        | ((scheme == F.lit("https")) & (port == F.lit("443")))
    )
    path = F.regexp_replace(F.regexp_extract(pathq, "^([^?]*)", 1), "/+$", "")
    q = F.regexp_extract(pathq, r"\?(.*)$", 1)
    kept = F.array_sort(
        F.filter(
            F.split(q, "&"),
            lambda p: (p != "")
            & ~F.element_at(F.split(p, "="), 1).startswith("utm_")
            & ~F.element_at(F.split(p, "="), 1).isin(TRACKING_PARAMS),
        )
    )
    qc = F.concat_ws("&", kept)
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(qc != "", F.concat(F.lit("?"), qc)).otherwise(F.lit("")),
    )


def url_host(url: Column) -> Column:
    """Lowercased host (sans port, sans leading ``www.``) of an
    absolute URL — the input unit for registrable-domain extraction."""
    rest = F.regexp_replace(
        F.regexp_replace(url, "#.*$", ""), "^[A-Za-z][A-Za-z0-9+.-]*://", ""
    )
    host0 = F.lower(
        F.regexp_extract(F.regexp_extract(rest, "^([^/?]+)", 1), "^([^:]+)", 1)
    )
    return F.when(
        host0.startswith("www."), F.substring(host0, 5, 2 ** 30)
    ).otherwise(host0)


def suffix_table(spark, suffixes: list[str] | None = None) -> DataFrame:
    """(suffix, sfx_labels) public-suffix table — tiny, broadcast at
    every use site."""
    sfx = suffixes if suffixes is not None else DEFAULT_PUBLIC_SUFFIXES
    return spark.createDataFrame(
        [(s, s.count(".") + 1) for s in sfx], ["suffix", "sfx_labels"]
    )


def registrable_domain(
    df: DataFrame,
    host_col: str,
    id_cols: list[str],
    suffix_df: DataFrame,
    max_suffix_labels: int = 3,
) -> DataFrame:
    """Registrable domain (public-suffix rule: the longest suffix in
    ``suffix_df`` matching a trailing-label run of the host, plus ONE
    more label) for each row of ``df``. Returns
    ``id_cols + (host_col, registrable_domain)`` — a projection, not a
    decoration, so the caller controls any join back.

    Plan: ZERO shuffles — one map-side candidate column per suffix
    length (``k = max_suffix_labels..1``, each a bounded slice of the
    label array) resolved by ≤``max_suffix_labels`` broadcast hash
    LEFT joins against the suffix table; longest match wins via a
    coalesce in k-descending order. Every row stays in its input
    partition (vs the explode→groupBy→join-back shape, which costs
    two row-count shuffles). Hosts matching no public suffix fall
    back to the bare host — the PSL '*' convention is the caller's
    policy; single-label hosts have no (label + suffix) split and
    fall back too.
    """
    labels = F.split(F.col(host_col), r"\.")
    n = F.size(labels)
    out = df.select(*id_cols, F.col(host_col))
    ks = list(range(max_suffix_labels, 0, -1))
    for k in ks:
        cand = F.when(
            n >= k + 1,
            F.concat_ws(".", F.slice(labels, n - F.lit(k) + 1, F.lit(k))),
        )
        sfx_k = suffix_df.select(F.col("suffix").alias(f"__s{k}"))
        out = out.join(
            F.broadcast(sfx_k), cand.eqNullSafe(F.col(f"__s{k}")), "left"
        )
    # Longest match wins: coalesce in k-descending order.
    sfx = F.coalesce(*[F.col(f"__s{k}") for k in ks])
    bk = F.coalesce(
        *[F.when(F.col(f"__s{k}").isNotNull(), F.lit(k)) for k in ks]
    )
    reg = F.when(
        sfx.isNotNull(),
        F.concat(
            F.element_at(labels, (n - bk).cast("int")), F.lit("."), sfx
        ),
    ).otherwise(F.col(host_col))
    return out.select(
        *id_cols, F.col(host_col), reg.alias("registrable_domain")
    )


def cap_per_domain(
    df: DataFrame,
    domain_col: str,
    id_col: str,
    cap: int,
    seed: str = "domaincap",
) -> DataFrame:
    """Keep at most ``cap`` rows per domain, selected by a
    deterministic md5 priority over the id (rand()-free: identical
    survivors on every engine, partitioning, and retry) — the
    RefinedWeb/C4 move that stops a handful of boilerplate domains
    from dominating the corpus. One domain-keyed window; see the
    module docstring for the extreme-skew two-pass variant."""
    from pyspark.sql import Window

    from ..functions.hashing import md5_long

    pri = md5_long(
        F.concat_ws("|", F.lit(seed), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy(domain_col).orderBy(pri.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= cap)
        .drop("__rk")
    )
