"""Crawl scope policies (the Heritrix decide-rule model, reduced to
pure Columns).

A crawl's SCOPE answers "is this discovered URL even eligible?", before
politeness, ranking, focus or the seen-set ever see it. The reference
hard-codes its scope as a curated catalog of listing URLs on known
hosts (/root/reference/src/crawlers/agency/estates.py); an open-web
frontier needs the policy to be declarative so the same engine can run
a site crawl, a domain crawl or a seeded-neighborhood crawl. Heritrix
calls these SurtPrefixScope / decide rules; this module re-expresses
the useful subset as one codegen predicate:

- ``mode="host"``: stay on the seeds' exact hosts (SURT-host equality).
- ``mode="domain"``: stay on the seeds' registrable domains (eTLD+1
  via functions/surt.registrable_domain) — subdomains of a seed's
  registrant are in scope, sibling registrants are not.
- ``mode="surt_prefix"``: stay under the seeds' SURT key prefixes
  (path-scoped: a seed https://a.com/listings/ admits everything under
  that directory, on that host) — the Heritrix surt-prefix scope.
- ``mode="open"``: everything is eligible (the default engine
  behavior; guards/ranking still apply).

Plus orthogonal decide rules applied in all modes:

- ``exclude_patterns``: Java-regex reject list evaluated on the
  CANONICAL url (binaries, calendars, infinite facet params, …).
- ``max_path_segments``: reject pathological URL depth (the cheap
  static half of the trap guard — rejects before fetching, where the
  trap guard convicts hosts after evidence).

Scale: the scope set derives from the SEEDS (tiny, thousands at most,
vs 10^10 discovered URLs), so ``scope_filter`` broadcasts it — host
and domain modes as a broadcast semi-join, surt_prefix as a broadcast
array + ``exists(startswith)``. The per-URL work is a handful of
codegen string ops inside whatever stage already materializes the
frontier row; nothing shuffles.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.surt import registrable_domain, surt_host, surt_key

SCOPE_MODES = ("open", "host", "domain", "surt_prefix")


def static_rules(
    url: Column,
    exclude_patterns: Sequence[str] = (),
    max_path_segments: int | None = None,
) -> Column:
    """The seed-independent decide rules as ONE boolean Column (True =
    keep). Patterns are Java regex ``rlike`` on the canonical url —
    stay inside the Java∩RE2 subset if oracle parity matters."""
    keep = F.lit(True)
    for p in exclude_patterns:
        keep = keep & ~url.rlike(p)
    if max_path_segments is not None:
        # path depth = '/' count after the scheme's '//', minus the
        # authority's leading slash
        path = F.regexp_replace(url, r"^[a-z][a-z0-9+.-]*://[^/]*", "")
        depth = F.length(path) - F.length(F.regexp_replace(path, "/", ""))
        keep = keep & (depth <= max_path_segments)
    return keep


def seed_scope_values(
    seeds: DataFrame, mode: str, url_col: str = "url_canon"
) -> DataFrame:
    """The per-mode scope set derived from the seeds: one ``value``
    column (host / domain / surt prefix). Distinct and tiny — the
    broadcast side of every scope check."""
    u = F.col(url_col)
    if mode == "host":
        v = surt_host(u)
    elif mode == "domain":
        v = registrable_domain(u)
    elif mode == "surt_prefix":
        v = surt_key(u)
    else:
        raise ValueError(f"no scope values for mode {mode!r}")
    return seeds.select(v.alias("value")).distinct()


def scope_filter(
    frontier: DataFrame,
    seeds: DataFrame,
    mode: str = "open",
    exclude_patterns: Sequence[str] = (),
    max_path_segments: int | None = None,
    url_col: str = "url_canon",
    seed_url_col: str = "url_canon",
) -> DataFrame:
    """frontier → the in-scope subset. Static rules are a codegen
    predicate; the seed-set check is a broadcast left-semi join (host /
    domain) or a broadcast prefix array (surt_prefix). The seed side is
    structurally tiny (it is the seed list), so the broadcast is safe
    by construction — unlike corpus-dependent sets, which this repo
    never force-broadcasts."""
    if mode not in SCOPE_MODES:
        raise ValueError(
            f"scope mode must be one of {SCOPE_MODES}, got {mode!r}"
        )
    u = F.col(url_col)
    out = frontier.filter(
        static_rules(u, exclude_patterns, max_path_segments)
    )
    if mode == "open":
        return out
    vals = seed_scope_values(seeds, mode, seed_url_col)
    if mode == "surt_prefix":
        prefixes = vals.agg(
            F.array_sort(F.collect_set("value")).alias("ps")
        )
        return (
            out.crossJoin(F.broadcast(prefixes))
            .filter(
                F.exists(
                    F.col("ps"),
                    lambda p: surt_key(u).startswith(p),
                )
            )
            .drop("ps")
        )
    key = surt_host(u) if mode == "host" else registrable_domain(u)
    return (
        out.withColumn("__scope", key)
        .join(
            F.broadcast(vals.withColumnRenamed("value", "__scope")),
            "__scope",
            "left_semi",
        )
        .drop("__scope")
    )


def host_suffixes(host: Column) -> Column:
    """array<string> of the host's dot-suffix chain, longest first:
    'a.b.example.com' -> [a.b.example.com, b.example.com, example.com,
    com]. Bounded by the label count (hosts have a handful), pure
    codegen."""
    labels = F.split(host, "\\.")
    n = F.size(labels)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(
            F.slice(labels, i, n - i + F.lit(1)), "."
        ),
    )


def blocklist_filter(
    df: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url_canon",
    annotate: bool = False,
) -> DataFrame:
    """UT1/RefinedWeb-style domain blocklist gating: a row is blocked
    when ANY dot-suffix of its URL's host appears in ``blocklist``
    (domain string, category string) — so an entry blocks itself and
    every subdomain, at ANY depth (`ads.example.com` entries work, not
    just registrable domains). Ties (a host matching several entries)
    resolve to the LONGEST matching domain, then lexicographic
    category — the most specific listing wins, deterministically.

    ``annotate=False`` drops blocked rows; ``annotate=True`` keeps all
    rows and adds ``blocked_category`` (NULL = clean) for audit
    funnels.

    Scale: the suffix chain is a per-row codegen array (≤ label
    count); the match is ONE equi-join keyed on the suffix string.
    The blocklist side carries NO broadcast hint — real lists (UT1
    adult ≈ 4M domains) sit at the broadcast boundary, so AQE decides
    from its actual size, exactly the drop_boilerplate_lines lesson."""
    from ..functions.urls import url_host

    u = F.col(url_col)
    with_sfx = df.select(u.alias("_u")).distinct().withColumn(
        "_sfx", F.explode(host_suffixes(url_host(F.col("_u"))))
    )
    bl = blocklist.select(
        F.col("domain").alias("_sfx"), F.col("category").alias("_cat")
    )
    # verdict per distinct URL (the natural key — duplicate rows share
    # it, NULL urls produce no suffixes and stay clean)
    hits = (
        with_sfx.join(bl, "_sfx")
        .groupBy("_u")
        .agg(
            F.min(
                F.struct(
                    (-F.length("_sfx")).alias("neg_len"),
                    F.col("_cat").alias("cat"),
                )
            )["cat"].alias("blocked_category")
        )
    )
    if annotate:
        return df.join(
            hits, u == hits["_u"], "left"
        ).drop("_u")
    return df.join(hits, u == hits["_u"], "left_anti")
