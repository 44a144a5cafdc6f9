"""robots.txt text → per-host politeness rules, as JVM Column expressions.

The north rule names "per-host politeness/robots.txt budget"; the crawl
engine consumes a structured rules table (frontier/scheduler.py). This
module closes the gap from raw robots.txt bodies to that table, at two
fidelity levels:

- :func:`parse_robots_txt` — the coarse (host, allow, path_prefix,
  crawl_delay_ms) schema the scheduler's legacy path consumes: host-level
  disallow (``Disallow: /``), one allowed prefix, one delay.
- :func:`parse_robots_rules` — the RFC 9309 surface: ALL ``Allow:`` /
  ``Disallow:`` rule paths of the (merged) ``User-agent: *`` groups as
  arrays, consumed by the scheduler's longest-match gate
  (:func:`robots_permits`): the longest matched rule path wins, ``Allow``
  wins length ties, rule paths may use the RFC's ``*`` wildcard and ``$``
  end anchor.

Both parsers implement the RFC 9309 group model:

- ALL ``User-agent: *`` groups are merged (the RFC's multi-group merge),
  including a ``*`` that appears inside a stacked run of ``User-agent:``
  lines (the stacked agents share the group's rules);
- a body with no ``*`` group ⇒ everything allowed, default delay;
- directive names are case-insensitive; a header may be the final line of
  the file with no trailing newline;
- ``Crawl-delay: <seconds>`` ⇒ crawl_delay_ms (garbage → default; first
  parseable value across the merged groups wins).

All parsing is regexp_extract(_all)/rlike on the raw body — codegen'd JVM
regex, no UDFs, linear per host; at 10^8 hosts this is one narrow
partition-parallel projection, and the per-URL longest-match gate is a
higher-order-function fold over each host's (small) rule array riding the
scheduler's existing broadcast join — the frontier side never shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_CRAWL_DELAY_MS = 100

# One match per ``User-agent: *`` group. The group body is captured with a
# LOOKAHEAD terminator (not consumed), so regexp_extract_all scans on to
# the next group and the RFC multi-group merge is simply array_join over
# all captures. A run of stacked ``User-agent:`` lines directly after the
# ``*`` header is skipped (those agents share this group's rules).
_STAR_GROUPS = (
    r"(?is)User-agent:\s*\*[ \t\r]*(?:\n|$)"
    r"(?:User-agent:[^\n]*(?:\n|$))*"
    r"(.*?)(?=User-agent:|$)"
)


def _merged_star_body(txt: Column) -> tuple[Column, Column]:
    """(merged rule body of every ``*`` group, has-any-group flag)."""
    groups = F.regexp_extract_all(txt, F.lit(_STAR_GROUPS), 1)
    return F.array_join(groups, "\n"), F.size(groups) > 0


def _rule_regex(p: Column) -> Column:
    """RFC 9309 rule path → anchored Java regex: literal chars escaped,
    ``*`` → ``.*``, a TRAILING ``$`` back to an end anchor."""
    esc = F.regexp_replace(p, r"([\\.\[\]\{\}\(\)\+\?\^\$\|])", r"\\$1")
    rx = F.regexp_replace(esc, r"\*", ".*")
    # Java replacement strings treat $ as a group ref — escape it to
    # emit the literal end anchor
    rx = F.regexp_replace(rx, r"\\\$$", r"\$")
    return F.concat(F.lit("^"), rx)


def robots_permits(
    path: Column, allow_paths: Column, disallow_paths: Column
) -> Column:
    """RFC 9309 §2.2.2 precedence as one JVM expression: among the rules
    whose path matches, the longest rule path (by characters of the rule
    text) wins; an ``Allow`` beats a ``Disallow`` of equal length; no
    matching rule ⇒ allowed."""

    def best(arr: Column) -> Column:
        matched = F.filter(arr, lambda p: F.rlike(path, _rule_regex(p)))
        return F.array_max(F.transform(matched, F.length))

    la, ld = best(allow_paths), best(disallow_paths)
    return ld.isNull() | (la.isNotNull() & (la >= ld))


def parse_robots_rules(
    robots: DataFrame,
    host_col: str = "host",
    txt_col: str = "robots_txt",
    default_delay_ms: int = DEFAULT_CRAWL_DELAY_MS,
) -> DataFrame:
    """(host, robots_txt) → (host, allow_paths, disallow_paths,
    crawl_delay_ms): the full rule lists of the merged ``*`` groups, for
    the scheduler's longest-match gate. Empty rule values (``Disallow:``
    with no path — RFC: matches nothing) are dropped."""
    body, has_group = _merged_star_body(F.col(txt_col))
    body = F.when(has_group, body).otherwise(F.lit(""))

    def paths(directive: str) -> Column:
        # value = everything up to the first whitespace or '#' — an inline
        # comment ('Disallow: /private/ # keep out') must not invalidate
        # the rule (RFC 9309 strips comments); a line-end anchor here
        # would silently DROP such rules and fail open
        raw = F.regexp_extract_all(
            body, F.lit(rf"(?im)^{directive}:[ \t]*([^ \t\r\n#]*)"), 1
        )
        return F.filter(raw, lambda p: p != "")

    delay_s = F.regexp_extract(
        body, r"(?im)^Crawl-delay:\s*([0-9]+(?:\.[0-9]+)?)\s*$", 1
    )
    delay_ms = F.coalesce(
        (F.nullif(delay_s, F.lit("")).try_cast("double") * 1000).cast("int"),
        F.lit(default_delay_ms),
    )
    return robots.select(
        F.col(host_col).alias("host"),
        paths("Allow").alias("allow_paths"),
        paths("Disallow").alias("disallow_paths"),
        delay_ms.cast("int").alias("crawl_delay_ms"),
    )


def parse_robots_txt(
    robots: DataFrame,
    host_col: str = "host",
    txt_col: str = "robots_txt",
    default_delay_ms: int = DEFAULT_CRAWL_DELAY_MS,
) -> DataFrame:
    """(host, robots_txt) → (host, allow, path_prefix, crawl_delay_ms) —
    the coarse schema frontier/scheduler.py's legacy path consumes:
    ``allow`` is False only for a full ``Disallow: /``, ``path_prefix`` is
    the first ``Allow:`` value across the merged ``*`` groups ('' = all
    paths). For per-path allow/deny precedence use
    :func:`parse_robots_rules`."""
    block, has_group = _merged_star_body(F.col(txt_col))
    disallow_all = block.rlike(r"(?im)^Disallow:\s*/\s*$")
    allow_prefix = F.regexp_extract(block, r"(?im)^Allow:\s*(\S+)\s*$", 1)
    delay_s = F.regexp_extract(
        block, r"(?im)^Crawl-delay:\s*([0-9]+(?:\.[0-9]+)?)\s*$", 1
    )
    delay_ms = F.coalesce(
        (F.nullif(delay_s, F.lit("")).try_cast("double") * 1000).cast("int"),
        F.lit(default_delay_ms),
    )
    return robots.select(
        F.col(host_col).alias("host"),
        F.when(has_group, ~disallow_all).otherwise(F.lit(True)).alias("allow"),
        F.when(has_group, allow_prefix).otherwise(F.lit("")).alias("path_prefix"),
        F.when(has_group, delay_ms)
        .otherwise(F.lit(default_delay_ms))
        .cast("int")
        .alias("crawl_delay_ms"),
    )
