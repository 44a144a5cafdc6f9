"""PII redaction — the scrub pass a web corpus takes before training.

Regex-based detection of the high-volume PII classes that dominate web
text (emails, international/NANP phone numbers, IPv4 addresses, 13–19
digit card-shaped numbers), each replaced by a typed placeholder token so
downstream statistics can still count what was removed. All JVM-side
``regexp_replace``/``regexp_count`` Column expressions — codegen, no UDF,
no shuffle: at 100 TB this is a pure map over the scan.

Deliberately conservative patterns: over-matching (e.g. rewriting every
13-digit number in a math article) corrupts more training value than a
missed phone number leaks; the per-class counts let a quality gate route
high-PII documents to review instead of silently mangling them. A
production deployment swaps in NER behind the same column contract.

Pattern syntax sticks to the portable subset (char classes, bounded
quantifiers, alternation — no lookarounds or backrefs), which Java regex
(Spark) and RE2 (DuckDB/ripgrep) interpret identically, so the transform
is oracle-checkable across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
# +country / (area) / separators; 7+ digits total, word-bounded via
# explicit non-digit context handled by the anchor-free conservative form
PHONE_RE = (
    "\\+?[0-9]{1,3}[-. (]{1,2}[0-9]{2,4}[-. )]{1,2}[0-9]{3,4}"
    "([-. ][0-9]{1,4})?"  # optional block: separator only WITH digits
)
IPV4_RE = (
    "(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
    "(\\.(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])){3}"
)
CARD_RE = "[0-9]{4}[- ]?[0-9]{4}[- ]?[0-9]{4}[- ]?[0-9]{1,7}"

_CLASSES = [
    # order matters: cards before phones (a spaced 16-digit card would
    # otherwise half-match the phone pattern), IPs before phones likewise
    ("email", EMAIL_RE, "<EMAIL>"),
    ("card", CARD_RE, "<CARD>"),
    ("ip", IPV4_RE, "<IP>"),
    ("phone", PHONE_RE, "<PHONE>"),
]


def redact_text(text: Column) -> Column:
    """The scrubbed text: every detected span replaced by its typed
    placeholder, classes applied in fixed order."""
    out = text
    for _, pat, token in _CLASSES:
        out = F.regexp_replace(out, pat, token)
    return out


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-class counts of what the replacement pass ACTUALLY scrubs:
    each class is counted on the text with the earlier classes already
    replaced — exactly the replacement pipeline's view — so a span that
    two patterns overlap (a spaced card is also phone-shaped) is counted
    once, under the class that redacts it, and ``sum(counts) == number of
    placeholders`` holds by construction."""
    counts: dict[str, Column] = {}
    running = text
    for name, pat, token in _CLASSES:
        counts[name] = F.regexp_count(running, F.lit(pat))
        running = F.regexp_replace(running, pat, token)
    return counts


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add ``<text_col>_redacted`` plus ``pii_<class>`` count columns and a
    ``pii_total``. One projection; the source column is kept so a gate can
    compare (and is dropped by the caller for the training copy)."""
    counts = pii_counts(F.col(text_col))
    out = df
    for name, col in counts.items():
        out = out.withColumn(f"pii_{name}", col)
    total = None
    for name in counts:
        c = F.col(f"pii_{name}")
        total = c if total is None else total + c
    return out.withColumn("pii_total", total).withColumn(
        f"{text_col}_redacted", redact_text(F.col(text_col))
    )
