"""Wiki-markup table parsing: colspan/rowspan expansion + CSV rendering.

Rebuilds the reference's wikitext table processor
(/root/reference/src/processors/wiki/wiki.py:66-156: markup cleaning 66-77,
colspan/rowspan attribute extraction 98-112, stateful 2-D grid expansion
114-156) and its rows→CSV renderer
(/root/reference/src/models/wiki/outputs.py:8-18).

The 2-D fill is inherently stateful per table (a rowspan cell occupies grid
slots in *later* rows), so it is not SQL-expressible (SURVEY.md §2.8 F8) —
it runs as one Arrow-batched pandas UDF per document: per-table Python, but
batched document-at-a-time, never row-at-a-time over cells in Spark.

Markup *cleaning* (F6: ``[[a|b]]→b``, ``[[a]]→a``, HTML-tag strip) is pure
regex and stays JVM-side as Column expressions.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_RE_SPAN = re.compile(r'(colspan|rowspan)\s*=\s*"?(\d+)"?', re.IGNORECASE)
_RE_TABLE = re.compile(r"\{\|.*?\|\}", re.DOTALL)


def gate_wiki_pages(
    pages: DataFrame,
    categories_col: str = "categories",
    text_col: str = "body",
    disambig_token: str = "消歧義",
    relevance_token: str = "香港",
) -> DataFrame:
    """P2+P3 page gating (reference crawlers/wiki/wiki.py:70-78): drop
    disambiguation pages (any category containing ``disambig_token``) and
    pages whose body never mentions ``relevance_token``.

    Both predicates are JVM Column expressions over the categories array /
    body column — pushed into the scan, no explode, no shuffle.
    """
    # NULL categories array / NULL elements ≡ "no categories" — the
    # reference iterates an (empty) mapping and keeps the page; coalesce
    # keeps exists()'s three-valued NULL from silently dropping rows.
    is_disambig = F.coalesce(
        F.exists(F.col(categories_col), lambda c: c.contains(disambig_token)),
        F.lit(False),
    )
    relevant = F.coalesce(F.col(text_col).contains(relevance_token), F.lit(False))
    return pages.filter(~is_disambig & relevant)


def clean_wiki_markup(col: Column) -> Column:
    """``[[target|label]]`` → label, ``[[target]]`` → target, strip HTML tags
    (reference: processors/wiki/wiki.py:66-77) — chained JVM regexes."""
    c = F.regexp_replace(col, r"\[\[[^\]|]*\|([^\]]*)\]\]", r"$1")
    c = F.regexp_replace(c, r"\[\[([^\]]*)\]\]", r"$1")
    c = F.regexp_replace(c, r"<br\s*/?>", "\n")
    return F.regexp_replace(c, r"<[^>]+>", "")


# ---------------------------------------------------------------------------
# per-document pure-Python ground truth (also runs inside the UDF)
# ---------------------------------------------------------------------------

def _clean_cell(cell: str) -> str:
    # Resolve wiki links FIRST — they contain '|' and must not be mistaken
    # for an attribute separator.
    cell = re.sub(r"\[\[[^\]|]*\|([^\]]*)\]\]", r"\1", cell)
    cell = re.sub(r"\[\[([^\]]*)\]\]", r"\1", cell)
    if "|" in cell:
        head, _, tail = cell.partition("|")
        if "=" in head:  # `attr="v" | content` prefix form
            cell = tail
    cell = _RE_SPAN.sub("", cell)
    cell = re.sub(r"<br\s*/?>", " ", cell)
    cell = re.sub(r"<[^>]+>", "", cell)
    return cell.strip()


def _spans(cell: str) -> tuple[int, int]:
    colspan = rowspan = 1
    for attr, num in _RE_SPAN.findall(cell):
        if attr.lower() == "colspan":
            colspan = max(1, int(num))
        else:
            rowspan = max(1, int(num))
    return colspan, rowspan


def parse_wikitable(markup: str) -> list[list[str]]:
    """One ``{| … |}`` block → dense 2-D grid with colspan/rowspan expanded
    (each spanned slot holds a copy of the spanning cell's text, mirroring
    the reference's fill discipline at processors/wiki/wiki.py:114-156)."""
    lines = [l.strip() for l in markup.splitlines()]
    raw_rows: list[list[str]] = []
    cur: list[str] | None = None
    for line in lines:
        if line.startswith("{|") or line.startswith("|+"):
            continue
        if line.startswith("|-"):
            if cur is not None:
                raw_rows.append(cur)
            cur = []
        elif line.startswith("!") or line.startswith("|"):
            if line.startswith("|}"):
                continue
            if cur is None:
                cur = []
            body = line[1:]
            sep = "!!" if line.startswith("!") else "||"
            cur.extend(c for c in body.split(sep))
    if cur:
        raw_rows.append(cur)

    grid: list[list[str | None]] = []
    # pending[(row, col)] = text for slots claimed by an earlier rowspan
    pending: dict[tuple[int, int], str] = {}
    for r, raw in enumerate(raw_rows):
        row: list[str | None] = []
        c = 0
        it = iter(raw)
        for cell in it:
            while (r, c) in pending:
                row.append(pending.pop((r, c)))
                c += 1
            colspan, rowspan = _spans(cell)
            text = _clean_cell(cell)
            for dc in range(colspan):
                row.append(text)
                for dr in range(1, rowspan):
                    pending[(r + dr, c + dc)] = text
            c += colspan
        while (r, c) in pending:
            row.append(pending.pop((r, c)))
            c += 1
        grid.append(row)

    width = max((len(r) for r in grid), default=0)
    return [[(x if x is not None else "") for x in r] + [""] * (width - len(r))
            for r in grid]


def extract_tables(wikitext: str | None) -> list[list[list[str]]]:
    """All tables in a document, each expanded to a dense grid."""
    if not wikitext:
        return []
    return [parse_wikitable(m.group(0)) for m in _RE_TABLE.finditer(wikitext)]


def table_to_csv(grid: list[list[str]]) -> str:
    """Rows → CSV string (reference: models/wiki/outputs.py:8-18 — comma
    join with embedded-comma cells quoted)."""
    out = []
    for row in grid:
        cells = []
        for cell in row:
            if "," in cell or '"' in cell or "\n" in cell:
                cells.append('"' + cell.replace('"', '""') + '"')
            else:
                cells.append(cell)
        out.append(",".join(cells))
    return "\n".join(out)


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

_TABLES_TYPE = T.ArrayType(T.ArrayType(T.ArrayType(T.StringType())))


@F.pandas_udf(_TABLES_TYPE)
def wikitables_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
    for texts in it:
        yield texts.map(extract_tables)


_CSV_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("n_rows", T.IntegerType()),
            T.StructField("n_cols", T.IntegerType()),
            T.StructField("csv", T.StringType()),
        ]
    )
)


@F.pandas_udf(_CSV_TYPE)
def wikitables_csv_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
    def render(t):
        return [
            (len(g), (len(g[0]) if g else 0), table_to_csv(g))
            for g in extract_tables(t)
        ]

    for texts in it:
        yield texts.map(render)


def expand_wikitables(docs: DataFrame, text_col: str = "wikitext",
                      id_col: str = "doc_id") -> DataFrame:
    """(doc_id, table_index, n_rows, n_cols, csv) — one row per table found,
    grids expanded; csv matches the reference renderer."""
    exploded = docs.select(
        F.col(id_col),
        F.posexplode(wikitables_csv_udf(F.col(text_col))).alias(
            "table_index", "_t"
        ),
    )
    return exploded.select(
        id_col,
        "table_index",
        F.col("_t.n_rows").alias("n_rows"),
        F.col("_t.n_cols").alias("n_cols"),
        F.col("_t.csv").alias("csv"),
    )
