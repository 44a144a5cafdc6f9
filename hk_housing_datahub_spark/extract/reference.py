"""Single-row reference HTML→listing-fields extractor.

This is the semantic ground truth: the vectorized pandas-UDF twin
(``extract/vectorized.py``) must produce **byte-identical text and equal
fields per url** (BASELINE.json input_hint invariant; pytest enforces it).

Field semantics mirror the reference's mapping layer
(/root/reference/src/models/agency/outputs.py:33-488):
- absent/unparseable → None, never an exception
  (ISO-date-or-None: outputs.py:47-55,466-474)
- numeric strings with separators → float (upstream sends "6800000":
  /root/reference/docs/api_responses/transactions.json)

Extraction grammar over the synthetic corpus (datagen/pages.py):
- text          = verbatim inner of ``<div id="content">…</div>`` (dotall)
- price         = float of ``<span class="price">HK$ N,NNN</span>`` digits
- address       = inner of ``<span class="address">…</span>``
- floor_area    = float of ``<span class="area">X.Y sq.ft</span>``
- transaction_date = ``<time class="txdate">YYYY-MM-DD</time>`` ISO-or-None
- outlinks      = every ``<a href="…">`` value, in document order
"""

from __future__ import annotations

import re
from datetime import datetime, timezone

_RE_TEXT = re.compile(r'<div id="content">(.*?)</div>', re.S)
_RE_PRICE = re.compile(r'<span class="price">HK\$ ([0-9][0-9,]*)</span>')
_RE_ADDR = re.compile(r'<span class="address">(.*?)</span>', re.S)
_RE_AREA = re.compile(r'<span class="area">([0-9]+(?:\.[0-9]+)?) sq\.ft</span>')
_RE_DATE = re.compile(r'<time class="txdate">(.*?)</time>', re.S)
_RE_HREF = re.compile(r'<a href="([^"]*)"')
_RE_ISO = re.compile(r"^\d{4}-\d{2}-\d{2}$")


def extract_one(html: bytes | None) -> dict:
    """Extract listing fields from one page. Pure, total, never raises."""
    out = {
        "text": None,
        "price": None,
        "address": None,
        "floor_area": None,
        "transaction_date": None,
        "outlinks": [],
    }
    if html is None:
        return out
    s = html.decode("utf-8", errors="replace")

    m = _RE_TEXT.search(s)
    if m:
        out["text"] = m.group(1)
    m = _RE_PRICE.search(s)
    if m:
        out["price"] = float(m.group(1).replace(",", ""))
    m = _RE_ADDR.search(s)
    if m:
        out["address"] = m.group(1)
    m = _RE_AREA.search(s)
    if m:
        out["floor_area"] = float(m.group(1))
    m = _RE_DATE.search(s)
    if m and _RE_ISO.match(m.group(1)):
        try:  # ISO-shaped but impossible dates (2024-02-30) → None, never raise
            out["transaction_date"] = datetime.strptime(
                m.group(1), "%Y-%m-%d"
            ).replace(tzinfo=timezone.utc)
        except ValueError:
            pass
    out["outlinks"] = _RE_HREF.findall(s)
    return out
