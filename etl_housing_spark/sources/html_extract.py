"""HTML listing extraction over stored page snapshots (SURVEY.md §2.1 S2).

The reference drives a live browser and BeautifulSoup per URL, sequentially
(trulia_scrape.py:107-149 ``get_apartment_data``: floor-plan tables selected
by ``data-testid``, fields by class/testid, one 14-column row per ``tr``).
The engine inverts the boundary (SURVEY §3 boundary summary): crawling
happens OUTSIDE the engine and lands page snapshots in a table
``(url, html, fetch_date)``; extraction is then a distributed
``mapInPandas`` stage — thousands of pages parse in parallel across
executors, and a parse failure loses one page, not the run (the per-URL
try/except-continue of trulia_scrape.py:204-211, applied per row).

Parsing uses only the stdlib ``html.parser`` (no bs4 in this container): a
minimal DOM with attribute matching — just enough selector surface for the
extraction semantics above, reimplemented, not translated.

Output rows are raw strings exactly as the reference scrapes them
('525 sqft', '$850', '1bd'); ``functions.cleaning.clean_listings`` is the
next stage, mirroring the reference's pipeline order.
"""

from __future__ import annotations

from collections.abc import Iterator
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame

SNAPSHOT_SCHEMA = "url STRING, html STRING, fetch_date STRING"

LISTING_COLUMNS = [
    "name", "address", "unit", "sqft", "bed", "bath", "price",
    "city", "state", "zipcode", "description", "details", "url", "date",
]
LISTING_SCHEMA = ", ".join(f"{c} STRING" for c in LISTING_COLUMNS)


class _Node:
    __slots__ = ("tag", "attrs", "children", "_text")

    def __init__(self, tag: str, attrs: dict[str, str]):
        self.tag = tag
        self.attrs = attrs
        self.children: list[_Node] = []
        self._text: list[str] = []

    def text(self) -> str:
        out = "".join(self._text)
        for c in self.children:
            out += c.text()
        return out

    def find_all(self, tag: str, attrs: dict[str, str] | None = None) -> list["_Node"]:
        found = []
        for c in self.children:
            if c.tag == tag and _attrs_match(c.attrs, attrs):
                found.append(c)
            found.extend(c.find_all(tag, attrs))
        return found

    def find(self, tag: str, attrs: dict[str, str] | None = None) -> "_Node | None":
        hits = self.find_all(tag, attrs)
        return hits[0] if hits else None


def _attrs_match(have: dict[str, str], want: dict[str, str] | None) -> bool:
    if not want:
        return True
    for k, v in want.items():
        mine = have.get(k)
        if mine is None:
            return False
        if k == "class":
            if v not in mine.split():
                return False
        elif mine != v:
            return False
    return True


_VOID = {"br", "hr", "img", "input", "meta", "link", "area", "base", "col", "embed",
         "source", "track", "wbr"}


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = _Node("#root", {})
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = _Node(tag, {k: (v or "") for k, v in attrs})
        self.stack[-1].children.append(node)
        if tag not in _VOID:
            self.stack.append(node)

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                break

    def handle_data(self, data):
        self.stack[-1]._text.append(data)


def parse_html(html: str) -> _Node:
    tb = _TreeBuilder()
    tb.feed(html)
    return tb.root


def _page_rows(url: str, html: str, date: str) -> list[list[str]]:
    """One page → one raw listing row per floor-plan table row (the field
    semantics of trulia_scrape.py:115-148, reimplemented on the mini-DOM)."""
    doc = parse_html(html)

    def txt(node) -> str:
        return node.text() if node is not None else ""

    name = txt(doc.find("span", {"data-testid": "home-details-summary-headline"}))
    cs = doc.find_all("span", {"data-testid": "home-details-summary-city-state"})
    address = txt(cs[0]) if cs else ""
    city_state_zip = txt(cs[1]) if len(cs) > 1 else ""
    parts = city_state_zip.replace(",", "").rsplit(maxsplit=2)
    city, state, zipcode = (parts + ["", "", ""])[:3] if len(parts) == 3 else ("", "", "")
    description = txt(doc.find("div", {"data-testid": "home-description-text-description-text"}))
    details = " ,".join(
        li.text() for li in doc.find_all("li", {"class": "FeatureList__FeatureListItem-iipbki-0"})
    )

    rows = []
    for table in doc.find_all("table", {"data-testid": "floor-plan-group"}):
        for tr in table.find_all("tr"):
            unit = txt(tr.find("div", {"color": "highlight"}))
            sqft = txt(tr.find("td", {"class": "FloorPlanTable__FloorPlanFloorSpaceCell-sc-1ghu3y7-5"}))
            feats = tr.find_all("td", {"class": "FloorPlanTable__FloorPlanFeaturesCell-sc-1ghu3y7-4"})
            bed = txt(feats[0]) if feats else ""
            bath = txt(feats[1]) if len(feats) > 1 else ""
            prices = tr.find_all("td", {"class": "FloorPlanTable__FloorPlanSMCell-sc-1ghu3y7-8"})
            price = txt(prices[1]) if len(prices) > 1 else (txt(prices[0]) if prices else "")
            rows.append([name, address, unit, sqft, bed, bath, price, city, state,
                         zipcode, description, details, url, date])
    return rows


def extract_listings(snapshots: DataFrame) -> DataFrame:
    """Snapshot table (url, html, fetch_date) → raw 14-column listing rows.

    Arrow-batched ``mapInPandas``: each batch of pages parses independently;
    a malformed page contributes zero rows instead of failing the stage.
    ``date`` comes from the snapshot's fetch_date (deterministic lineage),
    not wall-clock ``now()`` as in the reference (trulia_scrape.py:146) —
    re-running extraction over the same snapshots yields identical output.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[list[str]] = []
            for url, html, date in zip(pdf["url"], pdf["html"], pdf["fetch_date"]):
                try:
                    out.extend(_page_rows(url, html, date))
                except Exception:
                    continue  # per-page isolation (trulia_scrape.py:206-211)
            yield pd.DataFrame(out, columns=LISTING_COLUMNS)

    return snapshots.mapInPandas(extract, LISTING_SCHEMA)
