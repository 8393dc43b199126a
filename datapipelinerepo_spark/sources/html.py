"""HTML-record parsing (UD2, the UDTF shape): page → many records,
executed as mapInPandas over fetched payloads.

The reference scrapes with BeautifulSoup on the driver
(datasources.py:326-360, :408-438, :494-545, :623-735); here parsing is
stdlib (html.parser), runs executor-side in Arrow batches, and each
page yields its records as rows — the table-generating UDF shape.
"""

from __future__ import annotations

from collections.abc import Iterator
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import StringType, StructField, StructType


class _TableParser(HTMLParser):
    """Collect <tr><td>…</td></tr> cell texts per row; also record each
    cell's first <a href> (the reference pulls team URLs/ids from
    anchors, datasources.py:429-435). ``table_starts`` records the row
    index at which each <table> begins, so a caller skipping header
    rows can skip one PER TABLE rather than only the first row of the
    whole page (code-review r6: a nav/summary table above the data
    table otherwise leaks every later table's header as a record)."""

    def __init__(self):
        super().__init__()
        self.rows: list[tuple[list[str], list[str | None]]] = []
        self.table_starts: list[int] = []
        self._cells: list[str] | None = None
        self._hrefs: list[str | None] | None = None
        self._buf: list[str] | None = None
        self._href: str | None = None

    def handle_starttag(self, tag, attrs):
        if tag == "table":
            self.table_starts.append(len(self.rows))
        elif tag == "tr":
            self._cells, self._hrefs = [], []
        elif tag in ("td", "th") and self._cells is not None:
            self._buf, self._href = [], None
        elif tag == "a" and self._buf is not None and self._href is None:
            self._href = dict(attrs).get("href")

    def handle_endtag(self, tag):
        if tag in ("td", "th") and self._buf is not None:
            self._cells.append("".join(self._buf).strip())
            self._hrefs.append(self._href)
            self._buf, self._href = None, None
        elif tag == "tr" and self._cells is not None:
            if self._cells:
                self.rows.append((self._cells, self._hrefs))
            self._cells, self._hrefs = None, None

    def handle_data(self, data):
        if self._buf is not None:
            self._buf.append(data)


def parse_table_rows(
    html: str, skip_header_rows: bool = False
) -> list[tuple[list[str], list[str | None]]]:
    """All parsed rows of the page; with ``skip_header_rows`` the first
    row of EVERY table is dropped (pages without <table> tags — bare
    <tr> fragments — fall back to dropping the first row overall)."""
    p = _TableParser()
    p.feed(html or "")
    if not skip_header_rows or not p.rows:
        return p.rows
    skip = set(p.table_starts) if p.table_starts else {0}
    return [r for i, r in enumerate(p.rows) if i not in skip]


def html_records(
    pages: DataFrame,
    payload_col: str,
    columns: list[str],
    skip_header: bool = True,
    with_href_of: str | None = None,
    href_alias: str = "href",
) -> DataFrame:
    """UDTF-shaped parse: each page row explodes into one row per
    parsed <tr>, cells mapped positionally onto ``columns`` (the header
    row skipped, mirroring the reference's row-0 skip,
    datasources.py:339). Key columns of the page row are carried through.

    ``with_href_of``: also emit the anchor href of the named column's
    cell (team-URL extraction shape).

    ``skip_header`` drops the first row of every <table> on the page
    (not just the page's first row — code-review r6). Carry columns
    keep their ORIGINAL Spark types (a non-string page key no longer
    breaks the Arrow conversion), and parsed/carry/href names must be
    mutually distinct (a collision used to corrupt the per-batch
    column assembly silently)."""
    carry_fields = [f for f in pages.schema.fields if f.name != payload_col]
    carry = [f.name for f in carry_fields]
    clash = (set(carry) & set(columns)) | (
        {href_alias} & (set(carry) | set(columns)) if with_href_of else set()
    )
    if len(set(columns)) != len(columns) or clash:
        raise ValueError(
            f"html_records: output names must be distinct; clash={sorted(clash)}"
        )
    out_fields = [StructField(f.name, f.dataType, True) for f in carry_fields]
    out_fields += [StructField(c, StringType(), True) for c in columns]
    if with_href_of:
        out_fields.append(StructField(href_alias, StringType(), True))
    schema = StructType(out_fields)
    href_idx = columns.index(with_href_of) if with_href_of else -1

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in schema.fields}
            for _, row in pdf.iterrows():
                rows = parse_table_rows(
                    row[payload_col], skip_header_rows=skip_header
                )
                for cells, hrefs in rows:
                    if len(cells) < len(columns):
                        continue  # malformed row — shape guard (datasources.py:349-352)
                    for c in carry:
                        out[c].append(row[c])
                    for i, c in enumerate(columns):
                        out[c].append(cells[i])
                    if with_href_of:
                        out[href_alias].append(hrefs[href_idx])
            yield pd.DataFrame(out)

    return pages.mapInPandas(_parse, schema=schema)
