"""Python UDTF form of the HTML-record parse (UD2, SURVEY.md §2.9).

``sources/html.html_records`` is the Arrow-batched production path
(mapInPandas); this module exposes the same parse as a real
table-generating function — Spark 4's ``@udtf`` — so a SQL user can
LATERAL-join a page column into cells:

    SELECT p.page_id, c.* FROM pages p, LATERAL html_cells(p.payload) c

The UDTF emits the fully generic (row_no, col_no, cell, href) shape;
positional column mapping (the reference's schema lists,
datasources.py:408-438) is a plain pivot/filter on top. Row-at-a-time
Python is fine here because parsing is the work, not the dispatch —
but for bulk ingest prefer html_records (Arrow batches amortize the
Python boundary).
"""

from __future__ import annotations

from pyspark.sql.functions import udtf

from .html import parse_table_rows


@udtf(returnType="row_no int, col_no int, cell string, href string")
class HtmlCellsUDTF:
    """Each call explodes one HTML payload into per-cell rows; header
    rows are emitted too (row_no 0) so the caller decides the skip —
    the reference skips row 0 (datasources.py:339)."""

    def eval(self, html: str):  # noqa: D102
        for row_no, (cells, hrefs) in enumerate(parse_table_rows(html)):
            for col_no, cell in enumerate(cells):
                yield row_no, col_no, cell, hrefs[col_no]


def register_html_cells(spark, name: str = "html_cells") -> None:
    """Register the UDTF for SQL LATERAL use."""
    spark.udtf.register(name, HtmlCellsUDTF)
