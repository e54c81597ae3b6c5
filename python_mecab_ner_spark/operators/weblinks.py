"""Web link-graph extraction: the hyperlink half of a Common-Crawl
page (BASELINE.json input_hint carries ``html:binary``).

Outlink extraction is a pure JVM projection — binary -> UTF-8 string
cast + ``regexp_extract_all`` on href attributes + one explode; no
Python worker, no shuffle.  The host graph is then ONE map-side-
combinable aggregate keyed by (src_host, dst_host): host cardinality
is tiny relative to pages (the web has ~10^8 hosts vs ~10^12 pages),
so the aggregate output is dimension-sized and the head-host skew is
absorbed by partial aggregation before the exchange.

The host-level graph feeds the same downstream graph operators as the
entity graph (pagerank_int, khop_neighbors, connected_components) —
host authority ranking is the classic crawl-prioritization signal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HREF_PATTERN = r'href="([^"]+)"'
_HOST_PATTERN = "^[^:/?#]+://([^/?#]*)"


def host_of(col) -> F.Column:
    """authority component of an absolute URL, lowercased.  A
    relative href (no scheme) yields '' — callers that ingest
    relative-link html should resolve against the page url upstream
    or filter the empty host."""
    return F.lower(F.regexp_extract(col, _HOST_PATTERN, 1))


def outlinks(pages: DataFrame, html_col: str = "html",
             url_col: str = "url") -> DataFrame:
    """(src_url, dst_url) rows — one per href in the page html.

    Scale shape: narrow projection (html decoded once, pruned
    immediately) + explode; parallelism is the input partitioning,
    nothing moves."""
    hrefs = F.regexp_extract_all(
        F.col(html_col).cast("string"), F.lit(HREF_PATTERN), 1)
    return pages.select(F.col(url_col).alias("src_url"),
                        F.explode(hrefs).alias("dst_url"))


def host_graph(pages: DataFrame, html_col: str = "html",
               url_col: str = "url") -> DataFrame:
    """Weighted host-level link graph: (src_host, dst_host, n_links).

    One combinable aggregate over the exploded outlinks; the output is
    host-dimension-sized, so downstream graph iteration (rank, k-hop)
    runs on a table orders of magnitude smaller than the page set."""
    l = outlinks(pages, html_col, url_col)
    return (l.select(host_of(F.col("src_url")).alias("src_host"),
                     host_of(F.col("dst_url")).alias("dst_host"))
            .groupBy("src_host", "dst_host")
            .agg(F.count("*").cast("bigint").alias("n_links")))


ANCHOR_PATTERN = r'href="([^"]+)"[^>]*>([^<]*)</a>'


def anchor_texts(pages: DataFrame, html_col: str = "html",
                 url_col: str = "url") -> DataFrame:
    """(src_url, dst_url, anchor) rows — href + its anchor text.

    Same narrow-projection shape as outlinks: two regexp_extract_all
    passes over the decoded html zipped positionally (the
    regex_entities trick, functions/text.py) + one explode."""
    h = F.col(html_col).cast("string")
    z = F.arrays_zip(
        F.regexp_extract_all(h, F.lit(ANCHOR_PATTERN), 1).alias("dst_url"),
        F.regexp_extract_all(h, F.lit(ANCHOR_PATTERN), 2).alias("anchor"))
    return (pages.select(F.col(url_col).alias("src_url"),
                         F.explode(z).alias("a"))
            .select("src_url", F.col("a.dst_url").alias("dst_url"),
                    F.col("a.anchor").alias("anchor")))


def inbound_anchor_profile(pages: DataFrame, html_col: str = "html",
                           url_col: str = "url") -> DataFrame:
    """Per-target-host inbound anchor-text term counts: (dst_host,
    term, n) — how the web DESCRIBES each host.  Anchor text is the
    classic external-description signal for entity canonicalization
    in web KGs (a surface form used by many independent source pages
    is strong alias evidence, and it lives outside the page being
    described).

    Scale shape: ONE combinable aggregate keyed by (host, term) —
    cardinality is hosts x vocabulary, dimension-sized next to the
    page set; the head-host key skew dies in partial aggregation."""
    at = anchor_texts(pages, html_col, url_col)
    return (at.groupBy(host_of(F.col("dst_url")).alias("dst_host"),
                       F.col("anchor").alias("term"))
            .agg(F.count("*").cast("bigint").alias("n")))
