"""Stream-stream joins for the crawl loop.

The missing piece between discovery and fetch: the parse stage emits
outlinks (a stream of discovered urls), the fetcher emits completed
fetches (a stream of (url, fetch_ts) events), and closing the crawl
loop — "which discoveries got resolved, and how fast" — is a
watermarked stream-stream INTERVAL join: equality on url plus an
event-time range bounding how long a discovery waits for its fetch.

Spark's state-cleanup contract requires exactly this shape: a
watermark on BOTH inputs plus a time-range join condition, so each
side's state store holds only the watermark horizon of rows
(state is bounded at any stream rate; without the range condition
the join would buffer both streams forever).

Scale shape: both sides shuffle once on the url join key
(co-partitioned state stores, the standard stream-stream layout);
the output is append-mode-safe because the join is inner — a result
row is final the moment it is emitted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_fetch_attribution(discovered: DataFrame, fetched: DataFrame,
                             max_delay_min: int = 30,
                             watermark_min: int = 60) -> DataFrame:
    """Join a stream of discovered outlinks (url, disc_ts) to the
    stream of completed fetches (url, fetch_ts) that resolved them
    within ``max_delay_min`` of discovery (event time).

    Returns (url, disc_ts, fetch_ts, delay_sec) — one row per
    (discovery, fetch) pair inside the window; delay_sec is an exact
    integer.  A discovery fetched twice inside the window attributes
    to both fetches (downstream first-fetch-wins is a batch argmax
    over the attribution table — chaining another stateful op after a
    stream-stream join is deliberately avoided here).

    Works identically on batch DataFrames (watermarks are a no-op in
    batch), which is what the parity test pins.

    The state-retention horizon must cover the join window: a caller
    passing max_delay_min > watermark_min would get nondeterministic
    drops (state evicted before late fetches arrive), so the
    effective watermark is max(watermark_min, max_delay_min).
    """
    wm = max(int(watermark_min), int(max_delay_min))
    d = (discovered.select("url", "disc_ts")
         .withWatermark("disc_ts", f"{wm} minutes"))
    f = (fetched.select(F.col("url").alias("f_url"), "fetch_ts")
         .withWatermark("fetch_ts", f"{wm} minutes"))
    cond = ((d["url"] == f["f_url"])
            & (f["fetch_ts"] >= d["disc_ts"])
            & (f["fetch_ts"] <= d["disc_ts"]
               + F.expr(f"INTERVAL {int(max_delay_min)} MINUTES")))
    return (d.join(f, cond, "inner")
            .select("url", "disc_ts", "fetch_ts",
                    (F.unix_timestamp("fetch_ts")
                     - F.unix_timestamp("disc_ts"))
                    .cast("bigint").alias("delay_sec")))
