"""Stream-stream joins — the remaining Structured Streaming join surface.

The canonical attribution shape: join a purchase stream to the view
stream of the same user within a trailing time interval. Both sides are
watermarked so Spark can bound the join STATE: a view older than
(watermark + interval) can never match a future purchase and is evicted —
without the time bounds the state store grows without limit, which is the
stream-stream-join scale failure mode. The batch twin
(``interval_join_view_purchase`` in queries.py) is oracle-checked, and the
streaming replay is proven equal to it in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def view_purchase_interval_join_stream(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Purchases joined to same-user views from the preceding hour.

    One watermarked source split into two sides; the join condition
    carries BOTH the user equality (the shuffle key) and the event-time
    interval (the state-eviction bound).
    """
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("user_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    joined = views.join(
        purchases,
        F.expr(
            "v_user = user_id AND "
            "v_ts >= p_ts - INTERVAL 1 HOUR AND v_ts <= p_ts"
        ),
        "inner",
    )
    return joined.select("purchase_id", "view_id", "user_id")


def enrich_stream_with_dim(
    events: DataFrame, dim: DataFrame, on: str = "user_id"
) -> DataFrame:
    """Stream-static enrichment join — the most common production join:
    every micro-batch of the stream joins against a (slowly-changing)
    static dimension. No watermark and NO JOIN STATE is needed: the
    static side re-resolves per micro-batch (so a dim refresh between
    batches is picked up), and Spark broadcasts it when small. State
    cost is zero regardless of stream length — the reason to prefer
    stream-static over stream-stream whenever one side is a table.
    """
    from ..operators.relational import broadcast_dim_join

    return broadcast_dim_join(events, dim, on, "left")
