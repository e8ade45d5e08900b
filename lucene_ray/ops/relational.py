"""Relational + stream-shaped demo pipelines over the TPC-H-ish tables —
engine breadth beyond the index: partial-aggregate groupby, broadcast join,
top-k sort, tumbling windows, sessionization. All money sums are integer
cents via floor(x*100 + 0.5) so the DuckDB oracle hashes bit-identically
(double rounding semantics match on both sides).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Count, Sum


def _cents(x: np.ndarray) -> np.ndarray:
    return np.floor(x * 100.0 + 0.5).astype(np.int64)


def q1_pricing(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H-Q1-ish pricing summary with partial per-batch aggregation
    before the groupby (the combiner pattern — only (flag,status) partials
    shuffle)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        qty = batch.column("l_quantity").to_numpy(zero_copy_only=False)
        price = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = batch.column("l_discount").to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "l_linestatus": batch.column("l_linestatus"),
                "sum_qty_cents": pa.array(_cents(qty), type=pa.int64()),
                "sum_price_cents": pa.array(_cents(price), type=pa.int64()),
                "sum_disc_price_cents": pa.array(
                    _cents(price * (1.0 - disc)), type=pa.int64()
                ),
                "count_order": pa.array(np.ones(len(qty), dtype=np.int64)),
            }
        )
        g = pa.TableGroupBy(t, ["l_returnflag", "l_linestatus"]).aggregate(
            [
                ("sum_qty_cents", "sum"),
                ("sum_price_cents", "sum"),
                ("sum_disc_price_cents", "sum"),
                ("count_order", "sum"),
            ]
        )
        return g.rename_columns(
            [c.removesuffix("_sum") for c in g.column_names]
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    return partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty_cents", alias_name="sum_qty_cents"),
        Sum("sum_price_cents", alias_name="sum_price_cents"),
        Sum("sum_disc_price_cents", alias_name="sum_disc_price_cents"),
        Sum("count_order", alias_name="count_order"),
    )


def q1_pricing_sql() -> str:
    return """
SELECT l_returnflag, l_linestatus,
  CAST(sum(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty_cents,
  CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_price_cents,
  CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_disc_price_cents,
  count(*)::BIGINT AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


def top_orders(sf_dir: str, k: int = 20) -> "ray.data.Dataset":
    """Top-k orders by total price (desc, orderkey asc): per-batch local
    top-k then a tiny global sort — no full shuffle."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    )

    def local(batch: pa.Table) -> pa.Table:
        keys = batch.column("o_orderkey").to_numpy(zero_copy_only=False)
        cents = _cents(batch.column("o_totalprice").to_numpy(zero_copy_only=False))
        order = np.lexsort((keys, -cents))[:k]
        return pa.table(
            {
                "o_orderkey": pa.array(keys[order], type=pa.int64()),
                "total_cents": pa.array(cents[order], type=pa.int64()),
            }
        )

    cand = ds.map_batches(local, batch_format="pyarrow", batch_size=65536).to_pandas()
    order = np.lexsort((cand.o_orderkey.to_numpy(), -cand.total_cents.to_numpy()))[:k]
    return pa.table(
        {
            "o_orderkey": pa.array(cand.o_orderkey.to_numpy()[order], type=pa.int64()),
            "total_cents": pa.array(cand.total_cents.to_numpy()[order], type=pa.int64()),
        }
    )


def top_orders_sql(k: int = 20) -> str:
    return f"""
SELECT o_orderkey, CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS total_cents
FROM orders ORDER BY total_cents DESC, o_orderkey ASC LIMIT {k}
"""


def nation_order_stats(sf_dir: str) -> "ray.data.Dataset":
    """Orders per nation: broadcast-join orders->customer->nation (both
    small sides via ray.put; the fact table streams)."""
    import pyarrow.parquet as pq

    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    c_map = dict(zip(cust.column("c_custkey").to_pylist(), cust.column("c_nationkey").to_pylist()))
    n_map = dict(zip(nation.column("n_nationkey").to_pylist(), nation.column("n_name").to_pylist()))
    ref = ray.put((c_map, n_map))

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )

    def join(batch: pa.Table) -> pa.Table:
        cm, nm = ray.get(ref)
        cust_keys = batch.column("o_custkey").to_numpy(zero_copy_only=False)
        cents = _cents(batch.column("o_totalprice").to_numpy(zero_copy_only=False))
        names = np.array([nm.get(cm.get(int(c), -1), "UNKNOWN") for c in cust_keys], dtype=object)
        return pa.table(
            {
                "n_name": pa.array(names.tolist(), type=pa.string()),
                "total_cents": pa.array(cents, type=pa.int64()),
            }
        )

    return (
        ds.map_batches(join, batch_format="pyarrow", batch_size=65536)
        .groupby("n_name")
        .aggregate(
            Count(alias_name="order_count"),
            Sum("total_cents", alias_name="sum_total_cents"),
        )
    )


def nation_order_stats_sql() -> str:
    return """
SELECT n.n_name,
  count(*)::BIGINT AS order_count,
  CAST(sum(CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_total_cents
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
"""


def events_tumbling(sf_dir: str, window_secs: int = 3600) -> "ray.data.Dataset":
    """Tumbling event-time windows: (event_type, window_start_us, n_events,
    sum_value_cents). Ray Data is a batch engine — event-time windowing is
    keyed integer bucketing + groupby (SURVEY.md §2.9: the reference has no
    streaming operators either; ordering assumption: none needed, tumbling
    windows are order-free)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    )
    wus = window_secs * 1_000_000

    def bucket(batch: pa.Table) -> pa.Table:
        ts_us = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        win = (ts_us // wus) * wus
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "window_start_us": pa.array(win, type=pa.int64()),
                "value_cents": pa.array(
                    _cents(batch.column("value").to_numpy(zero_copy_only=False)),
                    type=pa.int64(),
                ),
            }
        )

    return (
        ds.map_batches(bucket, batch_format="pyarrow", batch_size=65536)
        .groupby(["event_type", "window_start_us"])
        .aggregate(
            Count(alias_name="n_events"),
            Sum("value_cents", alias_name="sum_value_cents"),
        )
    )


def events_tumbling_sql(window_secs: int = 3600) -> str:
    wus = window_secs * 1_000_000
    return f"""
SELECT event_type,
  (epoch_us(ts) // {wus}) * {wus} AS window_start_us,
  count(*)::BIGINT AS n_events,
  CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_cents
FROM events GROUP BY event_type, window_start_us
"""


def sessionize(sf_dir: str, gap_secs: int = 1800) -> "ray.data.Dataset":
    """Session windows per user (gap > gap_secs starts a new session):
    (user_id, session_id, n_events, first_us, last_us). session_id is the
    0-based session ordinal within the user.

    Shape: groupby(user_id).map_groups with a sort inside the group —
    the partition key IS the session key, so the shuffle is the only data
    movement and per-group state never crosses workers (ordering assumption:
    events of one user fit one group; ties broken by event_id)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )
    gap_us = gap_secs * 1_000_000

    def sessions(g):
        import pandas as pd

        g = g.sort_values(["ts", "event_id"])
        # robust to pandas datetime64[ns] vs [us]: normalize to microseconds
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        new = np.ones(len(ts), dtype=np.int64)
        new[1:] = (ts[1:] - ts[:-1] > gap_us).astype(np.int64)
        sid = np.cumsum(new) - 1
        out = pd.DataFrame({"user_id": g["user_id"].to_numpy(), "session_id": sid, "ts": ts})
        return (
            out.groupby(["user_id", "session_id"], as_index=False)
            .agg(n_events=("ts", "size"), first_us=("ts", "min"), last_us=("ts", "max"))
        )

    return ds.groupby("user_id").map_groups(sessions, batch_format="pandas")


def sessionize_sql(gap_secs: int = 1800) -> str:
    gap_us = gap_secs * 1_000_000
    return f"""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
  FROM events
), marked AS (
  SELECT user_id, event_id, ts_us,
         CASE WHEN prev_us IS NULL OR ts_us - prev_us > {gap_us} THEN 1 ELSE 0 END AS new_sess
  FROM e
), sess AS (
  SELECT user_id, ts_us,
         CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                  ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_id
  FROM marked
)
SELECT user_id, session_id, count(*)::BIGINT AS n_events,
       min(ts_us) AS first_us, max(ts_us) AS last_us
FROM sess GROUP BY user_id, session_id
"""


def events_hopping(
    sf_dir: str, window_secs: int = 3600, hop_secs: int = 1800
) -> "ray.data.Dataset":
    """Hopping (sliding) event-time windows: window length ``window_secs``
    advancing every ``hop_secs`` (must divide it) — each event lands in
    window/hop overlapping windows. Same order-free bucketing + combiner
    groupby shape as events_tumbling, with the window fan-out done in the
    map stage (each event emits window/hop rows; no state, no watermark —
    the batch analog, SURVEY.md §2.9)."""
    assert window_secs % hop_secs == 0
    fan = window_secs // hop_secs
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    )
    hus = hop_secs * 1_000_000

    def bucket(batch: pa.Table) -> pa.Table:
        ts_us = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        base = (ts_us // hus) * hus
        cents = _cents(batch.column("value").to_numpy(zero_copy_only=False))
        parts = []
        for k in range(fan):
            parts.append(
                pa.table(
                    {
                        "event_type": batch.column("event_type"),
                        "window_start_us": pa.array(base - k * hus, type=pa.int64()),
                        "value_cents": pa.array(cents, type=pa.int64()),
                    }
                )
            )
        return pa.concat_tables(parts)

    return (
        ds.map_batches(bucket, batch_format="pyarrow", batch_size=65536)
        .groupby(["event_type", "window_start_us"])
        .aggregate(
            Count(alias_name="n_events"),
            Sum("value_cents", alias_name="sum_value_cents"),
        )
    )


def events_hopping_sql(window_secs: int = 3600, hop_secs: int = 1800) -> str:
    hus = hop_secs * 1_000_000
    fan = window_secs // hop_secs
    shifts = "\nUNION ALL\n".join(
        f"SELECT event_type, (epoch_us(ts) // {hus}) * {hus} - {k * hus} AS window_start_us, "
        f"CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS value_cents FROM events"
        for k in range(fan)
    )
    return f"""
WITH fanout AS (
{shifts}
)
SELECT event_type, window_start_us,
       count(*)::BIGINT AS n_events,
       CAST(sum(value_cents) AS BIGINT) AS sum_value_cents
FROM fanout GROUP BY event_type, window_start_us
"""
