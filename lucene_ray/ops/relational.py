"""Relational + stream-shaped demo pipelines over the TPC-H-ish tables —
engine breadth beyond the index: partial-aggregate groupby, broadcast join,
top-k sort, tumbling windows, sessionization. All money sums are integer
cents via floor(x*100 + 0.5) so the DuckDB oracle hashes bit-identically
(double rounding semantics match on both sides).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

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


def q3_shipping(sf_dir: str, k: int = 10) -> pa.Table:
    """(o_orderkey, revenue_cents, o_orderdate): top-k URGENT orders by
    lineitem revenue — the TPC-H Q3 shipping-priority shape over this
    schema. Fact-fact join done Ray-Data-first with NO broadcast of
    either side: lineitem pre-aggregates per-order revenue inside
    map_batches (partial combine before the shuffle), the order side
    streams through the SAME union, and ONE groupby(key) reduce-side
    join emits (order, revenue, date) only when both sides are present;
    the top-k never materializes the joined set on the driver — each
    output block contributes k candidates and the driver merges
    O(blocks * k) rows. Revenue = integer cents,
    floor(price * (1 - discount) * 100 + 0.5) per line item (repo float
    protocol), so the oracle is exact."""
    rev = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_extendedprice", "l_discount"],
        )
        .map_batches(_q3_partial_revenue, batch_format="pyarrow", batch_size=65536)
        .groupby("key")
        .sum("rev_cents")
        .map_batches(
            lambda b: pa.table(
                {
                    "key": b.column("key"),
                    "rev_cents": b.column("sum(rev_cents)").cast(pa.int64()),
                    "date": pa.array([None] * b.num_rows, type=pa.timestamp("us")),
                    "side": pa.array([0] * b.num_rows, type=pa.int8()),
                }
            ),
            batch_format="pyarrow",
        )
    )
    ords = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(
        lambda b: pa.table(
            {
                "key": b.filter(
                    pc.equal(b.column("o_orderpriority"), "1-URGENT")
                ).column("o_orderkey").cast(pa.int64()),
                "rev_cents": pa.array(
                    [0]
                    * b.filter(
                        pc.equal(b.column("o_orderpriority"), "1-URGENT")
                    ).num_rows,
                    type=pa.int64(),
                ),
                "date": b.filter(
                    pc.equal(b.column("o_orderpriority"), "1-URGENT")
                ).column("o_orderdate").cast(pa.timestamp("us")),
                "side": pa.array(
                    [1]
                    * b.filter(
                        pc.equal(b.column("o_orderpriority"), "1-URGENT")
                    ).num_rows,
                    type=pa.int8(),
                ),
            }
        ),
        batch_format="pyarrow",
    )

    def join_group(df):
        import pandas as pd

        sides = set(df["side"])
        if sides != {0, 1}:
            return pd.DataFrame(
                {"o_orderkey": [], "revenue_cents": [], "o_orderdate": []}
            )
        rev_c = int(df.loc[df["side"] == 0, "rev_cents"].sum())
        date = df.loc[df["side"] == 1, "date"].iloc[0]
        return pd.DataFrame(
            {
                "o_orderkey": [int(df["key"].iloc[0])],
                "revenue_cents": [rev_c],
                "o_orderdate": [date],
            }
        )

    joined = rev.union(ords).groupby("key").map_groups(join_group)

    # bounded distributed top-k: per-block candidates, driver merges
    def block_topk(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        import numpy as np

        r = b.column("revenue_cents").to_numpy(zero_copy_only=False)
        kk = b.column("o_orderkey").to_numpy(zero_copy_only=False)
        order = np.lexsort((kk, -r))[:k]
        return b.take(pa.array(order))

    cand = joined.map_batches(
        block_topk, batch_format="pyarrow"
    ).to_arrow_refs()
    parts = [t for t in ray.get(cand) if t.num_rows]
    if not parts:
        return pa.table(
            {
                "o_orderkey": pa.array([], type=pa.int64()),
                "revenue_cents": pa.array([], type=pa.int64()),
                "o_orderdate_us": pa.array([], type=pa.int64()),
            }
        )
    allc = pa.concat_tables(parts, promote_options="default")
    import numpy as np

    r = allc.column("revenue_cents").to_numpy(zero_copy_only=False)
    kk = allc.column("o_orderkey").to_numpy(zero_copy_only=False)
    order = np.lexsort((kk, -r))[:k]
    out = allc.take(pa.array(order))
    return pa.table(
        {
            "o_orderkey": out.column("o_orderkey"),
            "revenue_cents": out.column("revenue_cents"),
            # epoch micros: timestamp dtype round-trips differ between
            # Arrow->pandas and DuckDB->pandas; the integer is exact
            "o_orderdate_us": out.column("o_orderdate")
            .cast(pa.timestamp("us"))
            .cast(pa.int64()),
        }
    )


def _q3_partial_revenue(batch: pa.Table) -> pa.Table:
    """Per-batch partial: integer-cents revenue summed per order key
    (combine before the shuffle)."""
    keys = batch.column("l_orderkey").to_numpy(zero_copy_only=False)
    px = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
    disc = batch.column("l_discount").to_numpy(zero_copy_only=False)
    cents = np.floor(px * (1.0 - disc) * 100.0 + 0.5).astype(np.int64)
    uniq, inv = np.unique(keys, return_inverse=True)
    sums = np.zeros(len(uniq), dtype=np.int64)
    np.add.at(sums, inv, cents)
    return pa.table(
        {
            "key": pa.array(uniq, type=pa.int64()),
            "rev_cents": pa.array(sums, type=pa.int64()),
        }
    )


def q3_shipping_sql(k: int = 10) -> str:
    return f"""
SELECT l.l_orderkey AS o_orderkey,
  CAST(sum(CAST(floor(l.l_extendedprice * (1.0 - l.l_discount) * 100.0 + 0.5)
                AS BIGINT)) AS BIGINT) AS revenue_cents,
  epoch_us(any_value(o.o_orderdate)) AS o_orderdate_us
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderpriority = '1-URGENT'
GROUP BY l.l_orderkey
ORDER BY revenue_cents DESC, o_orderkey ASC
LIMIT {k}
"""
