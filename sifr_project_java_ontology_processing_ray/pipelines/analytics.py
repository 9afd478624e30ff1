"""Event-stream analytics operators over the ``events`` table.

The web-analytics companions to the windowing/sessionization family in
``relational.py`` (SURVEY §2.9): ordered per-key prefix aggregation,
day-over-day retention, exact grouped variance, and funnel conversion.
Each has an exact DuckDB oracle (``__ray_entry__.oracle_sql``); column
names and float handling match the SQL exactly.

Scale notes (the shapes, not the toy sizes):
- Per-key ORDERED computation (running totals, funnels) co-locates each
  key's rows in one bucket of a single hash shuffle
  (``state/grouped.bucketed_map_groups``) and runs vectorized inside the
  bucket — never a python call per key, never a global sort. Per-key row
  counts are human-activity-bounded, so buckets stay small even at 10^9
  users.
- Count/variance style aggregates reduce per-batch partials (Arrow
  ``group_by``) to ≤|groups| rows before any exchange; the driver folds
  only group-cardinality-sized frames (days, event types, funnel stages).
- Exactness discipline: floats only ever appear in a FINAL single
  division/rounding; everything order-sensitive is carried as integers
  (cents, day ordinals) so results are bit-stable across parallelism.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.numeric import round_sql
from ..state.grouped import bucketed_map_groups
from .relational import _read

# --------------------------------------------------------------------------
# ordered per-key prefix aggregation: running total per user
# (the reference's only ordering guarantee is the deterministic
# forEachOrdered traversal, AbstractOntologyProcessor.java:59 — here the
# per-key event-time order is made an explicit contract)
# --------------------------------------------------------------------------


def q_user_running_total(sf_dir: str):
    """(event_id, user_id, running_total): cumulative sum of ``value`` per
    user in (ts, event_id) order. One bucketed shuffle on user_id; inside a
    bucket the cumsum is a single vectorized pandas pass over all keys at
    once (sort + groupby-cumsum), exactly the sequential left-to-right
    float addition the SQL window performs — so the doubles are
    bit-identical, and round(3) is cosmetic, not load-bearing."""

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        out = df[["event_id", "user_id"]].copy()
        out["running_total"] = round_sql(df.groupby("user_id")["value"].cumsum(), 3)
        return out

    out = bucketed_map_groups(
        _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"]),
        ["user_id"],
        combine,
    )
    return out.to_pandas().sort_values("event_id").reset_index(drop=True)


SQL_USER_RUNNING_TOTAL = """
SELECT event_id, user_id,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 3)
         AS running_total
FROM events ORDER BY event_id
"""


# --------------------------------------------------------------------------
# day-over-day retention: distinct users active on day d AND d+1
# --------------------------------------------------------------------------


def q_day_retention(sf_dir: str):
    """(day, active, retained): distinct users per UTC day, and how many of
    them appear again the next day. Per-batch distinct (day, user) partials
    ride ONE bucketed shuffle keyed on user_id; each user's day set is then
    complete in its bucket, so next-day presence is a vectorized
    searchsorted per bucket. Only day-cardinality-sized partial counts
    reach the driver — at a year of 10^9-user traffic that is 365 rows per
    bucket, not a users×days exchange."""

    def tag(b: pa.Table) -> pa.Table:
        day = pc.cast(pc.cast(b["ts"], pa.date32()), pa.int32())
        t = pa.table({"user_id": b["user_id"], "d": day})
        return t.group_by(["user_id", "d"]).aggregate([])  # distinct partial

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        # bucket holds every (user, day) pair of its users (possibly with
        # cross-batch duplicates — drop them, then vectorized next-day test)
        df = df.drop_duplicates(["user_id", "d"]).sort_values(["user_id", "d"])
        u = df["user_id"].to_numpy()
        d = df["d"].to_numpy()
        # next row within the same user at exactly d+1 ⇒ retained; the
        # (user, d) pairs are sorted and unique, so d+1 can only be adjacent
        nxt = np.zeros(len(df), bool)
        if len(df):
            nxt[:-1] = (u[:-1] == u[1:]) & (d[:-1] + 1 == d[1:])
        g = pd.DataFrame({"d": d, "active": 1, "retained": nxt.astype(np.int64)})
        return g.groupby("d", as_index=False).sum()

    parts = bucketed_map_groups(
        _read(sf_dir, "events", ["user_id", "ts"]).map_batches(
            tag, batch_format="pyarrow"
        ),
        ["user_id"],
        combine,
    ).to_pandas()
    out = parts.groupby("d", as_index=False).sum().sort_values("d")
    out["day"] = (
        out.pop("d").to_numpy().astype("datetime64[D]").astype(str)
    )
    return out[["day", "active", "retained"]].reset_index(drop=True)


SQL_DAY_RETENTION = """
WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events)
SELECT strftime(a.d, '%Y-%m-%d') AS day,
       count(*) AS active,
       count(b.user_id) AS retained
FROM du a LEFT JOIN du b
  ON b.user_id = a.user_id AND b.d = a.d + INTERVAL 1 DAY
GROUP BY a.d ORDER BY day
"""


# --------------------------------------------------------------------------
# exact grouped variance via integer cents (float sums are order-sensitive;
# integer moment sums are not — the distributed-exactness discipline)
# --------------------------------------------------------------------------


def q_value_variance(sf_dir: str):
    """(event_type, n, variance_value): exact population variance of
    ``value`` per event_type. ``value`` is carried as integer cents
    (floor(v*100 + 0.5) — identical double math in the oracle), the batch
    partials are integer moment sums (n, Σc, Σc²) — order-independent, so
    any parallelism gives the same bits — and the single float division
    happens once, driver-side, on exact integers. Partials are Arrow
    group_by combiners: the shuffle moves ≤|event types| rows per batch."""

    def partial(b: pa.Table) -> pa.Table:
        c = pc.cast(
            pc.floor(pc.add(pc.multiply(b["value"], pa.scalar(100.0)), pa.scalar(0.5))),
            pa.int64(),
        )
        t = pa.table(
            {"event_type": b["event_type"], "c": c, "c2": pc.multiply(c, c)}
        )
        return (
            t.group_by("event_type")
            .aggregate([("c", "count"), ("c", "sum"), ("c2", "sum")])
            .rename_columns(["event_type", "p_n", "p_s", "p_s2"])
        )

    parts = (
        _read(sf_dir, "events", ["event_type", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    # python-int (object) partial fold: Σc² per group exceeds int64 around
    # 10^11 rows — the driver fold is the one place that sees full sums
    for c in ("p_n", "p_s", "p_s2"):
        parts[c] = parts[c].astype(object)
    g = parts.groupby("event_type", as_index=False).sum()
    rows = []
    for _, r in g.iterrows():
        # python ints: no int64 overflow at any scale (n·Σc² − (Σc)²)
        n, s, s2 = int(r["p_n"]), int(r["p_s"]), int(r["p_s2"])
        var = float(n * s2 - s * s) / float(n * n) / 10000.0
        rows.append((r["event_type"], n, float(round_sql(var, 6))))
    return pd.DataFrame(rows, columns=["event_type", "n", "variance_value"]).sort_values(
        "event_type"
    ).reset_index(drop=True)


SQL_VALUE_VARIANCE = """
WITH c AS (
  SELECT event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cv
  FROM events
)
SELECT event_type, count(*) AS n,
       round(CAST(count(*) * sum(cv * cv) - sum(cv) * sum(cv) AS DOUBLE)
             / CAST(count(*) * count(*) AS DOUBLE) / 10000.0, 6)
         AS variance_value
FROM c GROUP BY event_type ORDER BY event_type
"""


# --------------------------------------------------------------------------
# funnel conversion: first-view → first-click → first-purchase ordering
# --------------------------------------------------------------------------

_FUNNEL = ["view", "click", "purchase"]


def q_funnel_conversion(sf_dir: str):
    """(stage, users): users with a 'view'; of those, users whose first
    'click' is strictly after their first 'view'; of those, users whose
    first 'purchase' is strictly after that first 'click'. Per-batch
    partial = min(ts) per (user, stage type) — an Arrow combiner, so the
    bucketed shuffle moves ≤3 rows per user — and each bucket pivots its
    users vectorized and emits 3 partial counts; the driver folds a
    3-row frame per bucket."""

    def partial(b: pa.Table) -> pa.Table:
        m = pc.is_in(b["event_type"], value_set=pa.array(_FUNNEL))
        t = pa.table(
            {"user_id": b["user_id"], "event_type": b["event_type"], "ts": b["ts"]}
        ).filter(m)
        return t.group_by(["user_id", "event_type"]).aggregate([("ts", "min")])

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        p = df.pivot_table(
            index="user_id", columns="event_type", values="ts_min", aggfunc="min"
        )
        v = p["view"].notna() if "view" in p else pd.Series(False, index=p.index)
        c = (p["click"] > p["view"]) & v if "click" in p and "view" in p else (
            pd.Series(False, index=p.index)
        )
        pu = (p["purchase"] > p["click"]) & c if "purchase" in p and "click" in p else (
            pd.Series(False, index=p.index)
        )
        return pd.DataFrame(
            {
                "stage": ["view", "view>click", "view>click>purchase"],
                "p_users": [int(v.sum()), int(c.sum()), int(pu.sum())],
            }
        )

    parts = bucketed_map_groups(
        _read(sf_dir, "events", ["user_id", "event_type", "ts"]).map_batches(
            partial, batch_format="pyarrow"
        ),
        ["user_id"],
        combine,
    ).to_pandas()
    out = parts.groupby("stage", as_index=False)["p_users"].sum()
    out = out.rename(columns={"p_users": "users"})
    # funnel order, not lexicographic
    order = {"view": 0, "view>click": 1, "view>click>purchase": 2}
    return out.sort_values("stage", key=lambda s: s.map(order)).reset_index(drop=True)


# --------------------------------------------------------------------------
# distributed percent-rank: broadcast-CDF ranking without a global sort
# --------------------------------------------------------------------------


def q_value_percentile(sf_dir: str):
    """(event_id, pct): exact percent_rank of every event's ``value`` —
    (count of strictly smaller rows) / (n − 1), ties sharing the minimum
    rank, exactly SQL's percent_rank(). NO global sort: pass 1 reduces
    per-batch distinct-value count partials to a (value, count) table
    (distinct-value-bounded — the 2-decimal domain keeps it tiny; an
    open-domain double column would use the histogram-refinement
    machinery in relational.distributed_kth_values instead); the driver
    turns it into a sorted CDF, broadcasts it once via ray.put, and pass
    2 ranks every row with a vectorized searchsorted. The division is the
    only float op and both sides compute count_below / (n−1) on exact
    ints, so the doubles match bit-for-bit."""
    import ray

    def partial(b: pa.Table) -> pa.Table:
        return (
            pa.table({"v": b["value"]})
            .group_by("v")
            .aggregate([("v", "count")])
            .rename_columns(["v", "p_n"])
        )

    counts = (
        _read(sf_dir, "events", ["value"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("v", as_index=False)["p_n"].sum()
        .sort_values("v")
    )
    vals = counts["v"].to_numpy()
    below = np.concatenate(([0], counts["p_n"].to_numpy().cumsum()[:-1]))
    n = int(counts["p_n"].sum())
    ref = ray.put((vals, below, n))

    def rank(b: pa.Table, ref=ref) -> pa.Table:
        from ..state.broadcast import cached_get

        vals, below, n = cached_get(ref)
        v = b["value"].to_numpy(zero_copy_only=False)
        cb = below[np.searchsorted(vals, v)]
        return pa.table(
            {"event_id": b["event_id"],
             "pct": pa.array(cb.astype(np.float64) / float(n - 1), pa.float64())}
        )

    return _read(sf_dir, "events", ["event_id", "value"]).map_batches(
        rank, batch_format="pyarrow"
    )


SQL_VALUE_PERCENTILE = """
SELECT event_id, percent_rank() OVER (ORDER BY value) AS pct FROM events
"""


# --------------------------------------------------------------------------
# semi-structured field extraction: typed stats out of a JSON props column
# --------------------------------------------------------------------------


def q_json_field_stats(sf_dir: str):
    """(event_type, n_with_k, sum_k, min_k, max_k): extract the integer
    ``$.k`` field from the JSON ``props`` column with a VECTORIZED Arrow
    regex (pc.extract_regex — no per-row json.loads in the hot path; a
    full JSON decode belongs in an actor-pool stage only when the schema
    is genuinely dynamic) and reduce integer moments per event_type.
    Per-batch Arrow group_by combiner → ≤|event types| rows per batch
    reach the shuffle."""

    def partial(b: pa.Table) -> pa.Table:
        m = pc.extract_regex(b["props"], r'"k":\s*(?P<k>-?\d+)')
        k = pc.cast(pc.struct_field(m, "k"), pa.int64())
        t = pa.table({"event_type": b["event_type"], "k": k}).filter(
            pc.is_valid(k)
        )
        return (
            t.group_by("event_type")
            .aggregate([("k", "count"), ("k", "sum"), ("k", "min"), ("k", "max")])
            .rename_columns(["event_type", "p_n", "p_s", "p_min", "p_max"])
        )

    parts = (
        _read(sf_dir, "events", ["event_type", "props"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    g = parts.groupby("event_type", as_index=False).agg(
        n_with_k=("p_n", "sum"),
        sum_k=("p_s", "sum"),
        min_k=("p_min", "min"),
        max_k=("p_max", "max"),
    )
    return g.sort_values("event_type").reset_index(drop=True)


SQL_JSON_FIELD_STATS = """
WITH j AS (
  SELECT event_type, CAST(json_extract(props, '$.k') AS BIGINT) AS k
  FROM events
)
SELECT event_type, count(k) AS n_with_k, CAST(sum(k) AS BIGINT) AS sum_k,
       min(k) AS min_k, max(k) AS max_k
FROM j WHERE k IS NOT NULL
GROUP BY event_type ORDER BY event_type
"""


SQL_FUNNEL_CONVERSION = """
WITH f AS (
  SELECT user_id,
         min(ts) FILTER (WHERE event_type = 'view') AS v,
         min(ts) FILTER (WHERE event_type = 'click') AS c,
         min(ts) FILTER (WHERE event_type = 'purchase') AS p
  FROM events GROUP BY user_id
)
SELECT 'view' AS stage, count(*) AS users FROM f WHERE v IS NOT NULL
UNION ALL
SELECT 'view>click', count(*) FROM f WHERE v IS NOT NULL AND c > v
UNION ALL
SELECT 'view>click>purchase', count(*) FROM f
WHERE v IS NOT NULL AND c > v AND p > c
"""


# --------------------------------------------------------------------------
# trailing moving-window aggregation per key (ROWS BETWEEN n PRECEDING)
# --------------------------------------------------------------------------


def q_user_moving_sum(sf_dir: str):
    """(event_id, user_id, win_n, mov_sum_cents): trailing 4-event moving
    sum of ``value`` per user in (ts, event_id) order. Same single bucketed
    shuffle as the running total; inside a bucket the window is three
    masked shifted adds over ALL keys at once (no per-key python). The
    order-sensitive sum is carried in integer cents — floor(value*100+0.5)
    is the identical IEEE double op on both sides, and integer addition is
    order-free — so the result is bit-stable across any parallelism."""

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = df["user_id"].to_numpy()
        cents = np.floor(df["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        acc = cents.copy()
        n = np.ones(len(df), np.int64)
        for k in (1, 2, 3):
            same = np.zeros(len(df), bool)
            same[k:] = u[k:] == u[:-k]
            acc[k:] += np.where(same[k:], cents[:-k], 0)
            n += same
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(),
                "user_id": u,
                "win_n": n,
                "mov_sum_cents": acc,
            }
        )

    out = bucketed_map_groups(
        _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"]),
        ["user_id"],
        combine,
    )
    return out.to_pandas().sort_values("event_id").reset_index(drop=True)


SQL_USER_MOVING_SUM = """
SELECT event_id, user_id,
       count(*) OVER w AS win_n,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER w AS BIGINT)
           AS mov_sum_cents
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
ORDER BY event_id
"""


# --------------------------------------------------------------------------
# per-key LAG gaps: time between consecutive events per user (the ordered
# per-key family's diff companion — exact in integer microseconds)
# --------------------------------------------------------------------------


def q_event_gaps(sf_dir: str):
    """(user_id, n_gaps, avg_gap_s, max_gap_us): inter-event gaps per user
    in (ts, event_id) order. One bucketed shuffle on user_id; inside a
    bucket the LAG diff is one vectorized pass over all keys at once
    (sort + shifted int64-μs subtraction masked at key boundaries). Gaps
    stay integer μs end-to-end; the single float division mirrors the
    SQL's CAST exactly. Users with one event have no gaps and are
    excluded, as in the oracle's WHERE gap IS NOT NULL."""

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = df["user_id"].to_numpy()
        t = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        gap = t[1:] - t[:-1]
        same = u[1:] == u[:-1]
        g = pd.DataFrame({"user_id": u[1:][same], "gap_us": gap[same]})
        if g.empty:
            return pd.DataFrame(
                {"user_id": pd.Series([], dtype=np.int64),
                 "n_gaps": pd.Series([], dtype=np.int64),
                 "sum_gap_us": pd.Series([], dtype=np.int64),
                 "max_gap_us": pd.Series([], dtype=np.int64)}
            )
        out = g.groupby("user_id", as_index=False).agg(
            n_gaps=("gap_us", "size"),
            sum_gap_us=("gap_us", "sum"),
            max_gap_us=("gap_us", "max"),
        )
        return out

    parts = bucketed_map_groups(
        _read(sf_dir, "events", ["event_id", "user_id", "ts"]),
        ["user_id"],
        combine,
    ).to_pandas()
    parts["avg_gap_s"] = round_sql(
        parts["sum_gap_us"].astype(np.float64)
        / parts["n_gaps"].astype(np.float64)
        / 1e6,
        6,
    )
    return (
        parts[["user_id", "n_gaps", "avg_gap_s", "max_gap_us"]]
        .sort_values("user_id")
        .reset_index(drop=True)
    )


SQL_EVENT_GAPS = """
WITH g AS (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events
)
SELECT user_id,
       count(gap_us) AS n_gaps,
       round(CAST(sum(gap_us) AS DOUBLE) / CAST(count(gap_us) AS DOUBLE)
             / 1000000.0, 6) AS avg_gap_s,
       max(gap_us) AS max_gap_us
FROM g WHERE gap_us IS NOT NULL
GROUP BY user_id ORDER BY user_id
"""


# --------------------------------------------------------------------------
# RANGE-interval window: per-event sum over the SAME user's preceding hour.
# The distributed shape is a bounded time-range SELF-JOIN: events bucketed
# by (user, hour) meet every candidate contributor in (hour, hour-1), so
# pair volume is per-user-hour density², never |events|² — the standard
# bounded-range-join co-partitioning. Exact integer cents end-to-end.
# --------------------------------------------------------------------------

_HOUR_US = 3_600_000_000


def q_user_hour_window_sum(sf_dir: str):
    """(event_id, user_id, win_cents): sum of ``value`` (as integer cents)
    over the user's events in the RANGE window [ts − 1h, ts]. One bucketed
    shuffle on user_id; inside a bucket each event row merges with the
    contributor copies tagged (hour, hour+1) — two vectorized pandas
    merges, a Δt filter, one groupby-sum. RANGE peer semantics (equal-ts
    rows all included) fall out of the Δt ≥ 0 filter. Integer sums: no
    float-order sensitivity at any parallelism."""

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        t = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        cv = np.floor(df["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        h = t // _HOUR_US
        rows = pd.DataFrame(
            {"event_id": df["event_id"].to_numpy(), "user_id": df["user_id"].to_numpy(),
             "h": h, "t_row": t}
        )
        contrib = pd.DataFrame(
            {"user_id": df["user_id"].to_numpy(), "h": h, "t_c": t, "cv": cv}
        )
        # an event contributes to windows anchored in its own hour and the
        # next one; [t-1h, t] can only intersect those two hour buckets
        contrib_next = contrib.assign(h=contrib["h"] + 1)
        pairs = rows.merge(
            pd.concat([contrib, contrib_next], ignore_index=True),
            on=["user_id", "h"],
        )
        dt = pairs["t_row"] - pairs["t_c"]
        pairs = pairs[(dt >= 0) & (dt <= _HOUR_US)]
        out = pairs.groupby(["event_id", "user_id"], as_index=False)["cv"].sum()
        return out.rename(columns={"cv": "win_cents"})

    out = bucketed_map_groups(
        _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"]),
        ["user_id"],
        combine,
    ).to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


SQL_USER_HOUR_WINDOW_SUM = """
WITH c AS (
  SELECT event_id, user_id, ts,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cv
  FROM events
)
SELECT event_id, user_id,
       CAST(sum(cv) OVER (PARTITION BY user_id ORDER BY ts
                          RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                                    AND CURRENT ROW) AS BIGINT)
         AS win_cents
FROM c ORDER BY event_id
"""


# --------------------------------------------------------------------------
# exact per-group discrete percentile (p90) from a distributed value-count
# histogram — the shuffle moves ≤ |group × distinct cents| rows, never the
# base table (value domain is cents-bounded; document the assumption)
# --------------------------------------------------------------------------


def q_value_p90(sf_dir: str):
    """(event_type, n, p90_value): the discrete 90th percentile of
    ``value`` per event_type under the explicit rule ``element at
    row_number ceil(0.9·n) in cv order`` — stated identically in the SQL,
    so no dependence on any engine's quantile convention. Per-batch
    (event_type, cents) count partials → one Sum shuffle of histogram
    rows → driver cumsum over the group-×-distinct-cents-sized result."""

    def partial(b: pa.Table) -> pa.Table:
        cv = pc.cast(
            pc.floor(pc.add(pc.multiply(b["value"], pa.scalar(100.0)), pa.scalar(0.5))),
            pa.int64(),
        )
        t = pa.table({"event_type": b["event_type"], "cv": cv})
        return (
            t.group_by(["event_type", "cv"])
            .aggregate([("cv", "count")])
            .rename_columns(["event_type", "cv", "p_n"])
        )

    from ray.data.aggregate import Sum

    hist = (
        _read(sf_dir, "events", ["event_type", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "cv"])
        .aggregate(Sum("p_n", alias_name="n"))
        .to_pandas()
        .sort_values(["event_type", "cv"])
    )
    rows = []
    for et, g in hist.groupby("event_type", sort=True):
        n = int(g["n"].sum())
        target = (9 * n + 9) // 10  # ceil(9n/10), pure integer — the SQL
        # uses the same (9*n+9)//10 form: ceil(0.9*n) in doubles can
        # overshoot (0.9*60 → 54.0000000000000013 → ceil 55)
        cum = g["n"].cumsum().to_numpy()
        cv = int(g["cv"].to_numpy()[np.searchsorted(cum, target)])
        rows.append((et, n, float(round_sql(cv / 100.0, 2))))
    return pd.DataFrame(rows, columns=["event_type", "n", "p90_value"])


SQL_VALUE_P90 = """
WITH c AS (
  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS cv
  FROM events
), r AS (
  SELECT event_type, cv,
         row_number() OVER (PARTITION BY event_type ORDER BY cv) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM c
)
SELECT event_type, n, round(cv / 100.0, 2) AS p90_value
FROM r WHERE rn = (9 * n + 9) // 10
ORDER BY event_type
"""


# --------------------------------------------------------------------------
# per-key ordered transitions: (prev event_type → event_type) counts — the
# Markov-chain / n-gram extraction over event streams; same one-bucketed-
# shuffle shape as the LAG family, bigram emission fully vectorized
# --------------------------------------------------------------------------


def q_event_transitions(sf_dir: str):
    """(from_type, to_type, n): count of consecutive event-type pairs per
    user in (ts, event_id) order, summed over users. One bucketed shuffle
    on user_id; inside a bucket the bigram emission is one shifted-array
    comparison masked at key boundaries, pre-aggregated to
    ≤ |types|² rows per bucket before the driver fold."""

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = df["user_id"].to_numpy()
        et = df["event_type"].to_numpy(object)
        same = u[1:] == u[:-1]
        g = pd.DataFrame({"from_type": et[:-1][same], "to_type": et[1:][same]})
        g["n"] = np.int64(1)
        return g.groupby(["from_type", "to_type"], as_index=False)["n"].sum()

    parts = bucketed_map_groups(
        _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"]),
        ["user_id"],
        combine,
    ).to_pandas()
    out = parts.groupby(["from_type", "to_type"], as_index=False)["n"].sum()
    return out.sort_values(["from_type", "to_type"]).reset_index(drop=True)


SQL_EVENT_TRANSITIONS = """
WITH t AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events
)
SELECT prev_type AS from_type, event_type AS to_type, count(*) AS n
FROM t WHERE prev_type IS NOT NULL
GROUP BY 1, 2 ORDER BY 1, 2
"""


# --------------------------------------------------------------------------
# set operations (INTERSECT / EXCEPT) via the presence-flag pattern: one
# scan, per-batch distinct (user, flagA, flagB) partials, one groupby-Max —
# the same single-shuffle shape as snapshot_delta's diff. The day bounds
# come from parquet row-group STATISTICS (a metadata-only pass, no scan).
# --------------------------------------------------------------------------


def _events_day_bounds(sf_dir: str) -> tuple[int, int]:
    """(first_day, last_day) as date32 ints from parquet ts statistics —
    footer metadata only, the same prune-at-the-read discipline as the
    kNN query-vector fetch."""
    import os

    import pyarrow.parquet as pq_

    md = pq_.read_metadata(os.path.join(sf_dir, "events.parquet"))
    lo = hi = None
    for g in range(md.num_row_groups):
        rg = md.row_group(g)
        for i in range(rg.num_columns):
            c = rg.column(i)
            if c.path_in_schema == "ts" and c.statistics is not None:
                mn, mx = c.statistics.min, c.statistics.max
                lo = mn if lo is None or mn < lo else lo
                hi = mx if hi is None or mx > hi else hi
    assert lo is not None, "events.parquet has no ts statistics"
    import datetime

    epoch = datetime.date(1970, 1, 1)  # date32 epoch, timezone-free
    return (lo.date() - epoch).days, (hi.date() - epoch).days


def _day_user_flags(sf_dir: str) -> pd.DataFrame:
    """(user_id, in_first, in_last) for users active on either boundary
    day; one scan with per-batch distinct partials → groupby Max."""
    d_first, d_last = _events_day_bounds(sf_dir)

    def tag(b: pa.Table) -> pa.Table:
        day = pc.cast(pc.cast(b["ts"], pa.date32()), pa.int32())
        first = pc.equal(day, pa.scalar(d_first, pa.int32()))
        last = pc.equal(day, pa.scalar(d_last, pa.int32()))
        keep = pc.or_(first, last)
        t = pa.table(
            {"user_id": pc.array_filter(b["user_id"], keep),
             "in_first": pc.cast(pc.array_filter(first, keep), pa.int64()),
             "in_last": pc.cast(pc.array_filter(last, keep), pa.int64())}
        )
        return (
            t.group_by("user_id")
            .aggregate([("in_first", "max"), ("in_last", "max")])
            .rename_columns(["user_id", "in_first", "in_last"])
        )

    from ray.data.aggregate import Max

    return (
        _read(sf_dir, "events", ["user_id", "ts"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Max("in_first", alias_name="in_first"),
                   Max("in_last", alias_name="in_last"))
        .to_pandas()
    )


def q_users_day_intersect(sf_dir: str):
    """INTERSECT: user_ids active on BOTH the first and the last day of
    the corpus."""
    f = _day_user_flags(sf_dir)
    out = f[(f["in_first"] > 0) & (f["in_last"] > 0)][["user_id"]]
    return out.sort_values("user_id").reset_index(drop=True)


SQL_USERS_DAY_INTERSECT = """
SELECT user_id FROM events
WHERE CAST(ts AS DATE) = (SELECT min(CAST(ts AS DATE)) FROM events)
INTERSECT
SELECT user_id FROM events
WHERE CAST(ts AS DATE) = (SELECT max(CAST(ts AS DATE)) FROM events)
ORDER BY user_id
"""


def q_users_day_except(sf_dir: str):
    """EXCEPT: user_ids active on the first day but NOT the last."""
    f = _day_user_flags(sf_dir)
    out = f[(f["in_first"] > 0) & (f["in_last"] == 0)][["user_id"]]
    return out.sort_values("user_id").reset_index(drop=True)


SQL_USERS_DAY_EXCEPT = """
SELECT user_id FROM events
WHERE CAST(ts AS DATE) = (SELECT min(CAST(ts AS DATE)) FROM events)
EXCEPT
SELECT user_id FROM events
WHERE CAST(ts AS DATE) = (SELECT max(CAST(ts AS DATE)) FROM events)
ORDER BY user_id
"""


# --------------------------------------------------------------------------
# exact per-group median absolute deviation from ONE value-count histogram
# pass: both the median and the deviation median are driver arithmetic
# over the group-×-distinct-cents-sized histogram — no second scan
# --------------------------------------------------------------------------


def q_value_mad(sf_dir: str):
    """(event_type, n, mad_value): exact MAD of ``value`` per event_type
    under the explicit lower-median rule (element at rank (n+1)//2 in
    sort order — stated identically in the SQL). One distributed
    histogram pass; the |cv − med| re-ranking happens on the histogram
    itself, driver-side."""

    def partial(b: pa.Table) -> pa.Table:
        cv = pc.cast(
            pc.floor(pc.add(pc.multiply(b["value"], pa.scalar(100.0)), pa.scalar(0.5))),
            pa.int64(),
        )
        t = pa.table({"event_type": b["event_type"], "cv": cv})
        return (
            t.group_by(["event_type", "cv"])
            .aggregate([("cv", "count")])
            .rename_columns(["event_type", "cv", "p_n"])
        )

    from ray.data.aggregate import Sum

    hist = (
        _read(sf_dir, "events", ["event_type", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "cv"])
        .aggregate(Sum("p_n", alias_name="n"))
        .to_pandas()
        .sort_values(["event_type", "cv"])
    )
    rows = []
    for et, g in hist.groupby("event_type", sort=True):
        cv = g["cv"].to_numpy(np.int64)
        cnt = g["n"].to_numpy(np.int64)
        n = int(cnt.sum())
        target = (n + 1) // 2
        med = int(cv[np.searchsorted(np.cumsum(cnt), target)])
        dev = np.abs(cv - med)
        order = np.argsort(dev, kind="stable")
        mad = int(dev[order][np.searchsorted(np.cumsum(cnt[order]), target)])
        rows.append((et, n, float(round_sql(mad / 100.0, 2))))
    return pd.DataFrame(rows, columns=["event_type", "n", "mad_value"])


SQL_VALUE_MAD = """
WITH c AS (
  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS cv
  FROM events
), r AS (
  SELECT event_type, cv,
         row_number() OVER (PARTITION BY event_type ORDER BY cv) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM c
), med AS (
  SELECT event_type, cv AS mcv, n FROM r WHERE rn = (n + 1) // 2
), d AS (
  SELECT c.event_type, abs(c.cv - m.mcv) AS dev, m.n
  FROM c JOIN med m USING (event_type)
), r2 AS (
  SELECT event_type, dev, n,
         row_number() OVER (PARTITION BY event_type ORDER BY dev) AS rn
  FROM d
)
SELECT event_type, n, round(dev / 100.0, 2) AS mad_value
FROM r2 WHERE rn = (n + 1) // 2
ORDER BY event_type
"""


# --------------------------------------------------------------------------
# PIVOT / conditional aggregation: per-user event-type counts as columns.
# The pivot happens INSIDE the per-batch partial (5 filtered counts per
# row group — fixed, schema-known columns), so the shuffle carries one
# row per (user, batch) and the groupby is a plain multi-column Sum;
# no driver-side unstack of a users×types frame.
# --------------------------------------------------------------------------

_PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")


def q_user_type_pivot(sf_dir: str):
    """(user_id, n_click, n_purchase, n_search, n_view, n_visit): event
    counts per user pivoted to fixed columns (the known event-type
    vocabulary — a pivot over an unbounded column set is a design error
    at scale; this engine requires the schema up front)."""

    def partial(b: pa.Table) -> pa.Table:
        cols = {"user_id": b["user_id"]}
        for t in _PIVOT_TYPES:
            cols[f"n_{t}"] = pc.cast(
                pc.equal(b["event_type"], pa.scalar(t)), pa.int64()
            )
        return (
            pa.table(cols)
            .group_by("user_id")
            .aggregate([(f"n_{t}", "sum") for t in _PIVOT_TYPES])
            .rename_columns(["user_id"] + [f"n_{t}" for t in _PIVOT_TYPES])
        )

    from ray.data.aggregate import Sum

    out = (
        _read(sf_dir, "events", ["user_id", "event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(*[Sum(f"n_{t}", alias_name=f"n_{t}") for t in _PIVOT_TYPES])
        .to_pandas()
    )
    return out.sort_values("user_id").reset_index(drop=True)


SQL_USER_TYPE_PIVOT = """
SELECT user_id,
       count(*) FILTER (WHERE event_type = 'click')    AS n_click,
       count(*) FILTER (WHERE event_type = 'error')    AS n_error,
       count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
       count(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
       count(*) FILTER (WHERE event_type = 'view')     AS n_view
FROM events GROUP BY user_id ORDER BY user_id
"""


# --------------------------------------------------------------------------
# debounce: keep the first event of each burst (gaps-and-islands, the
# LAG-family one-bucketed-shuffle shape — same discipline as q_event_gaps)
# --------------------------------------------------------------------------

_DEBOUNCE_GAP_US = 3600 * 1_000_000  # 1 h, integer microseconds


def q_event_debounce(sf_dir: str):
    """(event_id, user_id, event_type): events that START an activity
    burst — a new island opens when the gap from the PREVIOUS event of the
    same (user, type) exceeds 1 h (or there is no previous event). One
    bucketed shuffle on (user_id, event_type); inside a bucket the gap is
    a vectorized groupby-shift diff on integer microseconds, so the
    comparison is exact at any parallelism (no float time math)."""

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["user_id", "event_type", "ts", "event_id"], kind="mergesort"
        )
        us = df["ts"].astype("int64")
        prev = us.groupby(
            [df["user_id"], df["event_type"]], sort=False
        ).shift(1)
        keep = prev.isna() | ((us - prev) > _DEBOUNCE_GAP_US)
        return df.loc[keep, ["event_id", "user_id", "event_type"]]

    out = bucketed_map_groups(
        _read(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"]),
        ["user_id", "event_type"],
        combine,
    ).to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


SQL_EVENT_DEBOUNCE = """
SELECT event_id, user_id, event_type FROM (
  SELECT event_id, user_id, event_type,
         ts - lag(ts) OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS gap
  FROM events)
WHERE gap IS NULL OR gap > INTERVAL 3600 SECOND
ORDER BY event_id
"""


# --------------------------------------------------------------------------
# longest consecutive-day streak per user (gaps-and-islands on day ordinals)
# --------------------------------------------------------------------------


def q_longest_streak(sf_dir: str):
    """(user_id, streak): the longest run of consecutive UTC calendar days
    on which the user has at least one event. Per-batch distinct
    (user, day) partials bound the shuffle by active-user-days; inside the
    user's bucket the island id is ``day_ordinal - rank`` (one vectorized
    pass), so no per-key python work anywhere."""

    def partial(b: pa.Table) -> pa.Table:
        day = pc.cast(
            pc.floor(pc.divide(pc.cast(b["ts"], pa.int64()), 86_400_000_000)),
            pa.int64(),
        )
        return (
            pa.table({"user_id": b["user_id"], "day": day})
            .group_by(["user_id", "day"])
            .aggregate([])
        )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["user_id", "day"]).sort_values(
            ["user_id", "day"], kind="mergesort"
        )
        island = df["day"] - df.groupby("user_id", sort=False).cumcount()
        runs = (
            df.assign(island=island)
            .groupby(["user_id", "island"], sort=False)
            .size()
            .reset_index(name="len")
        )
        return (
            runs.groupby("user_id", as_index=False)["len"]
            .max()
            .rename(columns={"len": "streak"})
        )

    out = bucketed_map_groups(
        _read(sf_dir, "events", ["user_id", "ts"]).map_batches(
            partial, batch_format="pyarrow"
        ),
        ["user_id"],
        combine,
    ).to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


SQL_LONGEST_STREAK = """
WITH days AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
  FROM events
), runs AS (
  SELECT user_id,
         day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS island
  FROM days)
SELECT user_id, CAST(max(cnt) AS BIGINT) AS streak FROM (
  SELECT user_id, island, count(*) AS cnt FROM runs GROUP BY user_id, island)
GROUP BY user_id ORDER BY user_id
"""


# --------------------------------------------------------------------------
# per-user Shannon entropy of the event-type distribution
# --------------------------------------------------------------------------


def q_user_event_entropy(sf_dir: str):
    """(user_id, n_events, entropy): Shannon entropy (nats) of each user's
    event-type mix. Per-batch (user, type) count partials (Arrow group_by)
    reduce the stream to ≤ |users|×|types| rows before the one bucketed
    shuffle; the entropy is computed from EXACT integer counts with floats
    only in the final -Σ p·ln p expression (mirrored by the SQL), rounded
    to 9 dp on both sides."""

    def partial(b: pa.Table) -> pa.Table:
        return (
            b.select(["user_id", "event_type"])
            .group_by(["user_id", "event_type"])
            .aggregate([([], "count_all")])
            .rename_columns(["user_id", "event_type", "p_cnt"])
        )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        cnt = (
            df.groupby(["user_id", "event_type"], as_index=False)["p_cnt"].sum()
        )
        n = cnt.groupby("user_id")["p_cnt"].transform("sum")
        p = cnt["p_cnt"] / n
        ent = (
            cnt.assign(term=-(p * np.log(p)))
            .groupby("user_id", as_index=False)
            .agg(n_events=("p_cnt", "sum"), entropy=("term", "sum"))
        )
        ent["entropy"] = round_sql(ent["entropy"], 9)
        return ent

    out = bucketed_map_groups(
        _read(sf_dir, "events", ["user_id", "event_type"]).map_batches(
            partial, batch_format="pyarrow"
        ),
        ["user_id"],
        combine,
    ).to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


SQL_USER_EVENT_ENTROPY = """
WITH c AS (
  SELECT user_id, event_type, count(*)::BIGINT AS cnt
  FROM events GROUP BY user_id, event_type
), t AS (
  SELECT user_id, cnt,
         sum(cnt) OVER (PARTITION BY user_id) AS n
  FROM c)
SELECT user_id, CAST(max(n) AS BIGINT) AS n_events,
       round(sum(-(CAST(cnt AS DOUBLE) / n) * ln(CAST(cnt AS DOUBLE) / n)), 9)
         AS entropy
FROM t GROUP BY user_id ORDER BY user_id
"""


# --------------------------------------------------------------------------
# per-user linear trend of value over time (exact integer-moment slope,
# same HUGEINT discipline as q_qty_price_corr / assortativity)
# --------------------------------------------------------------------------

def q_user_value_trend(sf_dir: str):
    """(user_id, n, slope): least-squares slope of value (cents per
    MINUTE) per user. x is the minute-ordinal difference from the
    corpus's min ts (parquet footer statistics — exact, metadata-only;
    DuckDB's date_diff('minute') counts the same minute-boundary
    crossings). Overflow discipline: the int64 per-batch moment sums are
    safe while x²·batch_size < 2^63 — with the ENFORCED batch_size=4096
    that holds for corpus time spans up to ~80 years (x ≤ 4.2e7 min);
    the driver folds python ints, and ONE final float division mirrors
    the SQL's CAST(... AS DOUBLE) exactly."""
    import pyarrow.parquet as pq_

    md = pq_.read_metadata(os.path.join(sf_dir, "events.parquet"))
    lo = None
    for gi in range(md.num_row_groups):
        rg = md.row_group(gi)
        for ci in range(rg.num_columns):
            c = rg.column(ci)
            if c.path_in_schema == "ts" and c.statistics is not None:
                mn = c.statistics.min
                lo = mn if lo is None or mn < lo else lo
    assert lo is not None, "events.parquet has no ts statistics"
    import datetime as _dt

    # timedelta arithmetic, NOT .timestamp(): the stats value is a naive
    # datetime and .timestamp() would re-interpret it in the host's local
    # timezone
    _delta = lo - _dt.datetime(1970, 1, 1)
    epoch_min = (
        _delta.days * 86_400_000_000
        + _delta.seconds * 1_000_000
        + _delta.microseconds
    ) // 60_000_000

    def partial(b: pa.Table) -> pa.Table:
        x = pc.subtract(
            pc.cast(
                pc.floor(pc.divide(pc.cast(b["ts"], pa.int64()), 60_000_000)),
                pa.int64(),
            ),
            pa.scalar(epoch_min, pa.int64()),
        )
        y = pc.cast(
            pc.floor(
                pc.add(pc.multiply(b["value"], pa.scalar(100.0)), pa.scalar(0.5))
            ),
            pa.int64(),
        )
        t = pa.table(
            {
                "user_id": b["user_id"],
                "x": x,
                "y": y,
                "xx": pc.multiply(x, x),
                "xy": pc.multiply(x, y),
            }
        )
        return (
            t.group_by("user_id")
            .aggregate(
                [("x", "count"), ("x", "sum"), ("y", "sum"),
                 ("xx", "sum"), ("xy", "sum")]
            )
            .rename_columns(["user_id", "p_n", "p_x", "p_y", "p_xx", "p_xy"])
        )

    parts = (
        _read(sf_dir, "events", ["user_id", "ts", "value"])
        # batch_size=4096 is LOAD-BEARING: it caps the per-batch int64
        # moment sums (see docstring overflow bound)
        .map_batches(partial, batch_format="pyarrow", batch_size=4096)
        .to_pandas()
    )
    for c in ("p_n", "p_x", "p_y", "p_xx", "p_xy"):
        parts[c] = parts[c].astype(object)
    g = parts.groupby("user_id", as_index=False).sum()
    rows = []
    for _, r in g.iterrows():
        n, sx, sy = int(r["p_n"]), int(r["p_x"]), int(r["p_y"])
        sxx, sxy = int(r["p_xx"]), int(r["p_xy"])
        num = n * sxy - sx * sy
        den = n * sxx - sx * sx
        slope = None if den == 0 else float(round_sql(float(num) / float(den), 9))
        rows.append((r["user_id"], n, slope))
    return (
        pd.DataFrame(rows, columns=["user_id", "n", "slope"])
        .sort_values("user_id")
        .reset_index(drop=True)
    )


SQL_USER_VALUE_TREND = """
WITH c AS (
  SELECT user_id,
         CAST(date_diff('minute', (SELECT min(ts) FROM events), ts) AS HUGEINT) AS x,
         CAST(floor(value * 100 + 0.5) AS HUGEINT) AS y
  FROM events
), s AS (
  SELECT user_id, count(*)::HUGEINT AS n,
         sum(x) AS sx, sum(y) AS sy, sum(x * x) AS sxx, sum(x * y) AS sxy
  FROM c GROUP BY user_id)
SELECT user_id, CAST(n AS BIGINT) AS n,
       CASE WHEN n * sxx - sx * sx = 0 THEN NULL
            ELSE round(CAST(n * sxy - sx * sy AS DOUBLE)
                       / CAST(n * sxx - sx * sx AS DOUBLE), 9) END AS slope
FROM s ORDER BY user_id
"""


# --------------------------------------------------------------------------
# per-user z-score normalization (grouped standardization — the feature
# scaling primitive; exact integer moments, one final float expression)
# --------------------------------------------------------------------------


def q_user_value_zscore(sf_dir: str):
    """(event_id, user_id, z): each event's value standardized against its
    user's population mean/std. Exactness: z = (n·y − Σy)/sqrt(n·Σy² − (Σy)²)
    over integer cents — both sides compute THIS integer expression and
    convert to double once, so the doubles are bit-identical (int64 is
    safe while n·Σy² < 2^63, i.e. per-user cents²·n² < 9e18 — salt or
    promote to python ints far before that)."""

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        y = np.floor(df["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        g = df.assign(y=y).groupby("user_id", sort=False)["y"]
        n = g.transform("size").to_numpy().astype(np.int64)
        sy = g.transform("sum").to_numpy().astype(np.int64)
        syy = (
            df.assign(yy=y * y)
            .groupby("user_id", sort=False)["yy"]
            .transform("sum")
            .to_numpy()
            .astype(np.int64)
        )
        den = n * syy - sy * sy
        num = n * y - sy
        with np.errstate(divide="ignore", invalid="ignore"):
            z = np.where(
                den == 0, np.nan, num.astype(np.float64) / np.sqrt(den.astype(np.float64))
            )
        out = df[["event_id", "user_id"]].copy()
        out["z"] = round_sql(z, 9)
        return out

    out = bucketed_map_groups(
        _read(sf_dir, "events", ["event_id", "user_id", "value"]),
        ["user_id"],
        combine,
    ).to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


SQL_USER_VALUE_ZSCORE = """
WITH c AS (
  SELECT event_id, user_id, CAST(floor(value * 100 + 0.5) AS BIGINT) AS y
  FROM events
), s AS (
  SELECT user_id, count(*)::BIGINT AS n, sum(y)::BIGINT AS sy,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM c GROUP BY user_id)
SELECT event_id, c.user_id,
       CASE WHEN n * syy - sy * sy = 0 THEN NULL
            ELSE round(CAST(n * c.y - sy AS DOUBLE)
                       / sqrt(CAST(n * syy - sy * sy AS DOUBLE)), 9) END AS z
FROM c JOIN s ON c.user_id = s.user_id ORDER BY event_id
"""


# --------------------------------------------------------------------------
# time-series resample with gap filling: per-day totals over the corpus's
# FULL day span (zero rows for silent days) — the spine comes from parquet
# footer statistics, metadata-only, never a scan
# --------------------------------------------------------------------------


def q_daily_totals_filled(sf_dir: str):
    """(day, n, total): per-UTC-day event count and value total (cents
    summed exactly, ONE final /100), with every day of [min_day, max_day]
    present — silent days emit (day, 0, 0.0). The day spine is derived
    from parquet ts statistics (footer-only, the prune-at-the-read
    discipline); the aggregate is per-batch partials → days-sized
    groupby. Day keys are date32 ints (no timezone, no float time)."""
    from ray.data.aggregate import Sum

    d_first, d_last = _events_day_bounds(sf_dir)

    def partial(b: pa.Table) -> pa.Table:
        day = pc.cast(pc.cast(b["ts"], pa.date32()), pa.int32())
        cents = pc.cast(
            pc.floor(pc.add(pc.multiply(b["value"], pa.scalar(100.0)), pa.scalar(0.5))),
            pa.int64(),
        )
        return (
            pa.table({"day": day, "p_c": cents})
            .group_by("day")
            .aggregate([("p_c", "sum"), ("p_c", "count")])
            .rename_columns(["day", "p_cents", "p_n"])
        )

    got = (
        _read(sf_dir, "events", ["ts", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("p_cents", alias_name="cents"), Sum("p_n", alias_name="n"))
        .to_pandas()
    )
    spine = pd.DataFrame({"day": np.arange(d_first, d_last + 1, dtype=np.int64)})
    out = spine.merge(got.astype({"day": "int64"}), on="day", how="left")
    out["n"] = out["n"].fillna(0).astype("int64")
    out["total"] = round_sql(out["cents"].fillna(0) / 100.0, 2)
    return out[["day", "n", "total"]].sort_values("day").reset_index(drop=True)


SQL_DAILY_TOTALS_FILLED = """
WITH b AS (
  SELECT CAST(min(ts) AS DATE) AS lo, CAST(max(ts) AS DATE) AS hi FROM events
), spine AS (
  SELECT CAST(date_diff('day', DATE '1970-01-01', d) AS BIGINT) AS day
  FROM (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS d FROM b)
), agg AS (
  SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS day,
         count(*) AS n,
         sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS cents
  FROM events GROUP BY 1
)
SELECT spine.day, COALESCE(agg.n, 0) AS n,
       round(COALESCE(agg.cents, 0) / 100.0, 2) AS total
FROM spine LEFT JOIN agg USING (day) ORDER BY spine.day
"""


# --------------------------------------------------------------------------
# last-touch attribution: each purchase attributed to the user's most
# recent click within 7 days (grouped as-of join, exact integer time)
# --------------------------------------------------------------------------

_ATTR_WINDOW_US = 7 * 86_400 * 1_000_000


def q_click_attribution(sf_dir: str):
    """(purchase_id, user_id, click_id): every purchase event joined to
    the user's LAST preceding click within 7 days (click_id null when
    none) — the grouped as-of join marketing attribution runs at scale.
    One bucketed shuffle on user_id; inside the bucket the as-of is a
    vectorized sort + forward-fill over the (ts, event_id) total order,
    all comparisons in exact integer microseconds."""

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        us = df["ts"].astype("int64")
        is_click = df["event_type"].eq("click")
        last_click_id = (
            df["event_id"].where(is_click).groupby(df["user_id"], sort=False).ffill()
        )
        last_click_ts = us.where(is_click).groupby(df["user_id"], sort=False).ffill()
        purchases = df["event_type"].eq("purchase")
        out = df.loc[purchases, ["event_id", "user_id"]].rename(
            columns={"event_id": "purchase_id"}
        )
        ok = last_click_ts[purchases] >= (us[purchases] - _ATTR_WINDOW_US)
        click = last_click_id[purchases].where(ok)
        out["click_id"] = click.astype("float64")  # null-able (oracle parity)
        return out

    out = bucketed_map_groups(
        _read(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"]),
        ["user_id"],
        combine,
    ).to_pandas()
    return out.sort_values("purchase_id").reset_index(drop=True)


SQL_CLICK_ATTRIBUTION = """
SELECT p.event_id AS purchase_id, p.user_id,
       CAST((
         SELECT c.event_id FROM events c
         WHERE c.user_id = p.user_id AND c.event_type = 'click'
           AND (c.ts < p.ts OR (c.ts = p.ts AND c.event_id < p.event_id))
           AND c.ts >= p.ts - INTERVAL 7 DAY
         ORDER BY c.ts DESC, c.event_id DESC LIMIT 1
       ) AS DOUBLE) AS click_id
FROM events p WHERE p.event_type = 'purchase'
ORDER BY purchase_id
"""


# --------------------------------------------------------------------------
# per-group trimmed mean (robust-statistics completion of the histogram
# family: median / MAD / p90 → 10-90% trimmed mean, same ONE histogram)
# --------------------------------------------------------------------------


def q_trimmed_mean(sf_dir: str):
    """(event_type, n_kept, trimmed_mean): mean of values inside the
    discrete [p10, p90] band per event_type — bounds by the explicit
    integer rank rule (element at ceil(q·n) in cv order, the same
    double-free form as q_value_p90), the mean from exact integer-cent
    sums over the SAME distributed histogram (no second data pass), one
    final float division mirrored by the SQL."""

    def partial(b: pa.Table) -> pa.Table:
        cv = pc.cast(
            pc.floor(pc.add(pc.multiply(b["value"], pa.scalar(100.0)), pa.scalar(0.5))),
            pa.int64(),
        )
        t = pa.table({"event_type": b["event_type"], "cv": cv})
        return (
            t.group_by(["event_type", "cv"])
            .aggregate([("cv", "count")])
            .rename_columns(["event_type", "cv", "p_n"])
        )

    from ray.data.aggregate import Sum

    hist = (
        _read(sf_dir, "events", ["event_type", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "cv"])
        .aggregate(Sum("p_n", alias_name="n"))
        .to_pandas()
        .sort_values(["event_type", "cv"])
    )
    rows = []
    for et, g in hist.groupby("event_type", sort=True):
        n = int(g["n"].sum())
        cum = g["n"].cumsum().to_numpy()
        cvs = g["cv"].to_numpy()
        lo = int(cvs[np.searchsorted(cum, (n + 9) // 10)])
        hi = int(cvs[np.searchsorted(cum, (9 * n + 9) // 10)])
        band = (cvs >= lo) & (cvs <= hi)
        cnt = int(g["n"].to_numpy()[band].sum())
        s = int((cvs[band] * g["n"].to_numpy()[band]).sum())
        rows.append((et, cnt, round(float(s) / cnt / 100.0, 6)))
    return pd.DataFrame(rows, columns=["event_type", "n_kept", "trimmed_mean"])


SQL_TRIMMED_MEAN = """
WITH c AS (
  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS cv FROM events
), h AS (
  SELECT event_type, cv, count(*) AS n FROM c GROUP BY event_type, cv
), r AS (
  SELECT event_type, cv, n,
         sum(n) OVER (PARTITION BY event_type ORDER BY cv) AS cum,
         sum(n) OVER (PARTITION BY event_type) AS tot
  FROM h
), b AS (
  SELECT event_type,
         min(CASE WHEN cum >= (tot + 9) // 10 THEN cv END) AS lo,
         min(CASE WHEN cum >= (9 * tot + 9) // 10 THEN cv END) AS hi
  FROM r GROUP BY event_type
)
SELECT c.event_type, count(*) AS n_kept,
       round(CAST(sum(c.cv) AS DOUBLE) / count(*) / 100.0, 6) AS trimmed_mean
FROM c JOIN b ON c.event_type = b.event_type
WHERE c.cv BETWEEN b.lo AND b.hi
GROUP BY c.event_type ORDER BY c.event_type
"""


# --------------------------------------------------------------------------
# conversion-delay statistics: the attribution join composed with the
# exact-histogram family (median + mean of click→purchase latency)
# --------------------------------------------------------------------------


def q_attribution_delay(sf_dir: str):
    """(n_attributed, median_delay_s, mean_delay_s): over every purchase
    with an attributed click (q_click_attribution semantics), the
    click→purchase latency in WHOLE SECONDS — exact distributed
    histogram (delay, count) partials → driver median by the explicit
    ceil(n/2) integer rank rule + mean from exact integer sums, one
    float division each. The delay histogram is bounded by the 7-day
    window at second granularity (≤ 604 800 rows) at ANY corpus size."""

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        us = df["ts"].astype("int64")
        is_click = df["event_type"].eq("click")
        last_click_ts = us.where(is_click).groupby(df["user_id"], sort=False).ffill()
        purchases = df["event_type"].eq("purchase")
        delay_us = us[purchases] - last_click_ts[purchases]
        ok = delay_us <= _ATTR_WINDOW_US
        d = (delay_us[ok] // 1_000_000).astype("int64")
        out = pd.DataFrame({"delay_s": d})
        return out.groupby("delay_s", as_index=False).size().rename(
            columns={"size": "p_n"}
        )

    hist = (
        bucketed_map_groups(
            _read(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"]),
            ["user_id"],
            combine,
        )
        .to_pandas()
        .groupby("delay_s", as_index=False)["p_n"]
        .sum()
        .sort_values("delay_s")
    )
    n = int(hist["p_n"].sum())
    if n == 0:
        return pd.DataFrame(
            {"n_attributed": [0], "median_delay_s": [None], "mean_delay_s": [None]}
        )
    cum = hist["p_n"].cumsum().to_numpy()
    med = int(hist["delay_s"].to_numpy()[np.searchsorted(cum, (n + 1) // 2)])
    total = int((hist["delay_s"].astype(object) * hist["p_n"].astype(object)).sum())
    return pd.DataFrame(
        {
            "n_attributed": [n],
            "median_delay_s": [med],
            "mean_delay_s": [round(float(total) / n, 6)],
        }
    )


SQL_ATTRIBUTION_DELAY = """
WITH d AS (
  SELECT CAST(floor(date_diff('microsecond', (
           SELECT c.ts FROM events c
           WHERE c.user_id = p.user_id AND c.event_type = 'click'
             AND (c.ts < p.ts OR (c.ts = p.ts AND c.event_id < p.event_id))
             AND c.ts >= p.ts - INTERVAL 7 DAY
           ORDER BY c.ts DESC, c.event_id DESC LIMIT 1
         ), p.ts) / 1000000) AS BIGINT) AS delay_s
  FROM events p WHERE p.event_type = 'purchase'
), v AS (SELECT delay_s FROM d WHERE delay_s IS NOT NULL),
h AS (
  SELECT delay_s, count(*) AS n FROM v GROUP BY delay_s
), r AS (
  SELECT delay_s, n,
         sum(n) OVER (ORDER BY delay_s) AS cum,
         sum(n) OVER () AS tot
  FROM h
)
SELECT CAST(max(tot) AS BIGINT) AS n_attributed,
       CAST(min(CASE WHEN cum >= (tot + 1) // 2 THEN delay_s END) AS BIGINT)
         AS median_delay_s,
       round(CAST((SELECT sum(delay_s) FROM v) AS DOUBLE) / max(tot), 6)
         AS mean_delay_s
FROM r
"""
