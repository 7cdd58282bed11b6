"""Analytics operators (SURVEY §2.5 joins/lookups, §2.6 aggregations,
§2.7 sorts/limits/dedup) rebuilt Ray-Data-first over the testdata tables.

Each ``q_*`` mirrors a reference operator (citations inline) and has an ANSI
SQL oracle in ORACLE_SQL with IDENTICAL output column names. Top-k queries
always carry a unique tie-break key so the selected set is deterministic.

Scale notes honored throughout: reads prune columns; per-batch functions are
vectorized Arrow/pandas; wide aggregates pre-combine inside map_batches
before the (small) groupby shuffle; small join sides broadcast once via
ray.put; only genuinely small results are materialized.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..stages.join import broadcast_join, copartition_join


def _read(sf_dir: str, table: str, columns=None):
    import ray.data

    return ray.data.read_parquet(
        os.path.join(sf_dir, f"{table}.parquet"), columns=columns
    )


def _one_row(**cols) -> pa.Table:
    return pa.Table.from_pydict({k: [v] for k, v in cols.items()})


# ---------------------------------------------------------------------------
# §2.6 aggregations
# ---------------------------------------------------------------------------


def q_count_lineitem(sf_dir: str):
    """A1 global count (reference: count_documents,
    trials_extractor/storage/mongodb_storage.py:337)."""
    n = _read(sf_dir, "lineitem", ["l_orderkey"]).count()
    return _one_row(n=n)


def q_orders_by_priority(sf_dir: str):
    """A2 group-by + count + sort desc (reference: $group/$sum/$sort phase
    histogram, trials_extractor/storage/mongodb_storage.py:348-358)."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "orders", ["o_orderpriority"])
    out = ds.groupby("o_orderpriority").aggregate(Count(alias_name="n"))
    return out.sort("n", descending=True)


def q_top10_users_by_events(sf_dir: str):
    """A3 unwind+group+count+top-10 (st_trial_analytics.py:219-230), with
    deterministic (n desc, user_id asc) tie-break."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "events", ["user_id"])
    out = ds.groupby("user_id").aggregate(Count(alias_name="n"))
    return out.sort(["n", "user_id"], descending=[True, False]).limit(10)


def q_distinct_mktsegments(sf_dir: str):
    """A4/A6 distinct count (st_trial_analytics.py:233-243, 392-409)."""
    vals = _read(sf_dir, "customer", ["c_mktsegment"]).unique("c_mktsegment")
    return _one_row(n_segments=len(vals))


def q_orders_by_month(sf_dir: str):
    """A7 time-bucketed count (month) + sort asc
    (st_trial_analytics.py:346-370): truncate inside map_batches, then a
    small groupby."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "orders", ["o_orderdate"])

    def to_month(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [pc.strftime(t["o_orderdate"], format="%Y-%m")], names=["month"]
        )

    out = ds.map_batches(to_month, batch_format="pyarrow")
    return out.groupby("month").aggregate(Count(alias_name="n")).sort("month")


def q_pricing_summary(sf_dir: str):
    """A10/A15 multi-agg per group with partial pre-aggregation: per-batch
    combine (vectorized) BEFORE the groupby shuffle, so the exchange carries
    one row per (group, batch) instead of every row — the Mongo
    partial+final $sum analog (st_trial_analytics.py:431-454)."""
    from ray.data.aggregate import Sum

    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(t: pa.Table) -> pa.Table:
        # exact fixed-point: prices/discounts have 2 decimals, so cents and
        # 1e-4-dollar units are exact int64 — integer sums are identical at
        # ANY parallelism / summation order (no FP drift to round away)
        base_c = pc.cast(pc.round(pc.multiply(t["l_extendedprice"], 100.0)), pa.int64())
        disc_pct = pc.cast(pc.round(pc.multiply(t["l_discount"], 100.0)), pa.int64())
        disc_e4 = pc.multiply(base_c, pc.subtract(pa.scalar(100, pa.int64()), disc_pct))
        qty = pc.cast(t["l_quantity"], pa.int64())
        df = pa.Table.from_arrays(
            [t["l_returnflag"], t["l_linestatus"], qty, base_c, disc_e4],
            names=["l_returnflag", "l_linestatus", "qty", "base_c", "disc_e4"],
        ).to_pandas()
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("qty", "sum"),
            sum_base=("base_c", "sum"),
            sum_disc_price=("disc_e4", "sum"),
            n=("qty", "size"),
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    out = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty", alias_name="sum_qty"),
        Sum("sum_base", alias_name="sum_base"),
        Sum("sum_disc_price", alias_name="sum_disc_price"),
        Sum("n", alias_name="n"),
    )

    def finalize(t: pa.Table) -> pa.Table:
        avg_qty = pc.round(
            pc.divide(pc.cast(t["sum_qty"], pa.float64()),
                      pc.cast(t["n"], pa.float64())),
            ndigits=6,
        )
        t = t.append_column("avg_qty", avg_qty).set_column(
            t.column_names.index("n"), "n", t["n"].cast(pa.int64())
        )
        t = t.set_column(
            t.column_names.index("sum_qty"), "sum_qty",
            pc.cast(t["sum_qty"], pa.float64()),
        )
        t = t.set_column(
            t.column_names.index("sum_base"), "sum_base",
            pc.divide(pc.cast(t["sum_base"], pa.float64()), 100.0),
        )
        t = t.set_column(
            t.column_names.index("sum_disc_price"), "sum_disc_price",
            pc.divide(pc.cast(t["sum_disc_price"], pa.float64()), 10000.0),
        )
        return t

    return out.map_batches(finalize, batch_format="pyarrow").sort(
        ["l_returnflag", "l_linestatus"]
    )


def q_value_buckets(sf_dir: str):
    """A13 completeness-style bucketing: vectorized category column then
    count (st_trial_analytics.py:2259-2286)."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "orders", ["o_totalprice"])

    def bucketize(t: pa.Table) -> pa.Table:
        p = t["o_totalprice"]
        cat = pc.if_else(
            pc.less(p, 50_000.0),
            "low",
            pc.if_else(pc.less(p, 150_000.0), "mid", "high"),
        )
        return pa.Table.from_arrays([cat], names=["bucket"])

    out = ds.map_batches(bucketize, batch_format="pyarrow")
    return out.groupby("bucket").aggregate(Count(alias_name="n")).sort("bucket")


def q_monthly_rolling3(sf_dir: str):
    """A14 rolling mean (window=3) over the monthly series
    (st_trial_analytics.py:1200). The grouped series is tiny (#months), so
    the window runs on the materialized aggregate — ordering-sensitive by
    design."""
    months = q_orders_by_month(sf_dir).to_pandas().sort_values("month")
    months["rolling3"] = months["n"].rolling(3, min_periods=1).mean()
    return months.reset_index(drop=True)


# ---------------------------------------------------------------------------
# §2.7 sorts / limits / pagination / distinct / dedup / union
# ---------------------------------------------------------------------------


def q_top20_customers_by_balance(sf_dir: str):
    """K1 sort desc + limit k (Mongo $sort/$limit, storage:355,369-370);
    unique key c_custkey is the tie-break."""
    ds = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal"])
    return ds.sort(["c_acctbal", "c_custkey"], descending=[True, False]).limit(20)


def q_orders_page(sf_dir: str):
    """K5 pagination: skip 100, limit 50, ordered by unique key
    (st_trial_analytics.py:334-338)."""
    ds = _read(
        sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_totalprice"]
    ).sort("o_orderkey").limit(150)
    _, page = ds.split_at_indices([100])
    return page


def q_distinct_event_types(sf_dir: str):
    """K7 distinct values (pandas .unique, st:2071)."""
    vals = sorted(_read(sf_dir, "events", ["event_type"]).unique("event_type"))
    return pa.Table.from_pydict({"event_type": vals})


def q_dedup_documents_exact(sf_dir: str):
    """K6 exact keyed dedup, the reference's only dedup (unique index on the
    document key, trials_extractor/storage/mongodb_storage.py:87-92):
    group by content, keep the min doc_id as the canonical survivor.
    Pre-combines per batch before the shuffle."""
    from ray.data.aggregate import Min

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("text", as_index=False).agg(doc_id=("doc_id", "min"))

    partials = ds.map_batches(partial, batch_format="pandas")
    out = partials.groupby("text").aggregate(Min("doc_id", alias_name="doc_id"))
    return out.map_batches(
        lambda t: t.set_column(
            t.column_names.index("doc_id"), "doc_id", t["doc_id"].cast(pa.int64())
        ),
        batch_format="pyarrow",
    )


def q_union_order_halves(sf_dir: str):
    """K8 union of per-source results (utils/batch_utils.py:44-65)."""
    cols = ["o_orderkey", "o_totalprice"]
    low = _read(sf_dir, "orders", cols).filter(
        expr="o_totalprice < 100000.0"
    )
    high = _read(sf_dir, "orders", cols).filter(
        expr="o_totalprice >= 100000.0"
    )
    return low.union(high)


# ---------------------------------------------------------------------------
# §2.5 joins / lookups / filter-scans
# ---------------------------------------------------------------------------


def q_customer_lookup(sf_dir: str):
    """J1 point lookup by key (find_one,
    trials_extractor/storage/mongodb_storage.py:247-265)."""
    ds = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_mktsegment"])
    return ds.map_batches(
        lambda t: t.filter(pc.equal(t["c_custkey"], 42)), batch_format="pyarrow"
    )


def q_events_error_scan(sf_dir: str):
    """J3 regex filter-scan ($regex,
    trials_extractor/storage/mongodb_storage.py:293-322): vectorized
    pc.match_substring_regex inside map_batches."""
    ds = _read(sf_dir, "events", ["event_id", "event_type", "props"])

    def f(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.equal(t["event_type"], "error"),
            pc.match_substring_regex(t["props"], '"k": 1[0-9]\\b'),
        )
        return t.filter(m)

    return ds.map_batches(f, batch_format="pyarrow")


def q_orders_filtered_page(sf_dir: str):
    """J5 conjunctive multi-filter + pagination
    (st_trial_analytics.py:291-344)."""
    ds = _read(
        sf_dir, "orders", ["o_orderkey", "o_orderstatus", "o_orderdate", "o_totalprice"]
    )

    def f(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(
                pc.equal(t["o_orderstatus"], "O"),
                pc.greater_equal(
                    t["o_orderdate"], pa.scalar(pd.Timestamp("1996-01-01"))
                ),
            ),
            pc.greater(t["o_totalprice"], 150_000.0),
        )
        return t.filter(m)

    return ds.map_batches(f, batch_format="pyarrow").sort("o_orderkey").limit(25)


def q_part_multisearch(sf_dir: str):
    """J8 multi-column contains OR-search (st_trial_analytics.py:2120-2136)."""
    ds = _read(sf_dir, "part", ["p_partkey", "p_name", "p_brand", "p_type"])

    def f(t: pa.Table) -> pa.Table:
        m = pc.or_(
            pc.or_(
                pc.match_substring(t["p_name"], "green"),
                pc.match_substring(t["p_type"], "BRASS"),
            ),
            pc.match_substring(t["p_brand"], "#3"),
        )
        return t.filter(m)

    return ds.map_batches(f, batch_format="pyarrow")


def q_customer_nation_region(sf_dir: str):
    """J6 broadcast join: dimension tables shipped once via ray.put
    (reference's broadcast-dict country canonicalization,
    trials_extractor/processors/normalizer.py:134-176)."""
    import pyarrow.parquet as pq

    nation = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_name", "n_regionkey"]
    ).to_pandas()
    region = pq.read_table(
        os.path.join(sf_dir, "region.parquet"), columns=["r_regionkey", "r_name"]
    ).to_pandas()
    dim = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")[
        ["n_nationkey", "n_name", "r_name"]
    ].rename(columns={"n_nationkey": "c_nationkey"})

    ds = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_nationkey"])
    out = broadcast_join(ds, dim, on="c_nationkey")
    return out.map_batches(
        lambda df: df[["c_custkey", "c_name", "n_name", "r_name"]],
        batch_format="pandas",
    )


def q_revenue_by_priority(sf_dir: str):
    """J7 generalization — large-large FK join (orders ⋈ lineitem) via the
    explicit co-partitioned hash join, then pre-aggregated revenue rollup."""
    from ray.data.aggregate import Sum

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    lineitem = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"]
    )

    def revenue(t: pa.Table) -> pa.Table:
        # exact int64 fixed-point (1e-4 dollars): parallelism-order-proof sums
        base_c = pc.cast(pc.round(pc.multiply(t["l_extendedprice"], 100.0)), pa.int64())
        disc_pct = pc.cast(pc.round(pc.multiply(t["l_discount"], 100.0)), pa.int64())
        rev = pc.multiply(base_c, pc.subtract(pa.scalar(100, pa.int64()), disc_pct))
        return pa.Table.from_arrays([t["l_orderkey"], rev], names=["o_orderkey", "rev"])

    li = lineitem.map_batches(revenue, batch_format="pyarrow")
    joined = copartition_join(orders, li, on="o_orderkey", num_buckets=16)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("o_orderpriority", as_index=False).agg(revenue=("rev", "sum"))

    partials = joined.map_batches(partial, batch_format="pandas")
    out = (
        partials.groupby("o_orderpriority")
        .aggregate(Sum("revenue", alias_name="revenue"))
        .sort("o_orderpriority")
    )
    return out.map_batches(
        lambda t: t.set_column(
            t.column_names.index("revenue"), "revenue",
            pc.divide(pc.cast(t["revenue"], pa.float64()), 10000.0),
        ),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# §2.3 cleaners / normalizers / dates, §2.4 validators
# ---------------------------------------------------------------------------


def q_clean_text_documents(sf_dir: str):
    """C1/N1 clean_text: collapse whitespace + trim, vectorized
    (trials_extractor/processors/cleaner.py:10-35, normalizer.py:14-32)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def clean(t: pa.Table) -> pa.Table:
        s = pc.replace_substring_regex(t["text"], pattern=r"\s+", replacement=" ")
        s = pc.utf8_trim_whitespace(s)
        return pa.Table.from_arrays([t["doc_id"], s], names=["doc_id", "cleaned_text"])

    return ds.map_batches(clean, batch_format="pyarrow")


def q_normalize_numbers(sf_dir: str):
    """N2 normalize_number: digit extraction + cast
    (trials_extractor/processors/normalizer.py:34-64) over the props JSON."""
    ds = _read(sf_dir, "events", ["event_id", "props"])

    def f(t: pa.Table) -> pa.Table:
        digits = pc.extract_regex(t["props"], pattern=r"(?P<k>\d+)")
        k = pc.cast(pc.struct_field(digits, "k"), pa.int64())
        return pa.Table.from_arrays([t["event_id"], k], names=["event_id", "k"])

    return ds.map_batches(f, batch_format="pyarrow")


def q_normalize_list_split(sf_dir: str):
    """N3 normalize_list: delimiter split + element count
    (trials_extractor/processors/normalizer.py:66-85)."""
    ds = _read(sf_dir, "part", ["p_partkey", "p_type"])

    def f(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["p_type"], " ")
        n = pc.cast(pc.list_value_length(toks), pa.int64())
        first = pc.list_element(toks, 0)
        return pa.Table.from_arrays(
            [t["p_partkey"], n, first], names=["p_partkey", "n_tokens", "first_token"]
        )

    return ds.map_batches(f, batch_format="pyarrow")


def q_order_dates(sf_dir: str):
    """D3 extract_year + D4 calculate_duration + D2 boolean vocab
    (trials_extractor/utils/date_utils.py:50-120)."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderstatus"])
    end = pa.scalar(pd.Timestamp("1998-12-31"), pa.timestamp("us"))

    def f(t: pa.Table) -> pa.Table:
        year = pc.cast(pc.year(t["o_orderdate"]), pa.int64())
        days = pc.cast(pc.days_between(t["o_orderdate"], end), pa.int64())
        is_open = pc.equal(t["o_orderstatus"], "O")
        return pa.Table.from_arrays(
            [t["o_orderkey"], year, days, is_open],
            names=["o_orderkey", "order_year", "days_to_eoy", "is_open"],
        )

    return ds.map_batches(f, batch_format="pyarrow")


def q_null_metrics_events(sf_dir: str):
    """V1 required-fields presence metrics: per-batch null counts reduced to
    one row (trials_extractor/processors/validator.py:36-76 re-expressed as
    per-partition data-quality metrics)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["event_type", "value", "props"])

    def partial(t: pa.Table) -> pa.Table:
        return _one_row(
            null_event_type=t["event_type"].null_count,
            null_value=t["value"].null_count,
            null_props=t["props"].null_count,
            rows=t.num_rows,
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    out = partials.groupby(None).aggregate(
        Sum("null_event_type", alias_name="null_event_type"),
        Sum("null_value", alias_name="null_value"),
        Sum("null_props", alias_name="null_props"),
        Sum("rows", alias_name="rows"),
    )
    return out.map_batches(
        lambda t: pa.Table.from_pydict(
            {c: t[c].cast(pa.int64()) for c in t.column_names}
        ),
        batch_format="pyarrow",
    )


def q_date_coherence(sf_dir: str):
    """V2 date coherence start<=end (validator.py:78-105) + V3 cross-table
    consistency as a semi-join: lineitems shipped before their order date."""
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])
    lineitem = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    li = lineitem.map_batches(
        lambda t: pa.Table.from_arrays(
            [t["l_orderkey"], t["l_shipdate"]], names=["o_orderkey", "l_shipdate"]
        ),
        batch_format="pyarrow",
    )
    joined = copartition_join(orders, li, on="o_orderkey", num_buckets=16)

    def check(df: pd.DataFrame) -> pd.DataFrame:
        viol = int((df["l_shipdate"] < df["o_orderdate"]).sum())
        return pd.DataFrame({"violations": [viol], "rows": [len(df)]})

    from ray.data.aggregate import Sum

    partials = joined.map_batches(check, batch_format="pandas")
    out = partials.groupby(None).aggregate(
        Sum("violations", alias_name="violations"), Sum("rows", alias_name="rows")
    )
    return out.map_batches(
        lambda t: pa.Table.from_pydict(
            {c: t[c].cast(pa.int64()) for c in t.column_names}
        ),
        batch_format="pyarrow",
    )


def q_explode_part_tokens(sf_dir: str):
    """E9/A11/J7 explode: unnest a derived list column, children stamped
    with the parent key (st_trial_analytics.py:1749-1778;
    trials_extractor/exporters/csv_exporter.py:73-248)."""
    from ..stages.explode import explode_list_column

    ds = _read(sf_dir, "part", ["p_partkey", "p_type"])

    def ex(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["p_type"], " ")
        return explode_list_column(
            t.set_column(t.column_names.index("p_type"), "p_type", toks),
            "p_type",
            keep=["p_partkey"],
            value_name="token",
        )

    return ds.map_batches(ex, batch_format="pyarrow")


def q_top_tokens(sf_dir: str):
    """A3 unwind + group + count + top-10 over the exploded tokens."""
    from ray.data.aggregate import Count

    ds = q_explode_part_tokens(sf_dir)
    out = ds.groupby("token").aggregate(Count(alias_name="n"))
    return out.sort(["n", "token"], descending=[True, False]).limit(10)


def q_priority_regex_struct(sf_dir: str):
    """N4 normalize_age_range analog: regex → typed struct fields
    (trials_extractor/processors/normalizer.py:87-115). Splits
    '1-URGENT' into (prio_num int, prio_name str), vectorized via
    pc.extract_regex."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])

    def f(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(
            t["o_orderpriority"], pattern=r"^(?P<num>\d+)-(?P<name>.+)$"
        )
        num = pc.cast(pc.struct_field(m, "num"), pa.int64())
        name = pc.struct_field(m, "name")
        return pa.Table.from_arrays(
            [t["o_orderkey"], num, name],
            names=["o_orderkey", "prio_num", "prio_name"],
        )

    return ds.map_batches(f, batch_format="pyarrow")


_EVENT_VOCAB = {
    "click": "engagement",
    "view": "engagement",
    "purchase": "conversion",
    "signup": "conversion",
    "error": "fault",
}


def q_canonical_event_types(sf_dir: str):
    """N5/N6 vocab canonicalization: case-insensitive small-side dict
    lookup broadcast into every batch (normalizer.py:117-213 — the
    broadcast-join degenerate case, J6), then a tiny groupby."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "events", ["event_type"])
    keys = pa.array(list(_EVENT_VOCAB))
    vals = pa.array(list(_EVENT_VOCAB.values()) + ["other"])

    def f(t: pa.Table) -> pa.Table:
        # Arrow-native dict lookup: index_in against the vocab keys, misses
        # fall through to the trailing "other" slot — zero-copy path, no
        # pandas conversion
        idx = pc.index_in(pc.utf8_lower(t["event_type"]), value_set=keys)
        cat = vals.take(pc.fill_null(idx, len(keys)))
        return pa.table({"category": cat})

    out = ds.map_batches(f, batch_format="pyarrow")
    return (
        out.groupby("category")
        .aggregate(Count(alias_name="n"))
        .sort("category")
    )


def q_user_span_days(sf_dir: str):
    """D4 calculate_duration per group (trials_extractor/utils/
    date_utils.py:96-120): min/max event ts per user → span in days."""
    from ray.data.aggregate import Max, Min

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    agg = ds.groupby("user_id").aggregate(
        Min("ts", alias_name="first_ts"), Max("ts", alias_name="last_ts")
    )

    def f(t: pa.Table) -> pa.Table:
        span = pc.cast(pc.days_between(t["first_ts"], t["last_ts"]), pa.int64())
        return pa.Table.from_arrays(
            [t["user_id"], span], names=["user_id", "span_days"]
        )

    return agg.map_batches(f, batch_format="pyarrow")


def q_segment_word_top20(sf_dir: str):
    """A11 double-unwind (st_trial_analytics.py:475-535: countries × sites
    → contact rows): documents → segments → words, each level carrying the
    parent doc_id FK (J7), then top-20 word counts (A3)."""
    from ray.data.aggregate import Count

    from ..stages.explode import explode_list_column

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def ex(t: pa.Table) -> pa.Table:
        segs = pc.split_pattern(t["text"], "value")
        lvl1 = explode_list_column(
            t.set_column(t.column_names.index("text"), "text", segs),
            "text",
            keep=["doc_id"],
            value_name="segment",
        )
        words = pc.split_pattern(lvl1["segment"], " ")
        lvl2 = explode_list_column(
            lvl1.set_column(1, "segment", words),
            "segment",
            keep=["doc_id"],
            value_name="word",
        )
        return lvl2.filter(pc.not_equal(lvl2["word"], ""))

    exploded = ds.map_batches(ex, batch_format="pyarrow")
    out = exploded.groupby("word").aggregate(Count(alias_name="n"))
    return out.sort(["n", "word"], descending=[True, False]).limit(20)


def q_docs_containing_the(sf_dir: str):
    """J2 list-contains filter (find({"locations.countries.country": c}),
    trials_extractor/storage/mongodb_storage.py:267-291): docs whose token
    list contains 'the', via explode + filter + distinct count."""
    from ..stages.explode import explode_list_column

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def ex(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"], " ")
        lvl = explode_list_column(
            t.set_column(t.column_names.index("text"), "text", toks),
            "text",
            keep=["doc_id"],
            value_name="token",
        )
        hit = lvl.filter(pc.equal(lvl["token"], "the"))
        # per-batch distinct before the global unique: shrink the exchange
        return hit.group_by("doc_id").aggregate([])

    matched = ds.map_batches(ex, batch_format="pyarrow")
    return _one_row(n_docs=len(matched.unique("doc_id")))


def q_autocomplete_part_names(sf_dir: str):
    """J4 prefix autocomplete: prefix filter + projection + limit 20
    (st_trial_analytics.py:465-473), made deterministic with a full sort
    key before the limit."""
    ds = _read(sf_dir, "part", ["p_partkey", "p_name"])
    hits = ds.map_batches(
        lambda t: t.filter(pc.starts_with(t["p_name"], "s")),
        batch_format="pyarrow",
    )
    return hits.sort(["p_name", "p_partkey"]).limit(20)


def q_standardize_keys(sf_dir: str):
    """C5 standardize_keys (trials_extractor/processors/cleaner.py:127-153):
    schema-level column-name normalization done ONCE via rename_columns,
    not per row — drop the TPC-H prefix, lowercase."""
    import re

    ds = _read(sf_dir, "nation")
    mapping = {
        c: re.sub(r"^[a-z]{1,2}_", "", c.lower()) for c in ds.schema().names
    }
    return ds.rename_columns(mapping)


def q_customers_with_orders(sf_dir: str):
    """V3 ⊆ / semi-join (validator.py:107-149's 'summary countries ⊆
    detailed countries' generalized): customers having ≥1 order. Right side
    is reduced to distinct keys per batch before the single hash exchange."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    orders = _read(sf_dir, "orders", ["o_custkey"]).rename_columns(
        {"o_custkey": "c_custkey"}
    )
    return copartition_join(cust, orders, on="c_custkey", how="semi")


def q_customers_no_urgent_orders(sf_dir: str):
    """Anti-join: customers with no URGENT order (referential-gap check —
    the complement of the V3 consistency invariant). The build side is
    filtered at the read, then key-distinct per batch, before the exchange."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])
    urgent = orders.map_batches(
        lambda t: t.filter(
            pc.equal(t["o_orderpriority"], "1-URGENT")
        ).select(["o_custkey"]),
        batch_format="pyarrow",
    ).rename_columns({"o_custkey": "c_custkey"})
    return copartition_join(cust, urgent, on="c_custkey", how="anti")


def q_event_type_value_agg(sf_dir: str):
    """A10 multi-agg per group with cast ($unwind → $group {count, $sum
    $toInt}, st_trial_analytics.py:431-454): count + sum(floor(value)) per
    event_type, pre-aggregated inside map_batches so the exchange carries
    one row per (batch × type)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        et = pc.coalesce(t["event_type"], pa.scalar("(none)"))
        iv = pc.cast(pc.floor(t["value"]), pa.int64())
        g = pa.Table.from_arrays([et, iv], names=["event_type", "iv"])
        return (
            g.group_by("event_type")
            .aggregate([("iv", "count"), ("iv", "sum")])
            .rename_columns(["event_type", "n_part", "sum_part"])
        )

    parts = ds.map_batches(partial, batch_format="pyarrow")
    out = parts.groupby("event_type").aggregate(
        Sum("n_part", alias_name="n"), Sum("sum_part", alias_name="sum_value")
    )
    return out.sort("event_type")


def q_completeness_buckets(sf_dir: str):
    """A13 completeness bucketing (st_trial_analytics.py:2259-2286: 4
    boolean-mask category counts): classify events rows by which optional
    fields are present, count per category."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["event_type", "value", "props"])

    def partial(t: pa.Table) -> pa.Table:
        has_v = pc.is_valid(t["value"]).to_numpy(zero_copy_only=False)
        has_p = pc.is_valid(t["props"]).to_numpy(zero_copy_only=False)
        cats = np.array(["empty", "props_only", "value_only", "full"])
        cat = cats[has_v.astype(np.int8) * 2 + has_p.astype(np.int8)]
        g = pa.Table.from_arrays([pa.array(cat)], names=["category"])
        return (
            g.group_by("category")
            .aggregate([("category", "count")])
            .rename_columns(["category", "n_part"])
        )

    parts = ds.map_batches(partial, batch_format="pyarrow")
    out = parts.groupby("category").aggregate(Sum("n_part", alias_name="n"))
    return out.sort("category")


def q_top3_orders_per_priority(sf_dir: str):
    """Group-wise top-k (window-rank analog of K1's global top-k): top-3
    orders by price per priority. Each batch pre-trims to its local top-3
    per group BEFORE the shuffle, so the exchange carries ≤ 3·groups rows
    per batch instead of the table — the partial-top-k pattern that keeps
    group-wise ranking shuffle-light at scale."""
    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_orderkey", "o_totalprice"])

    def pretrim(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["o_orderpriority", "o_totalprice", "o_orderkey"],
            ascending=[True, False, True],
        )
        return df.groupby("o_orderpriority").head(3)

    trimmed = ds.map_batches(pretrim, batch_format="pandas")

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True])
        return g.head(3)

    return trimmed.groupby("o_orderpriority").map_groups(final, batch_format="pandas")


SESSION_GAP_S = 1800


def q_user_sessions(sf_dir: str):
    """Gap-based sessionization (training-data pipeline staple; the windowed
    generalization of A14's ordering-sensitive ops): per user, events sorted
    by time split into sessions at gaps > 30 min. One hash shuffle on
    user_id; the per-group kernel is vectorized numpy (sort + diff), not a
    Python loop over events."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id"])

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        ts = np.sort(g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64))
        gaps = np.diff(ts) > SESSION_GAP_S * 1_000_000
        return pd.DataFrame(
            {
                "user_id": [g["user_id"].iloc[0]],
                "n_events": [len(ts)],
                "n_sessions": [1 + int(gaps.sum())],
            }
        )

    return ds.groupby("user_id").map_groups(sessions, batch_format="pandas")


def q_order_last_event_asof(sf_dir: str):
    """Distributed AS-OF join (an operator Ray Data lacks — the canonical
    custom-operator case): for each event whose user id is also an orders
    customer id, the latest order placed at or before the event. One hash
    exchange per side on the equality key + per-bucket sorted merge_asof
    (stages/join.py copartition_asof_join); DuckDB's native ASOF JOIN is
    the oracle. The matched value is the order DATE (not the key): ties on
    (custkey, date) would make the picked row engine-dependent, the date is
    deterministic. Registered beyond the driver window, oracle-checked in
    pytest."""
    from ..stages.join import copartition_asof_join

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def to_ts(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t["o_custkey"], pc.cast(t["o_orderdate"], pa.timestamp("us"))],
            names=["o_custkey", "order_ts"],
        )

    orders = orders.map_batches(to_ts, batch_format="pyarrow")
    events = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    out = copartition_asof_join(
        events, orders,
        left_by="user_id", right_by="o_custkey",
        left_on="ts", right_on="order_ts",
    )

    def proj(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t["event_id"], t["user_id"], t["order_ts"]],
            names=["event_id", "user_id", "last_order_ts"],
        )

    return out.map_batches(proj, batch_format="pyarrow")


def q_order_followups_window(sf_dir: str):
    """Distributed RANGE join (equality key + interval predicate — the
    other custom-operator case named alongside as-of): per order, how many
    LATER orders the same customer placed within 30 days. Self join
    co-partitioned on o_custkey, interval filter per joined batch, then a
    pre-combined count (stages/join.py copartition_range_join). Registered
    beyond the driver window, oracle-checked in pytest."""
    from ray.data.aggregate import Sum

    from ..stages.join import copartition_range_join

    def side(prefix: str):
        ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

        def prep(t: pa.Table) -> pa.Table:
            # timestamps, not date32: the per-batch interval arithmetic
            # stays vectorized datetime64 after the pandas conversion
            return pa.Table.from_arrays(
                [t["o_orderkey"], t["o_custkey"],
                 pc.cast(t["o_orderdate"], pa.timestamp("us"))],
                names=[f"{prefix}orderkey", "o_custkey", f"{prefix}ts"],
            )

        return ds.map_batches(prep, batch_format="pyarrow")

    a, b = side("a_"), side("b_")

    def in_window(df: pd.DataFrame):
        d0 = df["a_ts"]
        d1 = df["b_ts"]
        return (
            (d1 > d0)
            | ((d1 == d0) & (df["b_orderkey"] != df["a_orderkey"]))
        ) & (d1 <= d0 + pd.Timedelta(days=30))

    pairs = copartition_range_join(a, b, on="o_custkey", condition=in_window)

    def precount(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("a_orderkey", as_index=False).agg(
            n_followups=("b_orderkey", "size")
        )
        return g.rename(columns={"a_orderkey": "o_orderkey"})

    partials = pairs.map_batches(precount, batch_format="pandas")
    out = partials.groupby("o_orderkey").aggregate(
        Sum("n_followups", alias_name="n_followups")
    )
    return out.map_batches(
        lambda t: t.set_column(
            t.column_names.index("n_followups"), "n_followups",
            t["n_followups"].cast(pa.int64()),
        ),
        batch_format="pyarrow",
    )


def q_quantiles_by_lang(sf_dir: str):
    """Distributed grouped quantiles (p50/p90/p99 of n_chars per lang) via a
    mergeable value-count histogram: per-batch value_counts partials (the
    exchange carries (group × distinct value per batch) rows — NOT the raw
    rows), then ONE groupby shuffle whose per-group finalize collapses
    duplicate values and reconstructs the quantile from cumulative counts.
    Exact for integer domains at any parallelism; at 100 TB the exchange is
    bounded by group-cardinality × value-cardinality × blocks, and a
    continuous domain drops in as fixed-width bins (approximate) with the
    same plumbing. Quantile rule pinned to DuckDB ``quantile_disc``:
    element at rank ceil(q·n). Reference's aggregate forms analog:
    st_trial_analytics.py partial+final $sum shapes."""
    import os as _os

    import ray.data

    ds = ray.data.read_parquet(
        _os.path.join(sf_dir, "documents.parquet"), columns=["lang", "n_chars"]
    )

    def precombine(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.value_counts(["lang", "n_chars"]).reset_index(name="cnt")
        )

    partials = ds.map_batches(precombine, batch_format="pandas")

    def quantiles_group(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:  # typed empty keeps block schemas uniform
            return pd.DataFrame(
                {"lang": pd.Series([], dtype=object),
                 **{c: pd.Series([], dtype="int64")
                    for c in ("n", "p50", "p90", "p99")}}
            )
        lang = g["lang"].iloc[0]
        h = g.groupby("n_chars", as_index=False)["cnt"].sum().sort_values("n_chars")
        c = h["cnt"].to_numpy().cumsum()
        vals = h["n_chars"].to_numpy()
        n = int(c[-1])

        def qd(q: float) -> int:
            rank = max(int(np.ceil(q * n)), 1)
            return int(vals[np.searchsorted(c, rank)])

        return pd.DataFrame(
            {"lang": [lang], "n": [n],
             "p50": [qd(0.5)], "p90": [qd(0.9)], "p99": [qd(0.99)]}
        )

    return partials.groupby("lang").map_groups(quantiles_group, batch_format="pandas")


def q_approx_quantiles_lang(sf_dir: str, rel_err: float = 0.01):
    """Approximate grouped quantiles via the log-binned quantile sketch
    (stages/sketch.approx_quantiles_by) — the SCALE companion to the exact
    ``quantiles_by_lang``: the exact path's exchange grows with
    distinct-value cardinality, the sketch's is O(groups × ~700 bins) no
    matter how wide the domain, with a deterministic ≤ rel_err relative
    error (fixed bins, order-invariant merges — unlike KLL/t-digest).
    Rows-only by design (approximate); the error bound and
    parallelism-invariance are pytest-pinned against DuckDB exact
    quantiles (test_quantile_sketch.py)."""
    import os as _os

    import ray.data

    from ..stages.sketch import approx_quantiles_by

    ds = ray.data.read_parquet(
        _os.path.join(sf_dir, "documents.parquet"), columns=["lang", "n_chars"]
    )
    return approx_quantiles_by(
        ds, "lang", "n_chars", qs=(0.5, 0.9, 0.99), rel_err=rel_err
    )


def q_approx_distinct_lang(sf_dir: str):
    """Grouped HyperLogLog distinct (stages/sketch.approx_distinct_by):
    approx distinct texts per lang — one 4 KiB register row per
    (batch, key) partial, merged per key in one view-sized groupby; the
    exchange is independent of row count. Rows-only by design (±1.6% at
    p=12); determinism/merge/accuracy are pytest-pinned in
    test_round2b."""
    import os as _os

    import ray.data

    from ..stages.sketch import approx_distinct_by

    ds = ray.data.read_parquet(
        _os.path.join(sf_dir, "documents.parquet"), columns=["lang", "text"]
    )
    return approx_distinct_by(ds, "lang", "text")


def q_stratified_sample(sf_dir: str, k: int = 10):
    """Deterministic stratified sampling: k docs per lang, ranked by
    (md5(text), doc_id) — a content-hash order, so the sample is stable
    across runs/parallelism and unbiased w.r.t. ingestion order (the
    standard reproducible-subsample trick in training-data pipelines).

    Scale shape: per-batch PARTIAL top-k per group before the exchange
    (each batch ships ≤ k rows per lang present in it), then one small
    groupby final top-k. Never sorts the corpus."""
    import os as _os

    import ray.data

    from ..stages.text import md5_exact

    ds = ray.data.read_parquet(
        _os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "lang", "text"]
    ).map_batches(md5_exact, batch_format="pyarrow")

    def partial_topk(t: pa.Table) -> pa.Table:
        df = t.select(["lang", "doc_id", "text_md5"]).to_pandas()
        df = df.sort_values(["lang", "text_md5", "doc_id"], kind="mergesort")
        return pa.Table.from_pandas(
            df.groupby("lang", as_index=False).head(k), preserve_index=False
        )

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["text_md5", "doc_id"], kind="mergesort").head(k)
        return g[["lang", "doc_id"]]

    return (
        ds.map_batches(partial_topk, batch_format="pyarrow")
        .groupby("lang")
        .map_groups(final_topk, batch_format="pandas")
    )


QUERIES = {
    "count_lineitem": q_count_lineitem,
    "quantiles_by_lang": q_quantiles_by_lang,
    "approx_quantiles_lang": q_approx_quantiles_lang,
    "approx_distinct_lang": q_approx_distinct_lang,
    "stratified_sample": q_stratified_sample,
    "order_last_event_asof": q_order_last_event_asof,
    "order_followups_window": q_order_followups_window,
    "user_sessions": q_user_sessions,
    "top3_orders_per_priority": q_top3_orders_per_priority,
    "customers_with_orders": q_customers_with_orders,
    "customers_no_urgent_orders": q_customers_no_urgent_orders,
    "event_type_value_agg": q_event_type_value_agg,
    "completeness_buckets": q_completeness_buckets,
    "priority_regex_struct": q_priority_regex_struct,
    "canonical_event_types": q_canonical_event_types,
    "user_span_days": q_user_span_days,
    "segment_word_top20": q_segment_word_top20,
    "docs_containing_the": q_docs_containing_the,
    "autocomplete_part_names": q_autocomplete_part_names,
    "standardize_keys": q_standardize_keys,
    "explode_part_tokens": q_explode_part_tokens,
    "top_tokens": q_top_tokens,
    "orders_by_priority": q_orders_by_priority,
    "top10_users_by_events": q_top10_users_by_events,
    "distinct_mktsegments": q_distinct_mktsegments,
    "orders_by_month": q_orders_by_month,
    "pricing_summary": q_pricing_summary,
    "value_buckets": q_value_buckets,
    "monthly_rolling3": q_monthly_rolling3,
    "top20_customers_by_balance": q_top20_customers_by_balance,
    "orders_page": q_orders_page,
    "distinct_event_types": q_distinct_event_types,
    "dedup_documents_exact": q_dedup_documents_exact,
    "union_order_halves": q_union_order_halves,
    "customer_lookup": q_customer_lookup,
    "events_error_scan": q_events_error_scan,
    "orders_filtered_page": q_orders_filtered_page,
    "part_multisearch": q_part_multisearch,
    "customer_nation_region": q_customer_nation_region,
    "revenue_by_priority": q_revenue_by_priority,
    "clean_text_documents": q_clean_text_documents,
    "normalize_numbers": q_normalize_numbers,
    "normalize_list_split": q_normalize_list_split,
    "order_dates": q_order_dates,
    "null_metrics_events": q_null_metrics_events,
    "date_coherence": q_date_coherence,
}

ORACLE_SQL = {
    "count_lineitem": "SELECT COUNT(*) AS n FROM lineitem",
    "quantiles_by_lang": (
        "SELECT lang, CAST(count(*) AS BIGINT) AS n, "
        "quantile_disc(n_chars, 0.5) AS p50, "
        "quantile_disc(n_chars, 0.9) AS p90, "
        "quantile_disc(n_chars, 0.99) AS p99 "
        "FROM documents GROUP BY lang"
    ),
    "stratified_sample": (
        "SELECT lang, doc_id FROM ("
        "SELECT lang, doc_id, row_number() OVER ("
        "PARTITION BY lang ORDER BY md5(coalesce(text, '')), doc_id) AS rn "
        "FROM documents) WHERE rn <= 10"
    ),
    "order_last_event_asof": (
        "SELECT e.event_id, e.user_id, "
        "CAST(o.o_orderdate AS TIMESTAMP) AS last_order_ts "
        "FROM events e ASOF JOIN orders o "
        "ON e.user_id = o.o_custkey AND CAST(o.o_orderdate AS TIMESTAMP) <= e.ts"
    ),
    "order_followups_window": (
        "SELECT a.o_orderkey, COUNT(*) AS n_followups "
        "FROM orders a JOIN orders b ON a.o_custkey = b.o_custkey "
        "AND (b.o_orderdate > a.o_orderdate OR "
        "(b.o_orderdate = a.o_orderdate AND b.o_orderkey <> a.o_orderkey)) "
        "AND b.o_orderdate <= a.o_orderdate + INTERVAL 30 DAY "
        "GROUP BY a.o_orderkey"
    ),
    "explode_part_tokens": (
        "SELECT p_partkey, unnest(string_split(p_type, ' ')) AS token FROM part"
    ),
    "top_tokens": (
        "WITH t AS (SELECT unnest(string_split(p_type, ' ')) AS token FROM part) "
        "SELECT token, COUNT(*) AS n FROM t GROUP BY token "
        "ORDER BY n DESC, token LIMIT 10"
    ),
    "orders_by_priority": (
        "SELECT o_orderpriority, COUNT(*) AS n FROM orders "
        "GROUP BY o_orderpriority ORDER BY n DESC"
    ),
    "top10_users_by_events": (
        "SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id "
        "ORDER BY n DESC, user_id LIMIT 10"
    ),
    "distinct_mktsegments": (
        "SELECT COUNT(DISTINCT c_mktsegment) AS n_segments FROM customer"
    ),
    "orders_by_month": (
        "SELECT strftime(o_orderdate, '%Y-%m') AS month, COUNT(*) AS n "
        "FROM orders GROUP BY month ORDER BY month"
    ),
    "pricing_summary": (
        "SELECT l_returnflag, l_linestatus, "
        "CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sum_qty, "
        "CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)"
        " / 100.0 AS sum_base, "
        "CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT) * "
        "(100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE)"
        " / 10000.0 AS sum_disc_price, "
        "COUNT(*) AS n, "
        "round(CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*), 6)"
        " AS avg_qty "
        "FROM lineitem GROUP BY l_returnflag, l_linestatus "
        "ORDER BY l_returnflag, l_linestatus"
    ),
    "value_buckets": (
        "SELECT CASE WHEN o_totalprice < 50000 THEN 'low' "
        "WHEN o_totalprice < 150000 THEN 'mid' ELSE 'high' END AS bucket, "
        "COUNT(*) AS n FROM orders GROUP BY bucket ORDER BY bucket"
    ),
    "monthly_rolling3": (
        "WITH m AS (SELECT strftime(o_orderdate, '%Y-%m') AS month, "
        "COUNT(*) AS n FROM orders GROUP BY month) "
        "SELECT month, n, AVG(n) OVER (ORDER BY month "
        "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS rolling3 FROM m"
    ),
    "top20_customers_by_balance": (
        "SELECT c_custkey, c_name, c_acctbal FROM customer "
        "ORDER BY c_acctbal DESC, c_custkey LIMIT 20"
    ),
    "orders_page": (
        "SELECT o_orderkey, o_orderdate, o_totalprice FROM orders "
        "ORDER BY o_orderkey LIMIT 50 OFFSET 100"
    ),
    "distinct_event_types": (
        "SELECT DISTINCT event_type FROM events ORDER BY event_type"
    ),
    "dedup_documents_exact": (
        "SELECT text, MIN(doc_id) AS doc_id FROM documents GROUP BY text"
    ),
    "union_order_halves": (
        "SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice < 100000 "
        "UNION ALL "
        "SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice >= 100000"
    ),
    "customer_lookup": (
        "SELECT c_custkey, c_name, c_mktsegment FROM customer WHERE c_custkey = 42"
    ),
    "events_error_scan": (
        "SELECT event_id, event_type, props FROM events "
        "WHERE event_type = 'error' AND regexp_matches(props, '\"k\": 1[0-9]\\b')"
    ),
    "orders_filtered_page": (
        "SELECT o_orderkey, o_orderstatus, o_orderdate, o_totalprice FROM orders "
        "WHERE o_orderstatus = 'O' AND o_orderdate >= TIMESTAMP '1996-01-01' "
        "AND o_totalprice > 150000 ORDER BY o_orderkey LIMIT 25"
    ),
    "part_multisearch": (
        "SELECT p_partkey, p_name, p_brand, p_type FROM part "
        "WHERE p_name LIKE '%green%' OR p_type LIKE '%BRASS%' OR p_brand LIKE '%#3%'"
    ),
    "customer_nation_region": (
        "SELECT c_custkey, c_name, n_name, r_name FROM customer "
        "JOIN nation ON c_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey"
    ),
    "revenue_by_priority": (
        "SELECT o_orderpriority, "
        "CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT) * "
        "(100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE)"
        " / 10000.0 AS revenue "
        "FROM orders JOIN lineitem ON o_orderkey = l_orderkey "
        "GROUP BY o_orderpriority ORDER BY o_orderpriority"
    ),
    "clean_text_documents": (
        "SELECT doc_id, trim(regexp_replace(text, '\\s+', ' ', 'g')) AS cleaned_text "
        "FROM documents"
    ),
    "normalize_numbers": (
        "SELECT event_id, CAST(regexp_extract(props, '(\\d+)', 1) AS BIGINT) AS k "
        "FROM events"
    ),
    "normalize_list_split": (
        "SELECT p_partkey, CAST(len(string_split(p_type, ' ')) AS BIGINT) AS n_tokens, "
        "string_split(p_type, ' ')[1] AS first_token FROM part"
    ),
    "order_dates": (
        "SELECT o_orderkey, CAST(year(o_orderdate) AS BIGINT) AS order_year, "
        "date_diff('day', o_orderdate, TIMESTAMP '1998-12-31') AS days_to_eoy, "
        "o_orderstatus = 'O' AS is_open FROM orders"
    ),
    "null_metrics_events": (
        "SELECT COUNT(*) FILTER (event_type IS NULL) AS null_event_type, "
        "COUNT(*) FILTER (value IS NULL) AS null_value, "
        "COUNT(*) FILTER (props IS NULL) AS null_props, COUNT(*) AS rows "
        "FROM events"
    ),
    "date_coherence": (
        "SELECT COUNT(*) FILTER (l_shipdate < o_orderdate) AS violations, "
        "COUNT(*) AS rows FROM orders JOIN lineitem ON o_orderkey = l_orderkey"
    ),
    "priority_regex_struct": (
        "SELECT o_orderkey, "
        "CAST(regexp_extract(o_orderpriority, '^(\\d+)-(.+)$', 1) AS BIGINT) "
        "AS prio_num, "
        "regexp_extract(o_orderpriority, '^(\\d+)-(.+)$', 2) AS prio_name "
        "FROM orders"
    ),
    "canonical_event_types": (
        "SELECT CASE WHEN lower(event_type) IN ('click', 'view') "
        "THEN 'engagement' "
        "WHEN lower(event_type) IN ('purchase', 'signup') THEN 'conversion' "
        "WHEN lower(event_type) = 'error' THEN 'fault' ELSE 'other' END "
        "AS category, COUNT(*) AS n FROM events GROUP BY category "
        "ORDER BY category"
    ),
    "user_span_days": (
        "SELECT user_id, date_diff('day', MIN(ts), MAX(ts)) AS span_days "
        "FROM events GROUP BY user_id"
    ),
    "segment_word_top20": (
        "WITH s AS (SELECT doc_id, unnest(string_split(text, 'value')) "
        "AS segment FROM documents), "
        "w AS (SELECT doc_id, unnest(string_split(segment, ' ')) AS word "
        "FROM s) "
        "SELECT word, COUNT(*) AS n FROM w WHERE word <> '' "
        "GROUP BY word ORDER BY n DESC, word LIMIT 20"
    ),
    "docs_containing_the": (
        "SELECT COUNT(*) AS n_docs FROM documents "
        "WHERE list_contains(string_split(text, ' '), 'the')"
    ),
    "autocomplete_part_names": (
        "SELECT p_partkey, p_name FROM part WHERE p_name LIKE 's%' "
        "ORDER BY p_name, p_partkey LIMIT 20"
    ),
    "standardize_keys": (
        "SELECT n_nationkey AS nationkey, n_name AS name, "
        "n_regionkey AS regionkey FROM nation"
    ),
    "top3_orders_per_priority": (
        "SELECT o_orderpriority, o_orderkey, o_totalprice FROM ("
        "SELECT o_orderpriority, o_orderkey, o_totalprice, row_number() OVER ("
        "PARTITION BY o_orderpriority "
        "ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders) "
        "WHERE rn <= 3"
    ),
    "user_sessions": (
        "WITH d AS (SELECT user_id, ts, "
        "date_diff('second', lag(ts) OVER (PARTITION BY user_id ORDER BY ts), ts)"
        " AS gap_s FROM events) "
        "SELECT user_id, COUNT(*) AS n_events, "
        "CAST(1 + COUNT(*) FILTER (gap_s > 1800) AS BIGINT) AS n_sessions "
        "FROM d GROUP BY user_id"
    ),
    "customers_with_orders": (
        "SELECT c_custkey, c_name FROM customer "
        "WHERE c_custkey IN (SELECT o_custkey FROM orders)"
    ),
    "customers_no_urgent_orders": (
        "SELECT c_custkey, c_name FROM customer WHERE c_custkey NOT IN "
        "(SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')"
    ),
    "event_type_value_agg": (
        "SELECT COALESCE(event_type, '(none)') AS event_type, "
        "COUNT(value) AS n, "
        "CAST(SUM(CAST(floor(value) AS BIGINT)) AS BIGINT) AS sum_value "
        "FROM events GROUP BY 1 ORDER BY 1"
    ),
    "completeness_buckets": (
        "SELECT CASE WHEN value IS NOT NULL AND props IS NOT NULL THEN 'full' "
        "WHEN value IS NOT NULL THEN 'value_only' "
        "WHEN props IS NOT NULL THEN 'props_only' ELSE 'empty' END AS category, "
        "COUNT(*) AS n FROM events GROUP BY category ORDER BY category"
    ),
}
