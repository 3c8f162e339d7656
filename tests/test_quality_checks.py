"""Data-quality validation suite (operators/quality_checks.py).

Oracle parity for all three queries runs in test_oracle_parity / the driver
gate; these pin the *semantic invariants* of the checks themselves: the
metric battery reads the table once, constraints report real violations on
a corrupted relation, and the FK audit counts exactly the injected orphans.
"""

from __future__ import annotations

from serene_spark.operators.quality_checks import (
    FK_EDGES,
    LINEITEM_CONSTRAINTS,
    dq_constraints_sql,
    dq_fk_orphans_sql,
    dq_metrics_sql,
)
from serene_spark.functions.sqlgen import SPARK
from serene_spark.registry import load_all

SF = "/root/testdata/sf0.001"


def test_dq_metrics_one_scan_and_sane(spark):
    q = load_all()["dq_metrics_orders"]
    rows = {r["col_name"]: r for r in q.spark(spark, SF).collect()}
    assert set(rows) == {"o_orderkey", "o_custkey", "o_orderstatus",
                        "o_totalprice", "o_orderdate", "o_orderpriority"}
    # primary key: fully complete and fully distinct
    pk = rows["o_orderkey"]
    assert pk["completeness"] == 1.0 and pk["distinctness"] == 1.0
    assert pk["n_distinct"] == pk["n_rows"]
    # low-cardinality enum: distinctness near zero, n_distinct tiny
    st = rows["o_orderstatus"]
    assert st["n_distinct"] <= 5 and st["distinctness"] < 0.01
    # ONE scan for the whole battery: the melt+histogram cascade reads the
    # table exactly once (a UNION-of-agg-CTE shape would scan per column)
    plan = q.spark(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1


def test_dq_constraints_clean_corpus_passes(spark):
    q = load_all()["dq_constraints_lineitem"]
    rows = {r["constraint_name"]: r for r in q.spark(spark, SF).collect()}
    assert set(rows) == {name for name, _ in LINEITEM_CONSTRAINTS}
    # the synthetic corpus satisfies the physical-sanity constraints
    for name in ("quantity_positive", "discount_unit_interval",
                 "shipdate_complete"):
        assert rows[name]["violations"] == 0 and rows[name]["passed"] == 1
    n = {r["n_rows"] for r in rows.values()}
    assert len(n) == 1  # every constraint saw the same single scan
    plan = q.spark(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1


def test_dq_constraints_detect_corruption(spark):
    """Corrupt a copy of lineitem and assert the suite counts the exact
    violation totals — the checks measure, not just pass."""
    df = spark.read.parquet(f"{SF}/lineitem.parquet")
    from pyspark.sql import functions as F

    bad = df.withColumn(
        "l_quantity",
        F.when(F.col("l_linenumber") == 1, -F.col("l_quantity")).otherwise(F.col("l_quantity")),
    ).withColumn(
        "l_discount",
        F.when(F.col("l_linenumber") == 2, F.lit(1.5)).otherwise(F.col("l_discount")),
    )
    bad.createOrReplaceTempView("lineitem")
    rows = {r["constraint_name"]: r for r in spark.sql(dq_constraints_sql(SPARK)).collect()}
    n1 = df.filter("l_linenumber = 1").count()
    n2 = df.filter("l_linenumber = 2").count()
    assert rows["quantity_positive"]["violations"] == n1
    assert rows["discount_unit_interval"]["violations"] == n2
    assert rows["quantity_positive"]["passed"] == 0
    spark.catalog.dropTempView("lineitem")


def test_dq_fk_orphans_clean_and_injected(spark):
    q = load_all()["dq_fk_orphans"]
    rows = {r["constraint_name"]: r["orphans"] for r in q.spark(spark, SF).collect()}
    assert set(rows) == {name for name, *_ in FK_EDGES}
    assert all(v == 0 for v in rows.values())  # driver data is referentially intact

    # inject orphans: shift 10 customer FKs far out of the parent key range
    from pyspark.sql import functions as F

    for name, child, fk, parent, pk in FK_EDGES:
        spark.read.parquet(f"{SF}/{child}.parquet").createOrReplaceTempView(child)
        spark.read.parquet(f"{SF}/{parent}.parquet").createOrReplaceTempView(parent)
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    broken = orders.withColumn(
        "o_custkey",
        F.when(F.col("o_orderkey") % 100 == 0, F.col("o_custkey") + 10_000_000)
        .otherwise(F.col("o_custkey")),
    )
    broken.createOrReplaceTempView("orders")
    n_broken = broken.filter("o_orderkey % 100 = 0").count()
    rows2 = {r["constraint_name"]: r["orphans"]
             for r in spark.sql(dq_fk_orphans_sql(SPARK)).collect()}
    assert rows2["orders_custkey_fk"] == n_broken
    assert rows2["lineitem_partkey_fk"] == 0
    for name, child, fk, parent, pk in FK_EDGES:
        spark.catalog.dropTempView(child)
        spark.catalog.dropTempView(parent)


def test_dq_fk_dimension_joins_broadcast_and_one_scan_per_child(spark):
    """Dimension-parent FK checks must plan as broadcast joins (no shuffle
    of the child for a tiny parent), and each child table is scanned once
    for ALL its FK edges — lineitem's three edges share one scan."""
    q = load_all()["dq_fk_orphans"]
    plan = q.spark(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    import re

    lineitem_scans = len(re.findall(r"FileScan parquet[^\n]*lineitem\.parquet", plan))
    assert lineitem_scans == 1, plan
    # ...and that one scan is pruned to exactly the three FK columns
    m = re.search(r"FileScan parquet \[([^\]]*)\][^\n]*lineitem\.parquet", plan)
    read_cols = {c.split("#")[0] for c in m.group(1).split(",")}
    assert read_cols == {"l_orderkey", "l_partkey", "l_suppkey"}


def test_k_anonymity_pandas_recheck(spark, sf_dir):
    """Class sizes, diversity, flags, and the row-level exposure share
    recomputed independently with pandas."""
    import numpy as np

    from serene_spark.catalog import load_table
    from serene_spark.operators.quality_checks import KANON_K, LDIV_L
    from serene_spark.registry import load_all

    out = load_all()["k_anonymity_audit"].spark(spark, sf_dir).toPandas()
    cu = load_table(spark, sf_dir, "customer").toPandas()
    cu["bal"] = cu["c_acctbal"].round(2)
    cu["band"] = np.floor(cu["bal"] / 1000).astype(int)
    g = (
        cu.groupby(["c_nationkey", "c_mktsegment", "band"])
        .agg(size=("c_custkey", "size"), nsens=("bal", "nunique"))
        .reset_index()
    )
    assert len(out) == len(g)
    ref = {
        (r["c_nationkey"], r["c_mktsegment"], r["band"]): (r["size"], r["nsens"])
        for _, r in g.iterrows()
    }
    for _, r in out.iterrows():
        size, nsens = ref[(r["nation"], r["segment"], r["balance_band"])]
        assert r["class_size"] == size
        assert r["n_sensitive"] == nsens
        assert r["k_anonymous"] == int(size >= KANON_K)
        assert r["l_diverse"] == int(nsens >= LDIV_L)
    below = g[g["size"] < KANON_K]["size"].sum()
    assert abs(out["frac_rows_below_k"].iloc[0] - round(below / len(cu), 6)) < 1e-9
    assert out["min_class_size"].iloc[0] == g["size"].min()
    # row conservation: class sizes cover every customer exactly once
    assert int(out["class_size"].sum()) == len(cu)
    # this corpus's banded balances are nearly unique -> the audit must
    # report heavy exposure, which is the correct (and useful) reading
    assert out["frac_rows_below_k"].iloc[0] > 0.9


def test_k_anonymity_flags_on_constructed_classes(spark):
    """A fixture with one large diverse class, one large uniform class,
    and one singleton must produce exactly the right flag matrix."""
    import os
    import tempfile

    import pandas as pd

    from serene_spark.functions.sqlgen import SPARK as SPARK_D
    from serene_spark.operators.quality_checks import k_anonymity_sql

    rows = []
    cid = 0
    # class A: nation 1 / seg X / band 0 — size 10, all-distinct balances
    for i in range(10):
        rows.append((cid := cid + 1, "c", 1, 100.0 + i, "X"))
    # class B: nation 2 / seg Y / band 0 — size 8, single balance value
    for _ in range(8):
        rows.append((cid := cid + 1, "c", 2, 500.0, "Y"))
    # class C: nation 3 / seg Z — singleton
    rows.append((cid := cid + 1, "c", 3, 900.0, "Z"))
    df = pd.DataFrame(
        rows, columns=["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]
    )
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(df).write.parquet(os.path.join(d, "customer.parquet"))
        from serene_spark.catalog import register_views

        register_views(spark, d, ("customer",))
        out = spark.sql(k_anonymity_sql(SPARK_D)).toPandas()
    by = out.set_index("nation")
    assert by.loc[1, "k_anonymous"] == 1 and by.loc[1, "l_diverse"] == 1
    assert by.loc[2, "k_anonymous"] == 1 and by.loc[2, "l_diverse"] == 0  # uniform leaks
    assert by.loc[3, "k_anonymous"] == 0  # singleton re-identifies
    assert abs(out["frac_rows_below_k"].iloc[0] - round(1 / 19, 6)) < 1e-9
    assert out["min_class_size"].iloc[0] == 1


def test_duplicate_payments_fixture_and_clean_corpus(spark, sf_dir):
    """The synthetic ledger carries no duplicate payments at any SF (the
    clean-audit reading — verified empty, like dedup_embedding_cosine's
    threshold-gated emptiness); semantics are pinned on a constructed
    ledger with an in-window duplicate, an out-of-window repeat, and a
    same-day different-amount near-miss."""
    import datetime
    import os
    import tempfile

    import pandas as pd

    from serene_spark.functions.sqlgen import SPARK as SPARK_D
    from serene_spark.operators.quality_checks import duplicate_payments_sql
    from serene_spark.registry import load_all

    assert load_all()["duplicate_payments"].spark(spark, sf_dir).count() == 0

    t0 = datetime.datetime(2022, 3, 1)
    rows = [
        # cust 1: exact duplicate 3 days apart -> flagged
        (101, 1, t0, 250.00),
        (102, 1, t0 + datetime.timedelta(days=3), 250.00),
        # cust 1: same amount again 40 days later -> NOT flagged vs 101/102
        (103, 1, t0 + datetime.timedelta(days=40), 250.00),
        # cust 2: same day, different amounts -> not flagged
        (201, 2, t0, 100.00),
        (202, 2, t0, 100.01),
        # cust 3: same amount, different customers -> never joined
        (301, 3, t0, 250.00),
        # cust 4: triple within window -> all 3 pairs flagged
        (401, 4, t0, 75.50),
        (402, 4, t0 + datetime.timedelta(days=1), 75.50),
        (403, 4, t0 + datetime.timedelta(days=2), 75.50),
    ]
    df = pd.DataFrame(
        rows, columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]
    )
    spark.createDataFrame(df).createOrReplaceTempView("orders")
    out = spark.sql(duplicate_payments_sql(SPARK_D)).toPandas()
    spark.catalog.dropTempView("orders")
    pairs = set(zip(out["orderkey_1"], out["orderkey_2"]))
    assert pairs == {(101, 102), (401, 402), (401, 403), (402, 403)}
    assert (out["gap_days"] <= 7).all()
    g = out[out["orderkey_1"] == 101].iloc[0]
    assert g["gap_days"] == 3 and g["custkey"] == 1 and g["amount"] == 250.00


def test_dq_cross_table_pandas_recheck_and_injection(spark, sf_dir):
    """Cross-table audit recomputed in pandas on the real corpus (which
    honestly fails reconciliation), plus an injected orphan-order /
    consistent-ledger fixture pinning the clean path."""
    import datetime
    import os
    import tempfile

    import pandas as pd

    from serene_spark.catalog import load_table
    from serene_spark.functions.sqlgen import SPARK as SPARK_D
    from serene_spark.operators.quality_checks import dq_cross_table_sql
    from serene_spark.registry import load_all

    [r] = load_all()["dq_cross_table"].spark(spark, sf_dir).collect()
    od = load_table(spark, sf_dir, "orders").toPandas()
    li = load_table(spark, sf_dir, "lineitem").toPandas()
    od["day"] = (od["o_orderdate"].astype("int64") // 10**9) // 86400
    li["sday"] = (li["l_shipdate"].astype("int64") // 10**9) // 86400
    per = li.groupby("l_orderkey").agg(
        total=("l_extendedprice", lambda s: s.round(2).sum()),
        first_ship=("sday", "min"),
        n=("l_orderkey", "size"),
    )
    j = od.join(per, on="o_orderkey")
    assert r["n_orders"] == len(od)
    assert r["n_orders_no_lines"] == int(j["n"].isna().sum())
    have = j[j["n"].notna()]
    assert r["n_ship_before_order"] == int((have["first_ship"] < have["day"]).sum())
    gaps = (have["o_totalprice"].round(2) - have["total"]).abs()
    assert r["n_total_mismatch"] == int((gaps >= 0.01).sum())
    assert abs(r["mean_abs_gap"] - round(gaps.mean(), 6)) < 1e-4
    # the corpus generates totals independently of lines: the audit must
    # report that honestly, not assume consistency
    assert r["n_total_mismatch"] == len(have)

    # constructed consistent ledger + one orphan + one early ship
    t0 = datetime.datetime(2022, 1, 10)
    orders = pd.DataFrame(
        {
            "o_orderkey": [1, 2, 3],
            "o_custkey": [1, 1, 2],
            "o_orderdate": [t0, t0, t0],
            "o_totalprice": [300.0, 50.0, 10.0],  # order 3 has no lines
            "o_orderstatus": ["F"] * 3,
            "o_orderpriority": ["1-URGENT"] * 3,
        }
    )
    lines = pd.DataFrame(
        {
            "l_orderkey": [1, 1, 2],
            "l_partkey": [1, 2, 3],
            "l_suppkey": [1, 1, 1],
            "l_linenumber": [1, 2, 1],
            "l_quantity": [1.0, 1.0, 1.0],
            "l_extendedprice": [100.0, 200.0, 49.0],  # order 2 off by 1.00
            "l_discount": [0.0] * 3,
            "l_tax": [0.0] * 3,
            "l_returnflag": ["N"] * 3,
            "l_linestatus": ["O"] * 3,
            "l_shipdate": [
                t0 + datetime.timedelta(days=5),
                t0 + datetime.timedelta(days=9),
                t0 - datetime.timedelta(days=2),  # ships before placement
            ],
        }
    )
    spark.createDataFrame(orders).createOrReplaceTempView("orders")
    spark.createDataFrame(lines).createOrReplaceTempView("lineitem")
    [f] = spark.sql(dq_cross_table_sql(SPARK_D)).collect()
    spark.catalog.dropTempView("orders")
    spark.catalog.dropTempView("lineitem")
    assert f["n_orders"] == 3
    assert f["n_orders_no_lines"] == 1
    assert f["n_ship_before_order"] == 1
    assert f["n_total_mismatch"] == 1        # order 1 reconciles exactly
    assert abs(f["mean_abs_gap"] - round(1.0 / 2, 6)) < 1e-9


def test_dq_cross_table_all_orphans_yields_null_means(spark):
    """Orders with an empty lineitem table: the reconciliation means are
    0/0 and must emit NULL, not raise under ANSI (second-review fix)."""
    import datetime

    import pandas as pd

    from serene_spark.functions.sqlgen import SPARK as SPARK_D
    from serene_spark.operators.quality_checks import dq_cross_table_sql

    orders = pd.DataFrame(
        {
            "o_orderkey": [1, 2],
            "o_custkey": [1, 1],
            "o_orderdate": [datetime.datetime(2022, 1, 1)] * 2,
            "o_totalprice": [10.0, 20.0],
        }
    )
    spark.createDataFrame(orders).createOrReplaceTempView("orders")
    spark.createDataFrame(
        [], "l_orderkey long, l_extendedprice double, l_shipdate timestamp"
    ).createOrReplaceTempView("lineitem")
    [r] = spark.sql(dq_cross_table_sql(SPARK_D)).collect()
    spark.catalog.dropTempView("orders")
    spark.catalog.dropTempView("lineitem")
    assert r["n_orders"] == 2 and r["n_orders_no_lines"] == 2
    assert r["mean_abs_gap"] is None and r["mean_rel_gap"] is None


def test_dp_release_mechanism_python_recheck(spark):
    """The Laplace mechanism re-derived independently: hashlib md5 ->
    inverse-CDF noise with math.log must reproduce every released cell,
    and the release must satisfy the mechanism's own invariants.  The
    recheck reads the AUDIT shape; the release shape must carry ONLY
    what a release may contain and agree cell-for-cell with the audit."""
    import hashlib
    import math

    import pandas as pd

    from serene_spark.operators.quality_checks import DP_EPSILON

    q = load_all()["dp_release_audit"]
    got = q.spark(spark, SF).toPandas()

    released = load_all()["dp_release_counts"].spark(spark, SF).toPandas()
    # the release never ships true counts or draws
    assert set(released.columns) == {"nation", "segment", "dp_count", "epsilon"}
    merged = released.merge(got, on=["nation", "segment"], suffixes=("_r", "_a"))
    assert len(merged) == len(got) == len(released)
    assert (merged.dp_count_r == merged.dp_count_a).all()

    cust = pd.read_parquet(f"{SF}/customer.parquet")
    truth = (
        cust.groupby(["c_nationkey", "c_mktsegment"]).size().reset_index(name="n")
    )
    for _, row in truth.iterrows():
        key = f"{int(row.c_nationkey)}|{row.c_mktsegment}"
        h = int(hashlib.md5(key.encode()).hexdigest()[:8], 16)
        u = (h + 0.5) / 2**32
        t = u - 0.5
        noise = (
            0.0 if t == 0
            else -(1.0 / DP_EPSILON) * math.copysign(1, t) * math.log(1 - 2 * abs(t))
        )
        cell = got[(got.nation == row.c_nationkey)
                   & (got.segment == row.c_mktsegment)]
        assert len(cell) == 1
        c = cell.iloc[0]
        assert c.n_true == row.n
        # libm vs JVM ln agree well inside the 6-dp rounding here
        assert abs(c.noise - round(noise, 6)) <= 2e-6
        assert abs(c.dp_count - round(max(row.n + noise, 0.0), 6)) <= 2e-6
        assert c.dp_count >= 0.0  # post-processing clamp

    # utility readout: mean |noise| is near the analytic E|Laplace(1/eps)|
    # = 1/eps (loose band -- ~100 cells of sampling noise)
    assert 0.5 / DP_EPSILON < got.mean_abs_noise.iloc[0] < 2.0 / DP_EPSILON
    # determinism: a second run releases identical cells
    again = q.spark(spark, SF).toPandas()
    pd.testing.assert_frame_equal(
        got.sort_values(["nation", "segment"]).reset_index(drop=True),
        again.sort_values(["nation", "segment"]).reset_index(drop=True),
    )


def test_dp_median_exponential_mechanism_python_recheck(spark):
    """The exponential mechanism re-derived independently (decimal-exact
    cumulative weights, same md5 draw) must reproduce every released
    median; the release must be a real candidate value."""
    import hashlib
    import math
    from decimal import Decimal

    import pandas as pd

    from serene_spark.operators.quality_checks import DP_MED_EPSILON

    q = load_all()["dp_release_median"]
    got = q.spark(spark, SF).toPandas().set_index("segment")

    cust = pd.read_parquet(f"{SF}/customer.parquet")
    for segment, grp in cust.groupby("c_mktsegment"):
        vals = sorted(round(float(v), 2) for v in grp["c_acctbal"])
        n = len(vals)
        # candidate weights, rounded to 12 dp like the SQL
        from collections import Counter

        counts = Counter(vals)
        cands = sorted(counts)
        below = 0
        weights = []
        for v in cands:
            u = -abs(below - n / 2.0)
            weights.append(Decimal(str(round(math.exp(DP_MED_EPSILON * u / 2.0), 12))))
            below += counts[v]
        tot = sum(weights)
        h = int(hashlib.md5(segment.encode()).hexdigest()[:8], 16)
        r = (h + 0.5) / 2**32
        cum = Decimal(0)
        pick = None
        for v, w in zip(cands, weights):
            cum += w
            if float(cum) / float(tot) >= r:
                pick = v
                break
        row = got.loc[segment]
        assert row.dp_median == pick, (segment, row.dp_median, pick)
        assert row.dp_median in counts  # a real candidate, never synthetic
        # exact median audit column
        cc = 0
        for v in cands:
            cc += counts[v]
            if cc >= math.ceil(n / 2):
                assert row.true_median == v
                break
    # determinism
    again = q.spark(spark, SF).toPandas().set_index("segment")
    pd.testing.assert_frame_equal(got, again)


def test_dp_salted_release_changes_noise_and_refuses_empty(spark):
    """The production salted path (dp_release_counts_salted): same
    release shape, per-salt noise keyed by md5(salt|group) — the python
    recheck reproduces it given the secret; different salts give
    different draws; missing salt is a hard error (the demo noise must
    be asked for by its demo name, never reached by a missing config)."""
    import hashlib
    import math

    import pytest as _pytest

    from serene_spark.operators.quality_checks import (
        DP_EPSILON,
        dp_release_counts_salted,
    )

    with _pytest.raises(ValueError, match="secret salt"):
        dp_release_counts_salted(spark, SF, salt="")

    a = dp_release_counts_salted(spark, SF, salt="s3cret").toPandas()
    b = dp_release_counts_salted(spark, SF, salt="other").toPandas()
    public = load_all()["dp_release_counts"].spark(spark, SF).toPandas()
    assert set(a.columns) == {"nation", "segment", "dp_count", "epsilon"}
    assert len(a) == len(b) == len(public)

    key = ["nation", "segment"]
    ab = a.merge(b, on=key, suffixes=("_a", "_b"))
    ap = a.merge(public, on=key, suffixes=("_a", "_p"))
    # salts decorrelate the draws from each other AND from the demo noise
    assert (ab.dp_count_a != ab.dp_count_b).any()
    assert (ap.dp_count_a != ap.dp_count_p).any()

    # holder-of-the-salt audit: python recheck reproduces every cell
    import pandas as pd

    cust = pd.read_parquet(f"{SF}/customer.parquet")
    truth = (
        cust.groupby(["c_nationkey", "c_mktsegment"]).size().reset_index(name="n")
    )
    for _, row in truth.iterrows():
        h = int(hashlib.md5(
            f"s3cret|{int(row.c_nationkey)}|{row.c_mktsegment}".encode()
        ).hexdigest()[:8], 16)
        u = (h + 0.5) / 2**32
        t = u - 0.5
        noise = (
            0.0 if t == 0
            else -(1.0 / DP_EPSILON) * math.copysign(1, t) * math.log(1 - 2 * abs(t))
        )
        cell = a[(a.nation == row.c_nationkey) & (a.segment == row.c_mktsegment)]
        assert len(cell) == 1
        assert abs(cell.iloc[0].dp_count - round(max(row.n + noise, 0.0), 6)) <= 2e-6

    # lexer-hostile salt (single quote + trailing backslash): the salt is
    # hex-encoded into the SQL, so this must neither ParseException nor
    # silently hash a different key — the python recheck reproduces it
    hostile = "it's a \\"
    c = dp_release_counts_salted(spark, SF, salt=hostile).toPandas()
    row = truth.iloc[0]
    h = int(hashlib.md5(
        f"{hostile}|{int(row.c_nationkey)}|{row.c_mktsegment}".encode()
    ).hexdigest()[:8], 16)
    t = (h + 0.5) / 2**32 - 0.5
    noise = (0.0 if t == 0 else
             -(1.0 / DP_EPSILON) * math.copysign(1, t) * math.log(1 - 2 * abs(t)))
    cell = c[(c.nation == row.c_nationkey) & (c.segment == row.c_mktsegment)]
    assert abs(cell.iloc[0].dp_count - round(max(row.n + noise, 0.0), 6)) <= 2e-6


def test_dp_salted_sql_dialect_parity(spark, duck):
    """The salted key is hex-encoded per dialect (Spark
    decode(unhex(), 'UTF-8') vs DuckDB decode(unhex())): both arms must
    hash the identical key — checked by running the DuckDB arm for real
    with a lexer-hostile salt and comparing every released cell."""
    from serene_spark.functions.sqlgen import DUCKDB
    from serene_spark.operators.quality_checks import (
        _dp_counts_sql,
        dp_release_counts_salted,
    )

    hostile = "it's a \\"
    a = (dp_release_counts_salted(spark, SF, salt=hostile).toPandas()
         .sort_values(["nation", "segment"]).reset_index(drop=True))
    b = (duck.execute(_dp_counts_sql(DUCKDB, audit=False, salt=hostile)).df()
         .sort_values(["nation", "segment"]).reset_index(drop=True))
    assert len(a) == len(b) > 0
    assert (a.nation.values == b.nation.values).all()
    assert (a.segment.values == b.segment.values).all()
    assert (abs(a.dp_count.values - b.dp_count.values) <= 2e-6).all()
