"""Cross-dialect equivalence of the sqlgen helpers: the same generated SQL
expression must produce identical values on Spark and DuckDB for adversarial
strings (the whole oracle gate rests on these shims)."""

from __future__ import annotations

import duckdb
import pytest

from serene_spark.functions.sqlgen import (
    DUCKDB,
    SPARK,
    arr_agg_ordered,
    arr_len,
    count_chars,
    element_at,
    explode_seq,
    idiv,
    split_re,
)

# adversarial: empties, unicode, control chars, regex metachars, long runs
CASES = [
    "",
    " ",
    "hello world",
    "a,b,,c",
    "tab\there",
    "nl\nline",
    "cr\rhere",
    "ünïcødé πß",
    "a.b*c+d(e)f[g]h",
    "123-456",
    "  padded  ",
    "$$$///---",
    "x" * 300,
    "Mixed CASE 42 Words",
]


def _spark_vals(spark, expr: str) -> list:
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(i, s) for i, s in enumerate(CASES)], "id long, s string")
    return [r["v"] for r in df.select(F.expr(expr).alias("v")).orderBy("id").collect()]


def _duck_vals(expr: str) -> list:
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT, s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(CASES)))
    return [r[0] for r in con.execute(f"SELECT {expr} AS v FROM t ORDER BY id").fetchall()]


def test_count_chars_dialects(spark):
    chars = "(' ' || chr(9) || chr(10) || chr(13))"
    s = _spark_vals(spark, count_chars(SPARK, "s", chars))
    d = _duck_vals(count_chars(DUCKDB, "s", chars))
    assert s == d
    letters = "'abcdefghijklmnopqrstuvwxyz'"
    assert _spark_vals(spark, count_chars(SPARK, "s", letters)) == _duck_vals(
        count_chars(DUCKDB, "s", letters)
    )


def test_split_and_len_dialects(spark):
    expr_s = arr_len(SPARK, split_re(SPARK, "s", "[^a-z0-9]+"))
    expr_d = arr_len(DUCKDB, split_re(DUCKDB, "s", "[^a-z0-9]+"))
    assert _spark_vals(spark, expr_s) == _duck_vals(expr_d)


def test_element_at_dialects(spark):
    expr_s = element_at(SPARK, split_re(SPARK, "s", " "), 1)
    expr_d = element_at(DUCKDB, split_re(DUCKDB, "s", " "), 1)
    assert _spark_vals(spark, expr_s) == _duck_vals(expr_d)


def test_idiv_dialects(spark):
    assert _spark_vals(spark, idiv(SPARK, "length(s)", 3)) == _duck_vals(
        idiv(DUCKDB, "length(s)", 3)
    )


def test_arr_agg_ordered_dialects(spark):
    """Aggregate CASES's lengths in id order — one grouped row per parity."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(CASES)], "id long, s string"
    )
    sv = df.agg(
        F.expr(arr_agg_ordered(SPARK, "length(s)", "id")).alias("v")
    ).first()["v"]

    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT, s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(CASES)))
    dv = con.execute(
        f"SELECT {arr_agg_ordered(DUCKDB, 'length(s)', 'id')} FROM t"
    ).fetchone()[0]
    assert list(sv) == list(dv)


def test_explode_seq_dialects(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(3,), (1,), (0,)], "n long")
    sv = sorted(
        tuple(r)
        for r in df.where("n >= 1")
        .select("n", F.expr(explode_seq(SPARK, 1, "n")).alias("i"))
        .collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (n BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(3,), (1,), (0,)])
    dv = sorted(
        tuple(r)
        for r in con.execute(
            f"SELECT n, {explode_seq(DUCKDB, 1, 'n')} AS i FROM t WHERE n >= 1"
        ).fetchall()
    )
    assert sv == dv
