"""sources/bucketed.py: the co-located-join contract — bucketed+sorted
tables joined on the bucket key must plan a SortMergeJoin whose INPUTS
carry no Exchange (the write-time shuffle replaces every
downstream join-time shuffle, the 100 TB repeated-join mechanism)."""

from pyspark.sql import functions as F


def _smj_inputs_have_no_exchange(plan: str) -> bool:
    """True when no Exchange appears BELOW the (first) SortMergeJoin in
    the executed-plan string — operators above the join (the post-join
    aggregate's re-key) may still shuffle."""
    # AQE prints "== Final Plan ==" followed by "== Initial Plan ==";
    # judge only the final executed tree
    final = plan.split("== Initial Plan ==")[0]
    lines = final.splitlines()
    smj_at = next(i for i, l in enumerate(lines) if "SortMergeJoin" in l)
    return not any("Exchange" in l for l in lines[smj_at:])


def test_bucketed_join_inputs_are_exchange_free(spark, tmp_path):
    o = spark.createDataFrame(
        [(i, f"P{i % 3}") for i in range(200)], "okey bigint, prio string")
    li = spark.createDataFrame(
        [(i % 200, float(i)) for i in range(1000)],
        "l_okey bigint, amount double")

    from graphraft_spark.sources.bucketed import (
        read_bucketed_table,
        write_bucketed_table,
    )

    write_bucketed_table(o, "tb_orders", f"{tmp_path}/o", "okey", 4)
    write_bucketed_table(li, "tb_lineitem", f"{tmp_path}/l", "l_okey", 4)
    ob = read_bucketed_table(spark, "tb_orders")
    lb = read_bucketed_table(spark, "tb_lineitem")
    j = (lb.hint("merge").join(ob, F.col("l_okey") == F.col("okey"))
         .groupBy("prio").agg(F.sum("amount").alias("total")))
    got = {r.prio: r.total for r in j.collect()}

    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert _smj_inputs_have_no_exchange(plan), plan
    # the post-join agg still shuffles (re-keyed onto prio)
    assert "Exchange" in plan

    want = {}
    for i in range(1000):
        want.setdefault(f"P{(i % 200) % 3}", 0.0)
        want[f"P{(i % 200) % 3}"] += float(i)
    assert got == want
    spark.sql("DROP TABLE IF EXISTS tb_orders")
    spark.sql("DROP TABLE IF EXISTS tb_lineitem")


def test_plain_parquet_read_of_same_path_loses_bucketing(spark, tmp_path):
    """The caveat the module docstring warns about, pinned: reading the
    bucketed files as plain parquet re-shuffles the join."""
    o = spark.createDataFrame(
        [(i, i * 2) for i in range(100)], "okey bigint, v bigint")
    from graphraft_spark.sources.bucketed import write_bucketed_table

    write_bucketed_table(o, "tb_plain_a", f"{tmp_path}/a", "okey", 4)
    write_bucketed_table(o, "tb_plain_b", f"{tmp_path}/b", "okey", 4)
    a = spark.read.parquet(f"{tmp_path}/a")
    b = spark.read.parquet(f"{tmp_path}/b")
    j = a.hint("merge").join(b.withColumnRenamed("okey", "okey2"),
                             F.col("okey") == F.col("okey2"))
    j.collect()
    plan = j._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    lines = final.splitlines()
    smj_at = next(i for i, l in enumerate(lines) if "SortMergeJoin" in l)
    assert any("Exchange" in l for l in lines[smj_at:])
    spark.sql("DROP TABLE IF EXISTS tb_plain_a")
    spark.sql("DROP TABLE IF EXISTS tb_plain_b")


def test_table_name_must_be_bare_identifier(spark, tmp_path):
    """r11 advice: the name is spliced into SQL — reject anything that
    is not a bare identifier instead of quoting-and-hoping."""
    import pytest

    from graphraft_spark.sources.bucketed import write_bucketed_table

    df = spark.range(3).withColumnRenamed("id", "k")
    for bad in ("t; DROP TABLE x", "a.b", "x-y", "", "1tab", "t`"):
        with pytest.raises(ValueError, match="identifier"):
            write_bucketed_table(df, bad, str(tmp_path / "t"), "k")


def test_io_bucketed_join_drops_prior_catalog_entries(spark):
    """r11 advice: repeated invocations in a long-lived session must not
    accumulate catalog tables — each run drops every io_bucketed_*
    entry from prior runs before registering its own pair."""
    from graphraft_spark.registry.io_queries import io_bucketed_join

    for _ in range(2):
        io_bucketed_join(spark, "/root/testdata/sf0.001").collect()
    names = [t.name for t in spark.catalog.listTables()
             if t.name.startswith("io_bucketed_")]
    assert len(names) == 2  # exactly the LAST run's orders+lineitem pair
