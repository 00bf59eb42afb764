"""Facade + skew-utility tests."""

from pyspark.sql import functions as F


def test_engine_run_end_to_end(spark, tiny_graph):
    from graphraft_spark.api import EngineConfig, GraphRAFTEngine

    def chat(question):
        # deterministic 'LLM': labeled NER response
        return "Author: Ada Institution: MIT"

    engine = GraphRAFTEngine(
        spark, tiny_graph,
        config=EngineConfig(max_nodes=20, beam_width=4,
                            patterns=("1hop", "2hop"),
                            ner_labels=("Paper", "Author", "Institution",
                                        "FieldOfStudy")),
        chat_fn=chat)
    retrieved, answers = engine.run("what has Ada written at MIT?")
    names = {r["name"] for r in retrieved.collect()}
    assert names  # Ada's papers / MIT's authors reachable
    assert answers and all(isinstance(a, str) for a in answers)


def test_engine_unlabeled_and_no_chat(spark, tiny_graph):
    from graphraft_spark.api import EngineConfig, GraphRAFTEngine

    engine = GraphRAFTEngine(spark, tiny_graph,
                             config=EngineConfig(patterns=("1hop",)))
    # no chat_fn → the question itself is the entity; 'Bob' matches
    retrieved, answers = engine.run("Bob")
    assert {r["name"] for r in retrieved.collect()} >= {"P-beta"}


def test_mag_prime_presets():
    from graphraft_spark.api import EngineConfig

    assert EngineConfig.mag().specific_target_label == "Paper"
    assert EngineConfig.mag().patterns == ("1hop", "2hop")
    assert EngineConfig.prime().patterns == ("1hop", "2hop", "2path")


def test_salted_join_matches_plain(spark):
    from graphraft_spark.ops.skew import salted_join

    big = spark.range(0, 10000).select(
        (F.col("id") % 5).alias("k"), F.col("id").alias("v"))
    small = spark.createDataFrame([(i, f"d{i}") for i in range(5)],
                                  "k bigint, d string")
    plain = big.join(small, "k").groupBy("d").count().collect()
    salted = salted_join(big, small, "k", salt_factor=4) \
        .groupBy("d").count().collect()
    assert sorted(map(tuple, plain)) == sorted(map(tuple, salted))


def test_salted_distinct_count_matches_plain(spark):
    from graphraft_spark.ops.skew import salted_distinct_count, skew_profile

    df = spark.range(0, 5000).select(
        (F.col("id") % 3).alias("k"), (F.col("id") % 97).alias("v"))
    want = {(r["k"], r["n"]) for r in
            df.groupBy("k").agg(F.countDistinct("v").alias("n")).collect()}
    got = {(r["k"], r["n_distinct"]) for r in
           salted_distinct_count(df, "k", "v").collect()}
    assert got == want
    prof = skew_profile(df, "k").collect()
    assert prof[0]["n"] >= prof[-1]["n"]
