"""Sequence packing (ops/text_analysis.py pack_sequences): boundary
offsets, flattened order, straddle contract, scalable/window parity."""

from pyspark.sql import functions as F

from graphraft_spark.ops.text_analysis import pack_sequences


def _df(spark):
    rows = [
        (1, ["a", "b", "c"]),          # 3 tokens, cum_before 0 → bin 0
        (2, ["d", "e"]),               # cum_before 3 → bin 0
        (3, ["f", "g", "h", "i"]),     # cum_before 5 → bin 0 (straddles)
        (4, ["j"]),                    # cum_before 9 → bin 1
    ]
    return spark.createDataFrame(rows, "doc_id bigint, tokens array<string>")


def test_boundaries_and_order(spark):
    out = {r["bin_id"]: r
           for r in pack_sequences(_df(spark), budget=8).collect()}
    b0 = out[0]
    assert list(b0["doc_ids"]) == [1, 2, 3]
    assert list(b0["tokens"]) == list("abcdefghi")
    assert list(b0["boundaries"]) == [0, 3, 5]
    assert b0["n_tokens"] == 9
    b1 = out[1]
    assert list(b1["doc_ids"]) == [4]
    assert list(b1["boundaries"]) == [0]


def test_scalable_equals_window_twin(spark):
    docs = spark.range(1, 200).select(
        F.col("id").alias("doc_id"),
        F.transform(F.sequence(F.lit(1), (F.col("id") % 7) + 1),
                    lambda i: i.cast("string")).alias("tokens"))
    a = {r["bin_id"]: (list(r["doc_ids"]), list(r["boundaries"]))
         for r in pack_sequences(docs, budget=50, scalable=True).collect()}
    b = {r["bin_id"]: (list(r["doc_ids"]), list(r["boundaries"]))
         for r in pack_sequences(docs, budget=50, scalable=False).collect()}
    assert a == b
