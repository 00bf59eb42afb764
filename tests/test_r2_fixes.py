"""Round-2 fix coverage: first-seen prop semantics under per-row-varying
props, k-means IVF centroid recall vs the modulo baseline, and
token-granularity trie ranking with a multi-char-merge toy tokenizer."""

from pyspark.sql import functions as F


def test_budget_first_seen_prop_varies_within_group(spark):
    """A prop that VARIES across a node's rows must come from the
    first-seen row (retriever.py:82-86), not an arbitrary one — the
    F.first regression the min-struct fold fixes."""
    from graphraft_spark.retrieve import budgeted_accumulate

    rows = [
        # qid, queryIdx, nodeId, similarity, pattern, tag
        (0, 0, 100, 0.9, "pA", "from-q0"),
        (0, 1, 100, 0.9, "pB", "from-q1"),   # same node, later stream
        (0, 0, 101, 0.5, "pA", "low"),
        (0, 1, 101, 0.5, "pB", "also-low"),
    ]
    df = spark.createDataFrame(
        rows, "qid bigint, queryIdx int, nodeId bigint, similarity double,"
              " pattern string, tag string")
    out = {r["nodeId"]: r["tag"]
           for r in budgeted_accumulate(df, max_nodes=10,
                                        prop_cols=("tag",)).collect()}
    assert out == {100: "from-q0", 101: "low"}


def test_token_budget_first_seen_tok(spark):
    """token_budgeted_accumulate counts the FIRST-SEEN row's token
    length even when later re-encounters carry different counts."""
    from graphraft_spark.retrieve.budget import token_budgeted_accumulate

    rows = [
        (0, 0, 100, 0.9, "pA"),
        (0, 1, 100, 0.9, "pB pB pB pB pB pB pB pB"),  # longer re-encounter
        (0, 1, 101, 0.8, "pB"),
    ]
    df = spark.createDataFrame(
        rows, "qid bigint, queryIdx int, nodeId bigint, similarity double,"
              " pattern string")
    out = {r["nodeId"]: r["cum_tok"]
           for r in token_budgeted_accumulate(df, max_tokens=100).collect()}
    # node 100 first seen in queryIdx 0 with 1 token, not 8
    assert out[100] == 1 and out[101] == 2


def test_kmeans_ivf_beats_modulo_centroids(spark):
    """Deterministic Lloyd centroids must beat the every-Nth stand-in at
    equal nprobe (the reference's vector index sets an ANN-recall bar,
    stark_neo4j_loading.py:75-80)."""
    from graphraft_spark.ops.similarity import (
        brute_force_topk, ivf_assign, ivf_centroids, ivf_centroids_kmeans,
        ivf_search)

    vectors = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    queries = (vectors.filter(F.col("vec_id") % 37 == 1).limit(12)
               .select(F.col("vec_id").alias("qid"),
                       F.col("embedding").alias("q_emb")))
    exact = {(r["qid"], r["vec_id"])
             for r in brute_force_topk(vectors, queries, k=10).collect()}

    def recall(cents):
        assigned = ivf_assign(vectors, cents)
        got = ivf_search(assigned, cents, queries, k=10, nprobe=2)
        hit = {(r["qid"], r["vec_id"]) for r in got.collect()}
        return len(hit & exact) / len(exact)

    r_mod = recall(ivf_centroids(vectors, every=50))
    r_km = recall(ivf_centroids_kmeans(vectors, k=10, iters=5))
    assert r_km > r_mod, (r_km, r_mod)


def test_llm2_sft_table_exact_strings(spark):
    """The LLM2 SFT table must emit byte-exact prompt/completion/text
    with the completion-only collator split (llm2.py:17-26,80-122)."""
    from graphraft_spark.llm.sft import llm2_sft_table

    qa = spark.createDataFrame(
        [(1, "who?", [("Ada", "x"), ("Bob", None)], ["Ada", "Bob"])],
        "qid bigint, question string,"
        " data array<struct<name string, detail string>>,"
        " answers array<string>")
    r = llm2_sft_table(qa, props=["name", "detail"]).collect()[0]
    info = "name: Ada\ndetail: x\n\nname: Bob"
    prompt = ("<|start_header_id|>user<|end_header_id|>\n"
              "Given the information below, return the correct nodes for "
              "the following question: who?\nRetrieved information:\n"
              + info + "\n<|start_header_id|>model<|end_header_id|>\n")
    assert r["prompt"] == prompt
    assert r["completion"] == "Ada|Bob<eos>"
    assert r["text"] == prompt + "Ada|Bob<eos>"


def _bpe_ish(text):
    """Toy multi-char-merge tokenizer: greedy 3-char chunks per word —
    'q 1234' -> ('q', '123', '4').  Token boundaries differ from
    whitespace, so scoring granularity changes while the constraint
    invariant must not."""
    toks = []
    for w in text.split():
        toks.extend(w[i:i + 3] for i in range(0, len(w), 3))
    return tuple(toks)


def test_trie_ranker_token_granularity_invariants():
    from graphraft_spark.llm.protocols import TrieConstrainedRanker

    cands = ["q 1234", "q 1299", "q 56", "zz top", "q 129"]
    ws = TrieConstrainedRanker()
    bpe = TrieConstrainedRanker(tokenizer=_bpe_ish)
    for ranker in (ws, bpe):
        for k in (1, 3, len(cands), 10):
            out = ranker.rank("which?", cands, k=k)
            assert len(out) == min(k, len(cands))
            assert len(set(out)) == len(out)
            assert all(c in cands for c in out)       # trie constraint
            # deterministic
            assert out == ranker.rank("which?", cands, k=k)
    # granularity changes the scoring space: with shared 3-char prefixes
    # ('129' is a full token of 'q 129' and a prefix token of 'q 1299'
    # only under the merge tokenizer) rankings may legitimately differ,
    # but both must rank the full candidate set when k covers it
    assert sorted(ws.rank("which?", cands, k=10)) == sorted(cands)
    assert sorted(bpe.rank("which?", cands, k=10)) == sorted(cands)


def test_upsert_graph_merge_by_id(spark):
    """Batch MERGE semantics across runs: delta rows replace base rows
    sharing an id, new ids append (stark_neo4j_loading.py:20-61)."""
    from graphraft_spark.graph.ingest import upsert_graph
    from graphraft_spark.graph.model import PropertyGraph

    base = PropertyGraph(
        nodes=spark.createDataFrame(
            [(1, "A", "old"), (2, "A", "keep")],
            "nodeId bigint, label string, name string"),
        edges=spark.createDataFrame(
            [(10, 1, 2, "R")], "edgeId bigint, src bigint, dst bigint,"
                               " relType string"))
    delta = PropertyGraph(
        nodes=spark.createDataFrame(
            [(1, "A", "new"), (3, "B", "added")],
            "nodeId bigint, label string, name string"),
        edges=spark.createDataFrame(
            [(10, 1, 3, "R"), (11, 3, 2, "S")],
            "edgeId bigint, src bigint, dst bigint, relType string"))
    g = upsert_graph(base, delta)
    nodes = {r["nodeId"]: r["name"] for r in g.nodes.collect()}
    assert nodes == {1: "new", 2: "keep", 3: "added"}
    edges = {r["edgeId"]: (r["src"], r["dst"], r["relType"])
             for r in g.edges.collect()}
    assert edges == {10: (1, 3, "R"), 11: (3, 2, "S")}
    g.validate()  # merged graph keeps unique keys + referential integrity


def test_greedy_packing_respects_budget(spark):
    from graphraft_spark.ops.text_analysis import pack_bins_greedy

    rows = [(i, s) for i, s in enumerate([4, 4, 4, 9, 2, 10, 1])]
    df = spark.createDataFrame(rows, "doc_id bigint, n bigint")
    out = {r["doc_id"]: r["bin_id"]
           for r in pack_bins_greedy(df, budget=10, size_col="n").collect()}
    # greedy: [4,4]=8 | [4]=4? no — 4+4=8, +4=12>10 → new bin
    assert out == {0: 0, 1: 0, 2: 1, 3: 2, 4: 3, 5: 4, 6: 5}
    # every bin total ≤ budget except single-oversized-doc bins
    sizes = dict(rows)
    totals = {}
    for d, b in out.items():
        totals[b] = totals.get(b, 0) + sizes[d]
    for b, t in totals.items():
        members = [d for d in out if out[d] == b]
        assert t <= 10 or len(members) == 1


def test_sql_views_match_dataframe_plan(spark, tiny_graph):
    from graphraft_spark.graph.views import register_graph_views
    from graphraft_spark.patterns import onehop
    from graphraft_spark.patterns.compiler import run_pattern

    register_graph_views(spark, tiny_graph)
    sql_names = {r["name"] for r in spark.sql("""
        SELECT DISTINCT n2.name FROM nodes n1
        JOIN undirected_edges e ON e.src = n1.nodeId
             AND e.relType = 'WRITES'
        JOIN nodes n2 ON n2.nodeId = e.dst AND n2.label = 'Paper'
        WHERE n1.label = 'Author' AND n1.name = 'Ada'
    """).collect()}
    df_names = {r["name"] for r in run_pattern(
        tiny_graph, onehop("Author", "Ada", "WRITES", "Paper")).collect()}
    assert sql_names == df_names and sql_names


def test_trie_ranker_prefix_candidate_under_merge_tokenizer():
    """A candidate whose merged-token sequence is a strict prefix of
    another's must still be emittable (forced EOS at candidate end,
    logits_processor.py:25-31)."""
    from graphraft_spark.llm.protocols import TrieConstrainedRanker

    cands = ["q 129", "q 1299"]   # ('q','129') is a prefix of ('q','129','9')
    out = TrieConstrainedRanker(tokenizer=_bpe_ish).rank("?", cands, k=2)
    assert sorted(out) == sorted(cands)


def test_sketches_within_tolerance_of_exact(spark):
    """HLL++ distinct and GK quantiles stay within their documented
    error bounds of the exact operators on the documents corpus."""
    from graphraft_spark.ops.sketches import approx_distinct, approx_quantiles

    d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    exact_n = d.select("doc_id").distinct().count()
    approx_n = approx_distinct(d, "doc_id", rsd=0.02).collect()[0][0]
    assert abs(approx_n - exact_n) / exact_n <= 3 * 0.02

    exact_p50 = d.selectExpr(
        "percentile(n_chars, 0.5) AS p").collect()[0]["p"]
    got = approx_quantiles(d, "n_chars", [0.5],
                           accuracy=10_000).collect()[0][0][0]
    # GK with high accuracy on 500 rows is rank-exact; allow tiny slack
    ranked = sorted(r["n_chars"] for r in d.select("n_chars").collect())
    idx = ranked.index(got)
    assert abs(idx - len(ranked) // 2) <= max(1, len(ranked) // 100)
    assert abs(got - exact_p50) / max(exact_p50, 1) < 0.1
