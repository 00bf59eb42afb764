"""C4 line cleaning + Gopher document gates (ops/text_analysis.py):
crafted documents exercising every rule — the synthetic corpus is too
clean to hit most of them."""

from graphraft_spark.ops.text_analysis import c4_clean, gopher_gates


def test_c4_line_rules(spark):
    text = "\n".join([
        "This is a proper sentence.",        # kept
        "Short one.",                        # < 3 words → dropped
        "No terminal punctuation here",      # no ./!/? → dropped
        "Please enable JavaScript to view.",  # javascript → dropped
        "Is this kept? Yes!",                # kept (ends in !)
        'He said "stop".',                   # kept (quote after .)
    ])
    df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    r = c4_clean(df).collect()[0]
    assert r["n_lines"] == 6
    assert r["n_lines_kept"] == 3
    assert r["clean_text"].splitlines() == [
        "This is a proper sentence.", "Is this kept? Yes!",
        'He said "stop".']
    assert r["doc_kept"]


def test_c4_doc_gates(spark):
    docs = spark.createDataFrame(
        [(1, "Fine text with words here."),
         (2, "Contains Lorem Ipsum dolor sit amet."),
         (3, "code block { return 0; } follows.")],
        "doc_id bigint, text string")
    kept = {r["doc_id"]: r["doc_kept"] for r in c4_clean(docs).collect()}
    assert kept == {1: True, 2: False, 3: False}


def test_gopher_gates_per_rule(spark):
    ok = ("the quick brown fox jumps over that lazy dog and friends "
          * 6)  # 60 words, all alpha, has 'the'/'and'/'that', len 3-10
    docs = spark.createDataFrame(
        [(1, ok),
         (2, "too short to pass the count gate"),       # < 50 words
         (3, ok + " ###### " + "... " * 20),            # symbol-heavy
         (4, ("123 456 " * 40) + "the and stuff here")],  # digits: alpha gate
        "doc_id bigint, text string")
    rows = {r["doc_id"]: r for r in gopher_gates(docs).collect()}
    assert rows[1]["keep"]
    assert not rows[2]["ok_word_count"] and not rows[2]["keep"]
    assert not rows[3]["ok_symbol_ratio"] and not rows[3]["keep"]
    assert not rows[4]["ok_alpha_words"] and not rows[4]["keep"]
    # rule-level audit stays truthful on the failing rows
    assert rows[2]["ok_stopwords"]
    assert rows[4]["ok_word_count"]


def test_span_corruption_semantics(spark):
    from graphraft_spark.ops.text_analysis import span_corruption

    toks = spark.createDataFrame(
        [(1, [f"t{i}" for i in range(10)]), (2, [])],
        "doc_id bigint, tokens array<string>")
    out = {r["doc_id"]: r for r in span_corruption(
        toks, mask_rate=0.5, span=3, salt="s").collect()}
    r1 = out[1]
    inp, tgt = list(r1["input_tokens"]), list(r1["target_tokens"])
    # masked content partitions exactly: inputs+targets minus sentinels
    # reassemble the document
    n_sent = sum(1 for t in inp if t.startswith("<extra_id_"))
    assert tgt.count("<extra_id_0>") == (1 if n_sent >= 1 else 0)
    recovered = []
    ti = 0
    for t in inp:
        if t.startswith("<extra_id_"):
            ti = tgt.index(t) + 1
            while ti < len(tgt) and not tgt[ti].startswith("<extra_id_"):
                recovered.append(tgt[ti]); ti += 1
        else:
            recovered.append(t)
    assert recovered == [f"t{i}" for i in range(10)]
    assert r1["n_masked"] == len(tgt) - n_sent
    # empty doc → empty example
    assert list(out[2]["input_tokens"]) == []
    assert out[2]["n_masked"] == 0
    # determinism across runs
    again = span_corruption(toks, mask_rate=0.5, span=3, salt="s").collect()
    assert {r["doc_id"]: list(r["input_tokens"]) for r in again}[1] == inp
