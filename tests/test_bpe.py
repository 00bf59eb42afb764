"""Distributed BPE trainer/encoder vs an independent pure-Python
reference (Sennrich et al. 2016 algorithm), including the overlap edge
cases ("aaa" + merge (a,a)) where naive implementations diverge."""

from graphraft_spark.ops.bpe import EOW, encode_bpe, train_bpe


# --- reference implementation (sequential, dict-based) --------------------

def ref_word_freqs(texts):
    wf = {}
    for t in texts:
        for w in t.lower().split():
            wf[w + EOW] = wf.get(w + EOW, 0) + 1
    return wf


def ref_train(texts, num_merges):
    wf = {tuple(list(w[:-len(EOW)]) + [EOW]): f
          for w, f in ref_word_freqs(texts).items()}
    merges = []
    for _ in range(num_merges):
        counts = {}
        for syms, f in wf.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] = \
                    counts.get((syms[i], syms[i + 1]), 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if counts[best] < 2:
            break
        merges.append(best)
        a, b = best
        new_wf = {}
        for syms, f in wf.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_wf[tuple(out)] = new_wf.get(tuple(out), 0) + f
        wf = new_wf
    return merges


def ref_encode(word, merges):
    ranks = {m: i for i, m in enumerate(merges)}
    syms = list(word) + [EOW]
    while len(syms) > 1:
        cands = [(ranks[(syms[i], syms[i + 1])], i)
                 for i in range(len(syms) - 1)
                 if (syms[i], syms[i + 1]) in ranks]
        if not cands:
            break
        a, b = merges[min(cands)[0]]
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


CORPORA = {
    "classic": ["low low low lower lowest", "new newer newest low"],
    "overlap": ["aaaa aaa aa baa aab", "aa aaa caaa"],
    "mixed": ["the cat sat on the mat", "the bat and the cat", "a ab abc"],
}


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string")


def test_trainer_matches_reference(spark):
    for name, texts in CORPORA.items():
        got = train_bpe(_df(spark, texts), num_merges=12)
        want = ref_train(texts, 12)
        assert got == want, (name, got, want)


def test_encoder_matches_reference(spark):
    texts = CORPORA["overlap"]
    merges = ref_train(texts, 12)
    enc = {r["doc_id"]: r["tokens"]
           for r in encode_bpe(_df(spark, texts), merges).collect()}
    for i, t in enumerate(texts):
        want = [s for w in t.lower().split() for s in ref_encode(w, merges)]
        assert enc[i] == want, (i, enc[i], want)


def test_encoder_roundtrip_reconstructs_text(spark):
    texts = CORPORA["classic"]
    merges = train_bpe(_df(spark, texts), num_merges=10)
    enc = {r["doc_id"]: r["tokens"]
           for r in encode_bpe(_df(spark, texts), merges).collect()}
    for i, t in enumerate(texts):
        joined = "".join(enc[i]).replace(EOW, " ").strip()
        assert joined == t.lower()


def test_trainer_stops_when_no_repeats(spark):
    # every pair unique → zero merges possible beyond frequency-1 pairs
    merges = train_bpe(_df(spark, ["abcdefg"]), num_merges=10)
    assert merges == []


def test_encode_handles_unseen_symbols(spark):
    merges = train_bpe(_df(spark, ["low low"]), num_merges=5)
    enc = encode_bpe(_df(spark, ["xyz low"]), merges).collect()[0]["tokens"]
    assert enc[:3] == ["x", "y", "z"]          # unseen chars pass through
    assert "low</w>" in enc or "low" in enc    # known word still merges
