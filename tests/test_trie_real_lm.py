"""A REAL language model driving the trie-constrained ranker seam
(r4 verdict item 3): a trained char-level n-gram LM with genuine
normalized log-probabilities replaces the deterministic hash scorer,
at real per-token granularity with the forced-EOS step scored — the
semantics of constrained_decoding/logits_processor.py:12-36 and
sequence_ranker.py:15-34.  No Spark needed: the seam is plain Python
shipped to executors by the batch layer.
"""

from __future__ import annotations

import math

import pytest

from graphraft_spark.llm.ngram_lm import BOS, EOS, CharNgramLM, eos_tokenizer
from graphraft_spark.llm.protocols import TrieConstrainedRanker

CORPUS = [
    "MATCH (a:Paper)-[:CITES]-(b:Paper) RETURN b",
    "MATCH (a:Paper)-[:HAS_TOPIC]-(f:FieldOfStudy) RETURN f",
    "MATCH (a:Author)-[:WRITES]-(p:Paper) RETURN p",
    "MATCH (a:Author)-[:AFFILIATED_WITH]-(i:Institution) RETURN i",
]

CANDS = [
    "MATCH (a:Paper)-[:CITES]-(b:Paper) RETURN b",
    "MATCH (a:Paper)-[:HAS_TOPIC]-(f:FieldOfStudy) RETURN f",
    "MATCH (a:Author)-[:WRITES]-(p:Paper) RETURN p",
]

QUESTION = "Which papers cite this paper?"


@pytest.fixture(scope="module")
def lm():
    return CharNgramLM(CORPUS, n=3, alpha=0.5)


@pytest.fixture(scope="module")
def ranker(lm):
    return TrieConstrainedRanker(token_logprob=lm.token_logprob,
                                 tokenizer=eos_tokenizer)


def test_lm_distributions_are_normalized(lm):
    """The scorer is a real LM: P(.|ctx) sums to 1 over vocab+unseen."""
    for ctx in (["M", "A"], list("MATCH (a:P"), [BOS, BOS]):
        toks = list(lm.vocab) + ["\x00"]  # one never-seen token
        total = sum(math.exp(lm.logprob(ctx, t)) for t in toks)
        # the +1 smoothing slot covers ALL unseen tokens collectively;
        # with one representative included the mass must be ~1
        assert total == pytest.approx(1.0, abs=1e-9)


def test_full_beam_matches_exhaustive_ranking(lm, ranker):
    """With beam width >= #candidates nothing is pruned, so the beam
    ranking must equal exhaustively scoring each candidate's full token
    sequence (incl. the forced-EOS step) and sorting desc — computed
    here independently of any trie/beam code."""
    exhaustive = sorted(
        CANDS,
        key=lambda c: (-lm.sequence_logprob(QUESTION, eos_tokenizer(c)), c))
    got = ranker.rank(QUESTION, CANDS, k=len(CANDS))
    assert got == exhaustive


def test_beam_one_follows_hand_traced_greedy_path(lm):
    """beam=1 keeps only the best prefix each depth: trace that path by
    hand with direct LM lookups (no ranker code) and assert the ranker
    lands on the same single candidate."""
    seqs = {c: eos_tokenizer(c) for c in CANDS}
    prefix: list = []
    score = 0.0
    while True:
        depth = len(prefix)
        allowed = {s[depth] for s in seqs.values()
                   if len(s) > depth and s[:depth] == prefix}
        if not allowed:
            break
        best = max(sorted(allowed, key=str),
                   key=lambda t: lm.token_logprob(QUESTION, tuple(prefix), t))
        score += lm.token_logprob(QUESTION, tuple(prefix), best)
        prefix.append(best)
        if any(s == prefix for s in seqs.values()):
            break
    [winner] = [c for c, s in seqs.items() if s == prefix]
    ranker = TrieConstrainedRanker(token_logprob=lm.token_logprob,
                                   tokenizer=eos_tokenizer)
    assert ranker.rank(QUESTION, CANDS, k=1) == [winner]


def test_verbatim_constraint_under_real_lm(ranker):
    """The trie-constraint invariant (logits_processor.py:25-31): every
    emitted sequence is one of the candidates verbatim, regardless of
    what the LM would prefer to say."""
    out = ranker.rank(QUESTION, CANDS, k=5)
    assert out and all(c in CANDS for c in out)
    assert len(set(out)) == len(out)


def test_prefix_candidate_terminates_via_forced_eos(lm):
    """A candidate that is a strict PREFIX of another must still be
    emittable: its appended EOS edge diverges from the longer
    candidate's continuation (the reference appends the end token to
    every candidate before building the trie, sequence_ranker.py:21-23).
    Both candidates must appear in the full-width ranking."""
    cands = ["MATCH (a)", "MATCH (a)-[r]-(b)"]
    ranker = TrieConstrainedRanker(token_logprob=lm.token_logprob,
                                   tokenizer=eos_tokenizer)
    out = ranker.rank(QUESTION, cands, k=2)
    assert sorted(out) == sorted(cands)
    # and the ordering agrees with exhaustive EOS-inclusive scoring
    exhaustive = sorted(
        cands,
        key=lambda c: (-lm.sequence_logprob(QUESTION, eos_tokenizer(c)), c))
    assert out == exhaustive


def test_prompt_conditioning_changes_ranking_inputs(lm):
    """The prompt is part of the conditioning context (the reference
    feeds prompt + generated ids back through the model each step):
    scores for the same continuation must differ across prompts that
    end differently."""
    a = lm.token_logprob("RETUR", (), "N")   # ctx "UR" -> N seen in corpus
    b = lm.token_logprob("zzzzz", (), "N")   # ctx "zz" never observed
    assert a > b
