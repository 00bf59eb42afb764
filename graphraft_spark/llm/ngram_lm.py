"""A real (if tiny) language model for the trie-ranker seam.

The reference ranks candidate Cypher queries with an HF model under a
trie constraint at TOKEN-ID granularity
(constrained_decoding/logits_processor.py:12-36,
constrained_decoding/sequence_ranker.py:15-34): each candidate is
tokenized with the end-of-generation token appended, beams may only
follow trie edges, and the final ranking is by total sequence
log-probability including the forced EOS step.

Torch/transformers are absent from this environment, so the "real
model" demonstrating that seam is a character-level n-gram LM with
Laplace smoothing: genuinely trained on a corpus, producing genuine
normalized log-probabilities per token, conditioned on the prompt —
everything the seam contract requires (``token_logprob(question,
prefix, next_token) -> float``), at real per-token granularity.  An
HF checkpoint drops into the same two constructor arguments
(``tokenizer=`` the model tokenizer, ``token_logprob=`` a logits
lookup) without touching the ranker.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from collections.abc import Sequence

BOS = "\x02"
EOS = "\x03"


class CharNgramLM:
    """Laplace-smoothed character n-gram LM.

    Trained on ``corpus`` (each string is one training sequence,
    terminated by EOS).  ``logprob(ctx, tok)`` is a proper conditional
    log-probability: the distribution over ``vocab ∪ {EOS}`` given the
    last ``n-1`` tokens sums to 1.
    """

    def __init__(self, corpus: Sequence[str], n: int = 3,
                 alpha: float = 0.5):
        if n < 2:
            raise ValueError("n-gram order must be >= 2")
        self.n = n
        self.alpha = alpha
        self.counts: dict[tuple, Counter] = defaultdict(Counter)
        vocab = {EOS}
        for s in corpus:
            toks = list(s) + [EOS]
            vocab.update(toks)
            padded = [BOS] * (n - 1) + toks
            for i in range(n - 1, len(padded)):
                ctx = tuple(padded[i - (n - 1): i])
                self.counts[ctx][padded[i]] += 1
        self.vocab = vocab
        # +1 leaves smoothed mass for tokens never seen in training
        # (a candidate may contain characters outside the corpus)
        self._v = len(vocab) + 1

    def _ctx(self, tokens: Sequence) -> tuple:
        padded = [BOS] * (self.n - 1) + [str(t) for t in tokens]
        return tuple(padded[-(self.n - 1):])

    def logprob(self, context_tokens: Sequence, tok) -> float:
        """log P(tok | last n-1 of context_tokens), Laplace-smoothed."""
        c = self.counts.get(self._ctx(context_tokens), Counter())
        num = c.get(str(tok), 0) + self.alpha
        den = sum(c.values()) + self.alpha * self._v
        return math.log(num / den)

    def token_logprob(self, question: str, prefix: tuple, tok) -> float:
        """The TrieConstrainedRanker seam: condition on the prompt
        (question characters) followed by the generated prefix — the
        n-gram analog of the reference feeding prompt + generated ids
        back into the model each step."""
        return self.logprob(list(question) + list(prefix), tok)

    def sequence_logprob(self, question: str, tokens: Sequence) -> float:
        """Total log P of a token sequence under prompt conditioning —
        the exhaustive scorer used to cross-check beam results."""
        ctx = list(question)
        total = 0.0
        for t in tokens:
            total += self.logprob(ctx, t)
            ctx.append(str(t))
        return total


def eos_tokenizer(text: str) -> list:
    """Character tokens with the EOS appended — the reference tokenizes
    each candidate as ``query + end_of_generation_token``
    (sequence_ranker.py:21-23), so the beam's last edge scores the
    forced-EOS step and a candidate that is a strict prefix of another
    still terminates (its EOS edge diverges from the longer candidate's
    continuation)."""
    return list(text) + [EOS]
