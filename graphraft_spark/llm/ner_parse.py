"""Entity-extraction response parsing (reference ner.py:68-92) —
deterministic string parsers usable driver-side and inside UDFs.
"""

from __future__ import annotations


def parse_unlabeled_entities(response: str) -> list[tuple[str, str]]:
    """ner.py:68-72: split on '|', tag everything '_Entity_' (PRIME has
    no label vocabulary — ner_instructions.json labels: null)."""
    response = response.lstrip("A").lstrip(":")
    return [("_Entity_", e) for e in response.split("|")]


def parse_labeled_entities(response: str,
                           labels: list[str]) -> list[tuple[str, str]]:
    """ner.py:75-92: scan for 'Label:' markers, slice the value between
    consecutive markers (marker order by position in the response)."""
    idx0s, idx1s = [], []
    for label in labels:
        marker = label + ":"
        if marker not in response:
            continue
        idx0s.append(response.index(marker))
        idx1s.append(response.index(marker) + len(marker))
    idx0s, idx1s = sorted(idx0s), sorted(idx1s)

    out: list[tuple[str, str]] = []
    for i in range(len(idx0s)):
        label = response[idx0s[i]:idx1s[i] - 1]
        value = (response[idx1s[i]:idx0s[i + 1]]
                 if i < len(idx0s) - 1 else response[idx1s[i]:])
        out.append((label, value.strip()))
    return out
