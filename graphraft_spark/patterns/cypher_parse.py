"""Parser for reference-formatted Cypher template strings → pattern IR.

The reference stores its enumerated candidate queries as Cypher *text*
(create_query, path_retriever.py:29-40) and later re-parses them by
string splitting (extract_from_query, retriever.py:3-7 — flagged
"Replace with regex" in the reference itself).  This module is the
migration path: it accepts exactly the three template shapes the
reference ever generates and produces a structured PatternSpec, after
which no string surgery exists anywhere downstream.

Accepted shapes (labels/types are identifiers; names are
double-quoted with backslash escapes; DISTINCT is optional — older
stored data predates the repair pass, generate_training_data_llm2.ipynb
cell 7):

  MATCH (x1:L1 {name: "..."})-[r1:T1]-(x2:L2) RETURN [DISTINCT] x2.name AS name
  MATCH (x1:L1 {name: "..."})-[r1:T1]-(x2:L2)-[r2:T2]-(x3:L3) RETURN [DISTINCT] x3.name AS name
  MATCH (x1:L1 {name: "..."})-[r1:T1]-(x2:L2)-[r2:T2]-(x3:L3 {name: "..."}) RETURN [DISTINCT] x2.name AS name
"""

from __future__ import annotations

import re

from graphraft_spark.patterns.ir import NodeSpec, PatternSpec

def _grammar(escaped: bool):
    # Reference strings inline names RAW (no escaping — SURVEY §7.4), so
    # the name is everything up to the '"})'' delimiter, non-greedy.
    # Our own renderer escapes quotes/backslashes; escaped=True uses the
    # escape-aware grammar and unescapes captures.
    name = r'"((?:[^"\\]|\\.)*)"' if escaped else r'"(.*?)"'
    anch = r"\(x\d+:(\w+) \{name: " + name + r"\}\)"
    free = r"\(x\d+:(\w+)\)"
    rel = r"-\[r\d+:(\w+)\]-"
    ret = r" RETURN (?:DISTINCT )?x(\d+)\.name AS name$"
    return (
        re.compile("^MATCH " + anch + rel + free + ret),
        re.compile("^MATCH " + anch + rel + free + rel + free + ret),
        re.compile("^MATCH " + anch + rel + free + rel + anch + ret),
    )


_RAW = _grammar(escaped=False)
_ESCAPED = _grammar(escaped=True)


def parse_cypher_query(text: str, escaped: bool = False) -> PatternSpec:
    """Parse a candidate query into a PatternSpec.  ``escaped=False``
    (default) accepts the reference's raw-inlined-name format;
    ``escaped=True`` parses this engine's renderer output (quotes and
    backslashes escaped).  Raises ValueError outside the templates."""
    onehop_re, twohop_re, twopath_re = _ESCAPED if escaped else _RAW

    def fix(s: str) -> str:
        return (s.replace('\\"', '"').replace("\\\\", "\\")
                if escaped else s)

    m = twopath_re.match(text)
    if m:
        l1, n1, t1, l2, t2, l3, n3, ret = m.groups()
        return PatternSpec(
            nodes=(NodeSpec(l1, fix(n1)), NodeSpec(l2),
                   NodeSpec(l3, fix(n3))),
            rels=(t1, t2), return_index=int(ret) - 1)
    m = twohop_re.match(text)
    if m:
        l1, n1, t1, l2, t2, l3, ret = m.groups()
        return PatternSpec(
            nodes=(NodeSpec(l1, fix(n1)), NodeSpec(l2), NodeSpec(l3)),
            rels=(t1, t2), return_index=int(ret) - 1)
    m = onehop_re.match(text)
    if m:
        l1, n1, t1, l2, ret = m.groups()
        return PatternSpec(
            nodes=(NodeSpec(l1, fix(n1)), NodeSpec(l2)),
            rels=(t1,), return_index=int(ret) - 1)
    raise ValueError(f"not a reference template query: {text!r}")
