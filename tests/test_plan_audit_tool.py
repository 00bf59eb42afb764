"""tools/plan_audit.py: the duplicated-reference counter itself (no
Spark — the full-catalog sweep runs as a round gate, not in pytest)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from plan_audit import dup_count  # noqa: E402


def test_no_duplicates_counts_zero():
    plan = ("Join\n:- Relation [a#1L,b#2] parquet\n"
            "+- Relation [c#3L] parquet\n")
    assert dup_count(plan) == 0


def test_duplicated_relation_counted_per_extra_reference():
    plan = ("Union\n:- Relation [doc_id#1L,text#2] parquet\n"
            ":- Relation [doc_id#7L,text#8] parquet\n"
            ":- Relation [doc_id#9L,text#10] parquet\n")
    # three references to the same column set -> 2 duplicated
    assert dup_count(plan) == 2


def test_distinct_first_columns_not_conflated():
    plan = ("Join\n:- Relation [doc_id#1L] parquet\n"
            "+- Relation [vec_id#2L] parquet\n")
    assert dup_count(plan) == 0


def test_same_first_column_different_tables_not_conflated():
    """r10 advice false-positive class: two DISTINCT relations whose
    FIRST column shares a name are not duplicates — keying is by the
    full sorted column-name set."""
    plan = ("Join\n:- Relation [id#1L,text#2] parquet\n"
            "+- Relation [id#3L,embedding#4] parquet\n")
    assert dup_count(plan) == 0


def test_column_order_does_not_split_the_key():
    # the key is the SORTED set: projection order must not matter
    plan = ("Join\n:- Relation [b#1,a#2L] parquet\n"
            "+- Relation [a#3L,b#4] parquet\n")
    assert dup_count(plan) == 1


def test_pruned_rescan_merges_into_wider_scan():
    """r11 advice false-negative class: a raw read plus an
    aggregate-subtree read of the SAME table prune to different column
    sets — the subset is the same table re-scanned."""
    plan = ("Join\n:- Relation [doc_id#1L,text#2,lang#3] parquet\n"
            "+- Relation [doc_id#7L] parquet\n")
    assert dup_count(plan) == 1


def test_ambiguous_subset_stands_alone():
    """A pruned set that fits under TWO distinct wider tables (shared
    key column) cannot be attributed — counted as its own table, not a
    duplicate of either."""
    plan = ("Join\n:- Relation [doc_id#1L,text#2] parquet\n"
            ":- Relation [doc_id#3L,embedding#4] parquet\n"
            "+- Relation [doc_id#9L] parquet\n")
    assert dup_count(plan) == 0


def test_exprid_suffix_stripped():
    # same base column, different expression ids -> same relation
    plan = ("Join\n:- Relation [l_orderkey#12L,l_suppkey#13L] parquet\n"
            "+- Relation [l_orderkey#99L,l_suppkey#100L] parquet\n")
    assert dup_count(plan) == 1
