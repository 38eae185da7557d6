"""Generation diff (operators/diff.py): added/removed/changed
classification, null-transition correctness (the hash-null-skip trap),
duplicate-key multiset semantics, and the TableStore generation path.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pedsnetdcc_spark.operators.diff import (
    diff_previous_generation,
    diff_summary,
    diff_tables,
)


@pytest.fixture()
def versions(spark):
    old = spark.createDataFrame(
        [
            (1, "a", 10),
            (2, "b", 20),
            (3, "c", None),   # null -> value must read as changed
            (4, "d", 40),     # removed
            (5, "e", 50),     # value -> null must read as changed
            (6, "f", 60),     # unchanged
        ],
        "id long, name string, v int",
    )
    new = spark.createDataFrame(
        [
            (1, "a", 10),      # unchanged
            (2, "B", 20),      # changed (name)
            (3, "c", 30),      # changed (null -> 30)
            (5, "e", None),    # changed (50 -> null)
            (6, "f", 60),      # unchanged
            (7, "g", 70),      # added
        ],
        "id long, name string, v int",
    )
    return new, old


def test_diff_classification(spark, versions):
    new, old = versions
    got = {r["id"]: r["change"] for r in diff_tables(new, old, ["id"]).collect()}
    assert got == {2: "changed", 3: "changed", 4: "removed",
                   5: "changed", 7: "added"}
    summ = {r["change"]: r["n_keys"] for r in
            diff_summary(diff_tables(new, old, ["id"])).collect()}
    assert summ == {"added": 1, "removed": 1, "changed": 3}


def test_diff_null_value_not_confused_with_absent(spark, versions):
    """(a, NULL) vs (a,) signature collision guard: a row whose only
    edit is value<->null MUST be 'changed' (Spark's hash skips null
    inputs; the is-null flags disambiguate)."""
    new, old = versions
    got = {r["id"]: r["change"] for r in diff_tables(new, old, ["id"]).collect()}
    assert got[3] == "changed" and got[5] == "changed"


def test_diff_compare_cols_subset(spark, versions):
    """Restricting compare_cols ignores edits outside the subset."""
    new, old = versions
    got = {
        r["id"]: r["change"]
        for r in diff_tables(new, old, ["id"], compare_cols=["v"]).collect()
    }
    assert 2 not in got  # only `name` changed for key 2
    assert got == {3: "changed", 4: "removed", 5: "changed", 7: "added"}


def test_diff_duplicate_keys_multiset(spark):
    """Duplicate keys compare as multisets: same rows in a different
    order are unchanged; a duplicated-count change is 'changed'."""
    old = spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "z")], "id long, s string"
    )
    new_reordered = spark.createDataFrame(
        [(1, "y"), (1, "x"), (2, "z")], "id long, s string"
    )
    assert diff_tables(new_reordered, old, ["id"]).count() == 0
    new_dup = spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "z"), (2, "z")], "id long, s string"
    )
    got = {r["id"]: r["change"] for r in diff_tables(new_dup, old, ["id"]).collect()}
    assert got == {2: "changed"}


def test_diff_duplicate_keys_even_multiplicity(spark):
    """Equal counts with even multiplicities must still read 'changed':
    an XOR fold cancels {x,x,y,y} vs {y,y,y,y} to equal (0) signatures;
    the SUM fold does not."""
    old = spark.createDataFrame(
        [(1, "x"), (1, "x"), (1, "y"), (1, "y")], "id long, s string"
    )
    new = spark.createDataFrame(
        [(1, "y"), (1, "y"), (1, "y"), (1, "y")], "id long, s string"
    )
    got = {r["id"]: r["change"] for r in diff_tables(new, old, ["id"]).collect()}
    assert got == {1: "changed"}
    # and the symmetric pair-swap case from the review: (x,x) -> (y,y)
    old2 = spark.createDataFrame([(7, "x"), (7, "x")], "id long, s string")
    new2 = spark.createDataFrame([(7, "y"), (7, "y")], "id long, s string")
    got2 = {r["id"]: r["change"] for r in diff_tables(new2, old2, ["id"]).collect()}
    assert got2 == {7: "changed"}


def test_diff_previous_generation_via_store(spark, tmp_path):
    from pedsnetdcc_spark.sources.io import TableStore

    store = TableStore(str(tmp_path / "store"))
    v1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    store.stage(v1, "t")
    store.publish()
    v2 = spark.createDataFrame([(2, "B"), (3, "c")], "id long, s string")
    store2 = TableStore(str(tmp_path / "store"), _txid="tx2")
    store2.stage(v2, "t")
    store2.publish()
    got = {
        r["id"]: r["change"]
        for r in diff_previous_generation(spark, store2, "t", ["id"]).collect()
    }
    assert got == {1: "removed", 2: "changed", 3: "added"}


def test_diff_cli_verb(spark, tmp_path, capsys):
    import json

    from pedsnetdcc_spark.cli import main
    from pedsnetdcc_spark.sources.io import TableStore

    root = str(tmp_path / "store")
    s1 = TableStore(root)
    s1.stage(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string"), "t"
    )
    s1.publish()
    s2 = TableStore(root, _txid="tx2")
    s2.stage(
        spark.createDataFrame([(2, "B"), (3, "c")], "id long, s string"), "t"
    )
    s2.publish()
    assert main(["diff", "-o", root, "--table", "t", "--keys", "id"]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep == {
        "table": "t",
        "changes": {"added": 1, "removed": 1, "changed": 1},
    }

    keys_out = str(tmp_path / "worklist")
    assert main([
        "diff", "-o", root, "--table", "t", "--keys", "id",
        "--out-keys", keys_out,
    ]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["keys_out"] == keys_out
    back = {
        (r["id"], r["change"])
        for r in spark.read.parquet(keys_out).collect()
    }
    assert back == {(1, "removed"), (2, "changed"), (3, "added")}


def test_diff_key_only_table(spark):
    """A table that is ALL key (no compare columns) still classifies
    added/removed, and duplicate-count changes, from presence alone."""
    old = spark.createDataFrame([(1,), (2,), (3,), (3,)], "id long")
    new = spark.createDataFrame([(2,), (3,), (4,)], "id long")
    got = {r["id"]: r["change"] for r in diff_tables(new, old, ["id"]).collect()}
    assert got == {1: "removed", 3: "changed", 4: "added"}


def test_diff_property_random_edits(spark):
    """Property: for ANY pair of versions drawn as random (key →
    (name, value-or-null)) maps, diff_tables matches the obvious
    python-dict classification.  Catches signature collisions (nulls,
    empty strings) and presence-test mistakes wholesale."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    val = st.one_of(st.none(), st.integers(0, 3))
    name = st.sampled_from(["a", "b"])
    version = st.dictionaries(
        st.integers(0, 9), st.tuples(name, val), max_size=10
    )

    @settings(max_examples=25, deadline=None)
    @given(version, version)
    def check(old, new):
        def df(d):
            rows = [(k, n, v) for k, (n, v) in d.items()] or None
            return spark.createDataFrame(
                rows or [(None, None, None)], "id long, name string, v int"
            ).where(F.lit(rows is not None))

        got = {
            r["id"]: r["change"]
            for r in diff_tables(df(new), df(old), ["id"]).collect()
        }
        want = {}
        for k in set(old) | set(new):
            if k not in old:
                want[k] = "added"
            elif k not in new:
                want[k] = "removed"
            elif old[k] != new[k]:
                want[k] = "changed"
        assert got == want, (old, new, got, want)

    check()


def test_diff_property_duplicate_key_multisets(spark):
    """Property over MULTISETS: versions drawn as row lists with
    duplicate keys; a key in both sides is 'changed' iff the multisets
    of its rows differ.  This is exactly the class the XOR fold got
    wrong (even multiplicities cancel); the SUM fold must match the
    Counter reference on every draw."""
    from collections import Counter

    from hypothesis import given, settings
    from hypothesis import strategies as st

    row = st.tuples(
        st.integers(0, 4),                      # key
        st.one_of(st.none(), st.integers(0, 2)) # value (nullable)
    )
    version = st.lists(row, max_size=12)

    @settings(max_examples=25, deadline=None)
    @given(version, version)
    def check(old, new):
        def df(rows):
            return spark.createDataFrame(
                rows or [(None, None)], "id long, v int"
            ).where(F.lit(bool(rows)))

        got = {
            r["id"]: r["change"]
            for r in diff_tables(df(new), df(old), ["id"]).collect()
        }
        by_key = lambda rows: {
            k: Counter(v for kk, v in rows if kk == k)
            for k in {kk for kk, _ in rows}
        }
        o, n = by_key(old), by_key(new)
        want = {}
        for k in set(o) | set(n):
            if k not in o:
                want[k] = "added"
            elif k not in n:
                want[k] = "removed"
            elif o[k] != n[k]:
                want[k] = "changed"
        assert got == want, (old, new, got, want)

    check()


def test_diff_plan_is_jvm_side(spark, versions):
    new, old = versions
    plan = (
        diff_tables(new, old, ["id"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
