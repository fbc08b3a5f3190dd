"""Port of the reference predicate unit tests (src/cmp.rs:102-190)."""

from shortcut_spark.cmp import Bound, Comparison, Condition, Value, between, col_eq, eq


def test_value_eval():  # src/cmp.rs:106-112
    row = ["a", "b"]
    assert not Value.column(0).is_column is False  # column ref
    assert Value.new("a").payload == "a"
    c = Condition(0, Comparison.equal(Value.new("a")))
    assert c.matches(row)


def test_const_and_column_equality():  # src/cmp.rs:114-122
    row = ["a", "b"]
    assert eq(0, "a").matches(row)
    assert not eq(0, "b").matches(row)
    assert not col_eq(0, 1).matches(row)
    assert col_eq(0, 1).matches(["x", "x"])


def test_borrowed_values():  # src/cmp.rs:124-132 — Cow machinery, Python no-op
    v = "a"
    assert Value.using(v).payload == "a"
    assert Value.new(v) == Value.using(v)


def test_condition_row_matrix():  # src/cmp.rs:144-173
    rows = [["a", "x1"], ["a", "x2"], ["b", "x3"]]
    c0a = eq(0, "a")
    assert [c0a.matches(r) for r in rows] == [True, True, False]
    c1x2 = eq(1, "x2")
    assert [c1x2.matches(r) for r in rows] == [False, True, False]
    cc = col_eq(1, 0)
    assert [cc.matches(r) for r in rows] == [False, False, False]


def test_display():  # src/cmp.rs:175-189
    assert str(eq(0, "a")) == "[0] = a"
    assert str(col_eq(0, 1)) == "[0] = [1]"
    assert str(eq("c_name", "bob")) == "[c_name] = bob"


def test_bounds_matching():  # src/idx.rs:216-229 semantics, driver-side
    c = between(0, Bound.included(3), Bound.excluded(7))
    assert c.matches([3])
    assert c.matches([6])
    assert not c.matches([7])
    assert not c.matches([2])
    unb = between(0, None, None)
    assert unb.matches([100])


def test_named_columns():
    row = ["bob", "smith"]
    names = ["first", "last"]
    assert eq("first", "bob").matches(row, names)
    assert col_eq("first", "last").matches(["x", "x"], names)


def test_matches_null_mirrors_sql_semantics():
    """matches() must agree with the compiled SQL path: comparisons with
    null operands never match (None == None is NOT a match)."""
    from shortcut_spark import between, col_eq, eq

    assert not eq(0, None).matches([None, "x"])
    assert not eq(0, "a").matches([None, "x"])
    assert not eq(0, None).matches(["a", "x"])
    assert not col_eq(0, 1).matches([None, None])
    assert not col_eq(0, 1).matches(["a", None])
    assert not between(0, 1, 5).matches([None, "x"])
    assert eq(0, "a").matches(["a", "x"])


def test_unknown_column_raises_eagerly():
    """A condition naming a column the table lacks must fail with a clear
    ValueError when compiled (to_column/resolve), not surface as a lazy
    Spark AnalysisException mid-job — the Store.index error convention."""
    import pytest

    names = ["first", "last"]
    with pytest.raises(ValueError, match="no such column 'nope'"):
        eq("nope", "x").to_column(names)
    with pytest.raises(ValueError, match="no such column 'nope'"):
        col_eq("first", "nope").to_column(names)
    with pytest.raises(ValueError, match="no such column 'nope'"):
        between("nope", 1, 5).to_column(names)
    # positional out-of-range keeps the reference's slice-panic shape
    with pytest.raises(IndexError):
        eq(9, "x").to_column(names)
