"""Expression algebra semantics — ports cases from the reference's
exprs_test.go (folding, negation, binding) and literals_test.go
(saturating casts)."""

from __future__ import annotations

import pytest

from iceberg_go_distributed_spark.iceberg import expressions as E
from iceberg_go_distributed_spark.iceberg import types as ty

SCHEMA = ty.Schema.of(
    0,
    ty.NestedField(1, "id", ty.LongType(), required=True),
    ty.NestedField(2, "name", ty.StringType()),
    ty.NestedField(3, "score", ty.FloatType()),
    ty.NestedField(4, "small", ty.IntegerType()),
    ty.NestedField(5, "ts", ty.TimestampType()),
)


def test_constant_folding():
    t, f = E.AlwaysTrue(), E.AlwaysFalse()
    p = E.equal("id", 1)
    assert E.and_(t, p) == p
    assert E.and_(f, p) == f
    assert E.or_(t, p) == t
    assert E.or_(f, p) == p
    assert E.not_(E.not_(p)) == p
    assert E.not_(t) == f


def test_negation_ops():
    assert E.negate_op(E.Operation.LT) == E.Operation.GT_EQ
    assert E.negate_op(E.Operation.IS_NULL) == E.Operation.NOT_NULL
    assert E.negate_op(E.Operation.IN) == E.Operation.NOT_IN
    assert E.negate_op(E.Operation.STARTS_WITH) == E.Operation.NOT_STARTS_WITH


def test_rewrite_not_de_morgan():
    p, q = E.equal("id", 1), E.equal("name", "x")
    e = E.Not(E.And(p, q))
    out = E.rewrite_not(e)
    assert isinstance(out, E.Or)
    assert out.left == p.negate() and out.right == q.negate()


def test_bind_simple():
    b = E.equal("id", 5).bind(SCHEMA)
    assert isinstance(b, E.BoundLiteralPredicate)
    assert b.term.field.field_id == 1
    assert b.literal.value == 5 and isinstance(b.literal.type, ty.LongType)


def test_bind_case_sensitivity():
    with pytest.raises(ValueError):
        E.equal("ID", 5).bind(SCHEMA, case_sensitive=True)
    b = E.equal("ID", 5).bind(SCHEMA, case_sensitive=False)
    assert isinstance(b, E.BoundLiteralPredicate)


def test_bind_required_null_checks():
    assert E.is_null("id").bind(SCHEMA) == E.AlwaysFalse()
    assert E.not_null("id").bind(SCHEMA) == E.AlwaysTrue()
    assert isinstance(E.is_null("name").bind(SCHEMA), E.BoundUnaryPredicate)


def test_bind_nan_requires_float():
    with pytest.raises(ValueError):
        E.is_nan("id").bind(SCHEMA)
    assert isinstance(E.is_nan("score").bind(SCHEMA), E.BoundUnaryPredicate)


def test_saturating_int32():
    # literals_test.go above-max/below-min semantics
    assert E.less_than("small", 1 << 40).bind(SCHEMA) == E.AlwaysTrue()
    assert E.greater_than("small", 1 << 40).bind(SCHEMA) == E.AlwaysFalse()
    assert E.equal("small", 1 << 40).bind(SCHEMA) == E.AlwaysFalse()
    assert E.not_equal("small", 1 << 40).bind(SCHEMA) == E.AlwaysTrue()
    assert E.less_than("small", -(1 << 40)).bind(SCHEMA) == E.AlwaysFalse()
    assert E.greater_than_or_equal("small", -(1 << 40)).bind(SCHEMA) == E.AlwaysTrue()


def test_in_degenerate():
    # predicates.go:55-81 — dedup, degenerate → Eq / AlwaysFalse
    assert E.is_in("id", []).bind(SCHEMA) == E.AlwaysFalse()
    b = E.is_in("id", [7]).bind(SCHEMA)
    assert isinstance(b, E.BoundLiteralPredicate) and b.op_ == E.Operation.EQ
    b2 = E.is_in("id", [7, 7, 8]).bind(SCHEMA)
    assert isinstance(b2, E.BoundSetPredicate) and b2.values == frozenset({7, 8})
    assert E.not_in("id", []).bind(SCHEMA) == E.AlwaysTrue()


def test_string_to_timestamp_bind():
    b = E.less_than("ts", "1995-01-01T00:00:00").bind(SCHEMA)
    assert isinstance(b, E.BoundLiteralPredicate)
    assert b.literal.value == 788918400000000  # µs since epoch


def test_row_evaluation():
    expr = E.and_(
        E.greater_than("id", 10).bind(SCHEMA),
        E.starts_with("name", "ab").bind(SCHEMA),
    )
    assert E.evaluate(expr, {"id": 11, "name": "abc"})
    assert not E.evaluate(expr, {"id": 11, "name": "xbc"})
    assert not E.evaluate(expr, {"id": 9, "name": "abc"})
    assert not E.evaluate(expr, {"id": None, "name": "abc"})


def test_evaluate_nan():
    e = E.is_nan("score").bind(SCHEMA)
    assert E.evaluate(e, {"score": float("nan")})
    assert not E.evaluate(e, {"score": 1.0})
    assert not E.evaluate(e, {"score": None})


def test_literal_increment_decrement():
    l = E.literal(5, ty.IntegerType())
    assert l.increment().value == 6 and l.decrement().value == 4
    with pytest.raises(TypeError):
        E.literal("a").increment()
