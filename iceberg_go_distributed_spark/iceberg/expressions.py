"""Expression algebra: unbound/bound predicates, literals with
saturating casts, binding, NOT-rewrite, row evaluation, and compilation
to Spark Columns.

Ports the semantics of the reference's exprs.go:130-313 (constant-fold
constructors), predicates.go (operation taxonomy), literals.go:231-361
(AboveMax/BelowMin saturation on bind), visitors.go:150-412 (BindExpr,
RewriteNotExpr) and visitors.go:189-381 (ExpressionEvaluator over
partition tuples). Pure Python — the metadata plane runs without Spark;
`to_spark_column` is the bridge for residual row filters.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from decimal import Decimal
from enum import Enum
from typing import Any, Iterable, Optional, Sequence

from .conversions import _canonicalize
from .types import (
    BinaryType,
    BooleanType,
    DateType,
    DecimalType,
    DoubleType,
    FixedType,
    FloatType,
    IcebergType,
    IntegerType,
    LongType,
    NestedField,
    Schema,
    StringType,
    TimestampType,
    TimestampTzType,
    TimeType,
    UUIDType,
)


class Operation(Enum):
    TRUE = "true"
    FALSE = "false"
    IS_NULL = "is_null"
    NOT_NULL = "not_null"
    IS_NAN = "is_nan"
    NOT_NAN = "not_nan"
    LT = "lt"
    LT_EQ = "lt_eq"
    GT = "gt"
    GT_EQ = "gt_eq"
    EQ = "eq"
    NOT_EQ = "not_eq"
    IN = "in"
    NOT_IN = "not_in"
    STARTS_WITH = "starts_with"
    NOT_STARTS_WITH = "not_starts_with"
    AND = "and"
    OR = "or"
    NOT = "not"


_NEGATIONS = {
    Operation.TRUE: Operation.FALSE,
    Operation.FALSE: Operation.TRUE,
    Operation.IS_NULL: Operation.NOT_NULL,
    Operation.NOT_NULL: Operation.IS_NULL,
    Operation.IS_NAN: Operation.NOT_NAN,
    Operation.NOT_NAN: Operation.IS_NAN,
    Operation.LT: Operation.GT_EQ,
    Operation.LT_EQ: Operation.GT,
    Operation.GT: Operation.LT_EQ,
    Operation.GT_EQ: Operation.LT,
    Operation.EQ: Operation.NOT_EQ,
    Operation.NOT_EQ: Operation.EQ,
    Operation.IN: Operation.NOT_IN,
    Operation.NOT_IN: Operation.IN,
    Operation.STARTS_WITH: Operation.NOT_STARTS_WITH,
    Operation.NOT_STARTS_WITH: Operation.STARTS_WITH,
}


def negate_op(op: Operation) -> Operation:
    """ref exprs.go:64-97 (Operation.Negate)."""
    return _NEGATIONS[op]


# ------------------------------------------------------------------ literals

class _Sentinel:
    def __init__(self, name: str):
        self.name = name

    def __repr__(self) -> str:
        return self.name


ABOVE_MAX = _Sentinel("ABOVE_MAX")
BELOW_MIN = _Sentinel("BELOW_MIN")

_INT32_MAX, _INT32_MIN = (1 << 31) - 1, -(1 << 31)
_INT64_MAX, _INT64_MIN = (1 << 63) - 1, -(1 << 63)
_FLOAT32_MAX = 3.4028234663852886e38


@dataclass(frozen=True)
class Literal:
    """A typed literal. `value` is the canonical internal repr
    (epoch days/µs ints for date/timestamps)."""

    value: Any
    type: IcebergType

    def to(self, target: IcebergType):
        """Cast with saturation — ref literals.go:426-507 (To) and
        :231-361 (above-max/below-min markers). Returns Literal,
        ABOVE_MAX, or BELOW_MIN."""
        v, t = self.value, self.type
        if t == target:
            return self
        if isinstance(target, IntegerType):
            if isinstance(t, (IntegerType, LongType)):
                if v > _INT32_MAX:
                    return ABOVE_MAX
                if v < _INT32_MIN:
                    return BELOW_MIN
                return Literal(int(v), target)
        if isinstance(target, LongType):
            if isinstance(t, (IntegerType, LongType)):
                return Literal(int(v), target)
        if isinstance(target, FloatType):
            if isinstance(t, (IntegerType, LongType, FloatType, DoubleType)):
                fv = float(v)
                if fv > _FLOAT32_MAX:
                    return ABOVE_MAX
                if fv < -_FLOAT32_MAX:
                    return BELOW_MIN
                return Literal(fv, target)
            if isinstance(t, DecimalType):
                return Literal(float(v), target)
        if isinstance(target, DoubleType):
            if isinstance(t, (IntegerType, LongType, FloatType, DoubleType)):
                return Literal(float(v), target)
            if isinstance(t, DecimalType):
                return Literal(float(v), target)
        if isinstance(target, DecimalType):
            if isinstance(t, (IntegerType, LongType)):
                return Literal(Decimal(v).scaleb(0), target)
            if isinstance(t, DecimalType):
                if target.scale == t.scale:
                    return Literal(v, target)
                return None  # scale change not allowed on bind
            if isinstance(t, StringType):
                return Literal(Decimal(str(v)), target)
        if isinstance(target, (DateType, TimeType, TimestampType, TimestampTzType)):
            if isinstance(t, StringType):
                return _parse_datetime_literal(str(v), target)
            if isinstance(t, (IntegerType, LongType)):
                return Literal(int(v), target)
            if isinstance(t, DateType) and isinstance(target, (TimestampType, TimestampTzType)):
                return Literal(int(v) * 86_400_000_000, target)
            if isinstance(t, (TimestampType, TimestampTzType)) and isinstance(target, DateType):
                return Literal(int(v) // 86_400_000_000, target)
            if isinstance(t, (TimestampType, TimestampTzType)):
                return Literal(int(v), target)
        if isinstance(target, StringType):
            return Literal(str(v), target)
        if isinstance(target, (BinaryType, FixedType)) and isinstance(t, (BinaryType, FixedType, StringType)):
            b = v.encode() if isinstance(v, str) else bytes(v)
            if isinstance(target, FixedType) and len(b) != target.length:
                return None
            return Literal(b, target)
        if isinstance(target, UUIDType) and isinstance(t, StringType):
            import uuid

            return Literal(uuid.UUID(str(v)), target)
        if isinstance(target, BooleanType) and isinstance(t, BooleanType):
            return self
        return None

    def increment(self) -> "Literal":
        """ref literals.go:464-478 — boundary math for projections
        (decimals step by one unscaled unit, as the reference does)."""
        if isinstance(self.type, (IntegerType, LongType, DateType, TimeType, TimestampType, TimestampTzType)):
            return Literal(self.value + 1, self.type)
        if isinstance(self.type, DecimalType):
            step = Decimal(1).scaleb(-self.type.scale)
            return Literal(self.value + step, self.type)
        raise TypeError(f"cannot increment {self.type}")

    def decrement(self) -> "Literal":
        if isinstance(self.type, (IntegerType, LongType, DateType, TimeType, TimestampType, TimestampTzType)):
            return Literal(self.value - 1, self.type)
        if isinstance(self.type, DecimalType):
            step = Decimal(1).scaleb(-self.type.scale)
            return Literal(self.value - step, self.type)
        raise TypeError(f"cannot decrement {self.type}")


def _parse_datetime_literal(s: str, target: IcebergType):
    from datetime import date, datetime, time

    if isinstance(target, DateType):
        return Literal((date.fromisoformat(s) - date(1970, 1, 1)).days, target)
    if isinstance(target, TimeType):
        t = time.fromisoformat(s)
        return Literal(
            ((t.hour * 60 + t.minute) * 60 + t.second) * 1_000_000 + t.microsecond, target
        )
    dt = datetime.fromisoformat(s)
    from .conversions import datetime_to_micros

    return Literal(datetime_to_micros(dt), target)


def literal(v: Any, t: Optional[IcebergType] = None) -> Literal:
    """Infer a Literal from a Python value (ref literals.go:82-112)."""
    if t is not None:
        return Literal(_canonicalize(t, v), t)
    if isinstance(v, bool):
        return Literal(v, BooleanType())
    if isinstance(v, int):
        return Literal(v, IntegerType() if _INT32_MIN <= v <= _INT32_MAX else LongType())
    if isinstance(v, float):
        return Literal(v, DoubleType())
    if isinstance(v, str):
        return Literal(v, StringType())
    if isinstance(v, bytes):
        return Literal(v, BinaryType())
    if isinstance(v, Decimal):
        exp = -v.as_tuple().exponent
        return Literal(v, DecimalType(max(len(v.as_tuple().digits), exp), max(exp, 0)))
    from datetime import date, datetime

    if isinstance(v, datetime):
        from .conversions import datetime_to_micros

        return Literal(datetime_to_micros(v), TimestampType())
    if isinstance(v, date):
        from .conversions import date_to_days

        return Literal(date_to_days(v), DateType())
    raise TypeError(f"cannot infer literal type for {v!r}")


# ---------------------------------------------------------------- expression

class Expression:
    op: Operation

    def negate(self) -> "Expression":
        raise NotImplementedError

    def __and__(self, other: "Expression") -> "Expression":
        return and_(self, other)

    def __or__(self, other: "Expression") -> "Expression":
        return or_(self, other)

    def __invert__(self) -> "Expression":
        return not_(self)


class AlwaysTrue(Expression):
    op = Operation.TRUE

    def negate(self) -> Expression:
        return AlwaysFalse()

    def __eq__(self, o) -> bool:
        return isinstance(o, AlwaysTrue)

    def __hash__(self):
        return hash("true")

    def __repr__(self) -> str:
        return "AlwaysTrue()"


class AlwaysFalse(Expression):
    op = Operation.FALSE

    def negate(self) -> Expression:
        return AlwaysTrue()

    def __eq__(self, o) -> bool:
        return isinstance(o, AlwaysFalse)

    def __hash__(self):
        return hash("false")

    def __repr__(self) -> str:
        return "AlwaysFalse()"


@dataclass(frozen=True)
class And(Expression):
    left: Expression
    right: Expression
    op = Operation.AND

    def negate(self) -> Expression:
        return or_(self.left.negate(), self.right.negate())


@dataclass(frozen=True)
class Or(Expression):
    left: Expression
    right: Expression
    op = Operation.OR

    def negate(self) -> Expression:
        return and_(self.left.negate(), self.right.negate())


@dataclass(frozen=True)
class Not(Expression):
    child: Expression
    op = Operation.NOT

    def negate(self) -> Expression:
        return self.child


def and_(*exprs: Expression) -> Expression:
    """Constant-folding And — ref exprs.go:197-223."""
    out: Optional[Expression] = None
    for e in exprs:
        if isinstance(e, AlwaysFalse):
            return AlwaysFalse()
        if isinstance(e, AlwaysTrue):
            continue
        out = e if out is None else And(out, e)
    return out if out is not None else AlwaysTrue()


def or_(*exprs: Expression) -> Expression:
    """ref exprs.go:258-284."""
    out: Optional[Expression] = None
    for e in exprs:
        if isinstance(e, AlwaysTrue):
            return AlwaysTrue()
        if isinstance(e, AlwaysFalse):
            continue
        out = e if out is None else Or(out, e)
    return out if out is not None else AlwaysFalse()


def not_(e: Expression) -> Expression:
    """ref exprs.go:163-183 (double-negation / constant folding)."""
    if isinstance(e, Not):
        return e.child
    if isinstance(e, AlwaysTrue):
        return AlwaysFalse()
    if isinstance(e, AlwaysFalse):
        return AlwaysTrue()
    return Not(e)


# ---------------------------------------------------------------- predicates

_UNARY_OPS = {Operation.IS_NULL, Operation.NOT_NULL, Operation.IS_NAN, Operation.NOT_NAN}
_LITERAL_OPS = {
    Operation.LT,
    Operation.LT_EQ,
    Operation.GT,
    Operation.GT_EQ,
    Operation.EQ,
    Operation.NOT_EQ,
    Operation.STARTS_WITH,
    Operation.NOT_STARTS_WITH,
}
_SET_OPS = {Operation.IN, Operation.NOT_IN}


@dataclass(frozen=True)
class UnboundPredicate(Expression):
    op_: Operation
    term: str  # column reference by name (ref exprs.go:388 Reference)
    literals: tuple = ()

    @property
    def op(self) -> Operation:  # type: ignore[override]
        return self.op_

    def negate(self) -> Expression:
        return UnboundPredicate(negate_op(self.op_), self.term, self.literals)

    def bind(self, schema: Schema, case_sensitive: bool = True) -> Expression:
        """ref exprs.go:388-412 (Reference.Bind) + per-op bind logic."""
        field = schema.find_field(self.term, case_sensitive)
        if field is None:
            raise ValueError(f"cannot bind {self.term!r}: not in schema")
        ref = BoundReference(field)
        op = self.op_

        if op in _UNARY_OPS:
            if op == Operation.IS_NULL and field.required:
                return AlwaysFalse()
            if op == Operation.NOT_NULL and field.required:
                return AlwaysTrue()
            if op in (Operation.IS_NAN, Operation.NOT_NAN) and not isinstance(
                field.field_type, (FloatType, DoubleType)
            ):
                raise ValueError(f"{op.value} requires float/double, got {field.field_type}")
            return BoundUnaryPredicate(op, ref)

        if op in _LITERAL_OPS:
            lit = literal(self.literals[0]) if not isinstance(self.literals[0], Literal) else self.literals[0]
            cast = lit.to(field.field_type)
            if cast is None:
                raise ValueError(
                    f"cannot cast literal {lit.value!r} to {field.field_type} for {self.term}"
                )
            if cast is ABOVE_MAX:
                # col <op> (value above type max) — ref literals.go:231-361
                return {
                    Operation.LT: AlwaysTrue(),
                    Operation.LT_EQ: AlwaysTrue(),
                    Operation.GT: AlwaysFalse(),
                    Operation.GT_EQ: AlwaysFalse(),
                    Operation.EQ: AlwaysFalse(),
                    Operation.NOT_EQ: AlwaysTrue(),
                }[op]
            if cast is BELOW_MIN:
                return {
                    Operation.LT: AlwaysFalse(),
                    Operation.LT_EQ: AlwaysFalse(),
                    Operation.GT: AlwaysTrue(),
                    Operation.GT_EQ: AlwaysTrue(),
                    Operation.EQ: AlwaysFalse(),
                    Operation.NOT_EQ: AlwaysTrue(),
                }[op]
            return BoundLiteralPredicate(op, ref, cast)

        if op in _SET_OPS:
            lits = []
            for l in self.literals:
                cast = (l if isinstance(l, Literal) else literal(l)).to(field.field_type)
                if cast is None:
                    raise ValueError(
                        f"cannot cast literal {l!r} to {field.field_type} for {self.term}"
                    )
                lits.append(cast)  # ABOVE_MAX/BELOW_MIN sentinels drop below
            kept = tuple(
                sorted(
                    {l.value for l in lits if isinstance(l, Literal)},
                    key=lambda v: (str(type(v)), str(v)),
                )
            )
            if op == Operation.IN:
                if not kept:
                    return AlwaysFalse()
                if len(kept) == 1:
                    return BoundLiteralPredicate(
                        Operation.EQ, ref, Literal(kept[0], field.field_type)
                    )
                return BoundSetPredicate(op, ref, frozenset(kept))
            else:  # NOT_IN
                if not kept:
                    return AlwaysTrue()
                if len(kept) == 1:
                    return BoundLiteralPredicate(
                        Operation.NOT_EQ, ref, Literal(kept[0], field.field_type)
                    )
                return BoundSetPredicate(op, ref, frozenset(kept))

        raise ValueError(f"cannot bind op {op}")


@dataclass(frozen=True)
class BoundReference:
    field: NestedField

    @property
    def name(self) -> str:
        return self.field.name

    @property
    def type(self) -> IcebergType:
        return self.field.field_type


class BoundPredicate(Expression):
    term: BoundReference


@dataclass(frozen=True)
class BoundUnaryPredicate(BoundPredicate):
    op_: Operation
    term: BoundReference

    @property
    def op(self) -> Operation:  # type: ignore[override]
        return self.op_

    def negate(self) -> Expression:
        return BoundUnaryPredicate(negate_op(self.op_), self.term)


@dataclass(frozen=True)
class BoundLiteralPredicate(BoundPredicate):
    op_: Operation
    term: BoundReference
    literal: Literal

    @property
    def op(self) -> Operation:  # type: ignore[override]
        return self.op_

    def negate(self) -> Expression:
        return BoundLiteralPredicate(negate_op(self.op_), self.term, self.literal)


@dataclass(frozen=True)
class BoundSetPredicate(BoundPredicate):
    op_: Operation
    term: BoundReference
    values: frozenset

    @property
    def op(self) -> Operation:  # type: ignore[override]
        return self.op_

    def negate(self) -> Expression:
        return BoundSetPredicate(negate_op(self.op_), self.term, self.values)


# ------------------------------------------------------- public constructors

def ref(name: str) -> str:
    return name


def is_null(name: str) -> UnboundPredicate:
    return UnboundPredicate(Operation.IS_NULL, name)


def not_null(name: str) -> UnboundPredicate:
    return UnboundPredicate(Operation.NOT_NULL, name)


def is_nan(name: str) -> UnboundPredicate:
    return UnboundPredicate(Operation.IS_NAN, name)


def not_nan(name: str) -> UnboundPredicate:
    return UnboundPredicate(Operation.NOT_NAN, name)


def equal(name: str, v: Any) -> UnboundPredicate:
    return UnboundPredicate(Operation.EQ, name, (v,))


def not_equal(name: str, v: Any) -> UnboundPredicate:
    return UnboundPredicate(Operation.NOT_EQ, name, (v,))


def less_than(name: str, v: Any) -> UnboundPredicate:
    return UnboundPredicate(Operation.LT, name, (v,))


def less_than_or_equal(name: str, v: Any) -> UnboundPredicate:
    return UnboundPredicate(Operation.LT_EQ, name, (v,))


def greater_than(name: str, v: Any) -> UnboundPredicate:
    return UnboundPredicate(Operation.GT, name, (v,))


def greater_than_or_equal(name: str, v: Any) -> UnboundPredicate:
    return UnboundPredicate(Operation.GT_EQ, name, (v,))


def is_in(name: str, vs: Iterable[Any]) -> UnboundPredicate:
    return UnboundPredicate(Operation.IN, name, tuple(vs))


def not_in(name: str, vs: Iterable[Any]) -> UnboundPredicate:
    return UnboundPredicate(Operation.NOT_IN, name, tuple(vs))


def starts_with(name: str, v: str) -> UnboundPredicate:
    return UnboundPredicate(Operation.STARTS_WITH, name, (v,))


def not_starts_with(name: str, v: str) -> UnboundPredicate:
    return UnboundPredicate(Operation.NOT_STARTS_WITH, name, (v,))


# ------------------------------------------------------------------ visitors

def bind_expr(expr: Expression, schema: Schema, case_sensitive: bool = True) -> Expression:
    """ref visitors.go:150-187 (BindExpr)."""
    if isinstance(expr, (AlwaysTrue, AlwaysFalse)):
        return expr
    if isinstance(expr, And):
        return and_(
            bind_expr(expr.left, schema, case_sensitive),
            bind_expr(expr.right, schema, case_sensitive),
        )
    if isinstance(expr, Or):
        return or_(
            bind_expr(expr.left, schema, case_sensitive),
            bind_expr(expr.right, schema, case_sensitive),
        )
    if isinstance(expr, Not):
        return not_(bind_expr(expr.child, schema, case_sensitive))
    if isinstance(expr, UnboundPredicate):
        return expr.bind(schema, case_sensitive)
    if isinstance(expr, BoundPredicate):
        return expr
    raise TypeError(f"cannot bind {expr!r}")


def rewrite_not(expr: Expression) -> Expression:
    """Push NOT down via De Morgan — ref visitors.go:384-412."""
    if isinstance(expr, Not):
        return rewrite_not(expr.child.negate())
    if isinstance(expr, And):
        return and_(rewrite_not(expr.left), rewrite_not(expr.right))
    if isinstance(expr, Or):
        return or_(rewrite_not(expr.left), rewrite_not(expr.right))
    return expr


def extract_field_names(expr: Expression) -> set[str]:
    """ref visitors.go:415-462 (ExtractFieldIDs, by name here)."""
    if isinstance(expr, (And, Or)):
        return extract_field_names(expr.left) | extract_field_names(expr.right)
    if isinstance(expr, Not):
        return extract_field_names(expr.child)
    if isinstance(expr, UnboundPredicate):
        return {expr.term}
    if isinstance(expr, BoundPredicate):
        return {expr.term.name}
    return set()


def _cmp_values(a: Any, b: Any) -> int:
    if a == b:
        return 0
    return -1 if a < b else 1


def evaluate(expr: Expression, row: dict) -> bool:
    """Row-level evaluation of a bound expression over a dict (used on
    partition tuples) — ref visitors.go:189-381."""
    if isinstance(expr, AlwaysTrue):
        return True
    if isinstance(expr, AlwaysFalse):
        return False
    if isinstance(expr, And):
        return evaluate(expr.left, row) and evaluate(expr.right, row)
    if isinstance(expr, Or):
        return evaluate(expr.left, row) or evaluate(expr.right, row)
    if isinstance(expr, Not):
        return not evaluate(expr.child, row)
    if isinstance(expr, BoundUnaryPredicate):
        v = row.get(expr.term.name)
        if expr.op_ == Operation.IS_NULL:
            return v is None
        if expr.op_ == Operation.NOT_NULL:
            return v is not None
        if expr.op_ == Operation.IS_NAN:
            return v is not None and isinstance(v, float) and math.isnan(v)
        if expr.op_ == Operation.NOT_NAN:
            return not (v is not None and isinstance(v, float) and math.isnan(v))
    if isinstance(expr, BoundLiteralPredicate):
        v = row.get(expr.term.name)
        if v is None:
            return False
        lv = expr.literal.value
        op = expr.op_
        if op == Operation.EQ:
            return v == lv
        if op == Operation.NOT_EQ:
            return v != lv
        if op == Operation.LT:
            return v < lv
        if op == Operation.LT_EQ:
            return v <= lv
        if op == Operation.GT:
            return v > lv
        if op == Operation.GT_EQ:
            return v >= lv
        if op == Operation.STARTS_WITH:
            return str(v).startswith(str(lv))
        if op == Operation.NOT_STARTS_WITH:
            return not str(v).startswith(str(lv))
    if isinstance(expr, BoundSetPredicate):
        v = row.get(expr.term.name)
        if v is None:
            return False
        if expr.op_ == Operation.IN:
            return v in expr.values
        return v not in expr.values
    raise TypeError(f"cannot evaluate {expr!r}")


def compile_evaluator(expr: Expression):
    """Compile a bound expression into a closure tree returning the same
    verdicts as evaluate(row). The planner evaluates the projected
    filter once per manifest entry's partition tuple; walking the
    expression per row (isinstance dispatch, op_ chains) is per-entry
    hot-loop work — the walk happens once here, at scan construction."""
    if isinstance(expr, AlwaysTrue):
        return lambda row: True
    if isinstance(expr, AlwaysFalse):
        return lambda row: False
    if isinstance(expr, And):
        left, right = compile_evaluator(expr.left), compile_evaluator(expr.right)
        return lambda row: left(row) and right(row)
    if isinstance(expr, Or):
        left, right = compile_evaluator(expr.left), compile_evaluator(expr.right)
        return lambda row: left(row) or right(row)
    if isinstance(expr, Not):
        child = compile_evaluator(expr.child)
        return lambda row: not child(row)
    if isinstance(expr, BoundUnaryPredicate):
        name = expr.term.name
        op = expr.op_
        if op == Operation.IS_NULL:
            return lambda row: row.get(name) is None
        if op == Operation.NOT_NULL:
            return lambda row: row.get(name) is not None
        if op == Operation.IS_NAN:
            def p_is_nan(row):
                v = row.get(name)
                return v is not None and isinstance(v, float) and math.isnan(v)
            return p_is_nan
        if op == Operation.NOT_NAN:
            def p_not_nan(row):
                v = row.get(name)
                return not (v is not None and isinstance(v, float) and math.isnan(v))
            return p_not_nan
    if isinstance(expr, BoundLiteralPredicate):
        name = expr.term.name
        lv = expr.literal.value
        op = expr.op_
        if op == Operation.EQ:
            def p_eq(row):
                v = row.get(name)
                return v is not None and v == lv
            return p_eq
        if op == Operation.NOT_EQ:
            def p_ne(row):
                v = row.get(name)
                return v is not None and v != lv
            return p_ne
        if op == Operation.LT:
            def p_lt(row):
                v = row.get(name)
                return v is not None and v < lv
            return p_lt
        if op == Operation.LT_EQ:
            def p_le(row):
                v = row.get(name)
                return v is not None and v <= lv
            return p_le
        if op == Operation.GT:
            def p_gt(row):
                v = row.get(name)
                return v is not None and v > lv
            return p_gt
        if op == Operation.GT_EQ:
            def p_ge(row):
                v = row.get(name)
                return v is not None and v >= lv
            return p_ge
        if op == Operation.STARTS_WITH:
            slv = str(lv)
            def p_sw(row):
                v = row.get(name)
                return v is not None and str(v).startswith(slv)
            return p_sw
        if op == Operation.NOT_STARTS_WITH:
            slv = str(lv)
            def p_nsw(row):
                v = row.get(name)
                return v is not None and not str(v).startswith(slv)
            return p_nsw
    if isinstance(expr, BoundSetPredicate):
        name = expr.term.name
        values = expr.values
        if expr.op_ == Operation.IN:
            def p_in(row):
                v = row.get(name)
                return v is not None and v in values
            return p_in
        def p_not_in(row):
            v = row.get(name)
            return v is not None and v not in values
        return p_not_in
    raise TypeError(f"cannot evaluate {expr!r}")


# ----------------------------------------------------------- pandas compiler

def to_pandas_mask(expr: Expression, pdf):
    """Evaluate a bound expression over a pandas DataFrame → boolean
    Series. Used by the executor-side positional-delete writer, which
    (like the reference's arrow_scanner) processes one parquet file at a
    time and needs vectorized residual evaluation without a JVM."""
    import numpy as np
    import pandas as pd

    from .conversions import days_to_date, micros_to_datetime

    def series(term: BoundReference) -> "pd.Series":
        return pdf[term.name]

    def conv_value(v, t: IcebergType):
        if isinstance(t, DateType):
            return days_to_date(v)
        if isinstance(t, TimestampTzType):
            return pd.Timestamp(micros_to_datetime(v, tz=True))
        if isinstance(t, (TimestampType,)):
            return pd.Timestamp(micros_to_datetime(v, tz=False))
        return v

    def lit_value(l: Literal):
        return conv_value(l.value, l.type)

    if isinstance(expr, AlwaysTrue):
        return pd.Series(True, index=pdf.index)
    if isinstance(expr, AlwaysFalse):
        return pd.Series(False, index=pdf.index)
    if isinstance(expr, And):
        return to_pandas_mask(expr.left, pdf) & to_pandas_mask(expr.right, pdf)
    if isinstance(expr, Or):
        return to_pandas_mask(expr.left, pdf) | to_pandas_mask(expr.right, pdf)
    if isinstance(expr, Not):
        return ~to_pandas_mask(expr.child, pdf)
    if isinstance(expr, BoundUnaryPredicate):
        s = series(expr.term)
        if expr.op_ == Operation.IS_NULL:
            return s.isna()
        if expr.op_ == Operation.NOT_NULL:
            return s.notna()
        if expr.op_ in (Operation.IS_NAN, Operation.NOT_NAN):
            # pandas float64 folds null into NaN; when the caller stashed
            # an arrow validity mask (__isnull_<col>, see
            # write_position_deletes) use it so nulls are NOT treated as
            # NaN — otherwise fall back to the conflated check.
            nan = pd.Series(
                [isinstance(v, float) and v != v for v in s], index=pdf.index
            )
            null_col = f"__isnull_{expr.term.name}"
            if null_col in pdf.columns:
                nan = nan & ~pdf[null_col]
            return nan if expr.op_ == Operation.IS_NAN else ~nan
    if isinstance(expr, BoundLiteralPredicate):
        s = series(expr.term)
        lv = lit_value(expr.literal)
        op = expr.op_
        if op == Operation.EQ:
            return (s == lv).fillna(False)
        if op == Operation.NOT_EQ:
            return (s != lv).fillna(False) & s.notna()
        if op == Operation.LT:
            return (s < lv).fillna(False)
        if op == Operation.LT_EQ:
            return (s <= lv).fillna(False)
        if op == Operation.GT:
            return (s > lv).fillna(False)
        if op == Operation.GT_EQ:
            return (s >= lv).fillna(False)
        if op == Operation.STARTS_WITH:
            return s.astype("string").str.startswith(str(expr.literal.value)).fillna(False)
        if op == Operation.NOT_STARTS_WITH:
            return (~s.astype("string").str.startswith(str(expr.literal.value))).fillna(False)
    if isinstance(expr, BoundSetPredicate):
        s = series(expr.term)
        vals = [conv_value(v, expr.term.type) for v in expr.values]
        isin = s.isin(vals)
        return isin if expr.op_ == Operation.IN else (~isin & s.notna())
    raise TypeError(f"cannot compile {expr!r} to a pandas mask")


# ----------------------------------------------------------- spark compiler

def to_spark_column(expr: Expression):
    """Compile a (bound or unbound) expression to a Spark Column for the
    residual row filter — the data-plane half of SURVEY §3.1 step 7.
    Catalyst then handles parquet row-group pushdown for free."""
    from pyspark.sql import functions as F

    from .conversions import days_to_date, micros_to_datetime
    from .types import DateType as _Date
    from .types import TimestampType as _Ts
    from .types import TimestampTzType as _TsTz

    def conv_value(v, t):
        if isinstance(t, _Date):
            return days_to_date(v)
        if isinstance(t, _TsTz):
            return micros_to_datetime(v, tz=True)
        if isinstance(t, _Ts):
            return micros_to_datetime(v, tz=False)
        return v

    def lit_value(l: Literal):
        return F.lit(conv_value(l.value, l.type))

    if isinstance(expr, AlwaysTrue):
        return F.lit(True)
    if isinstance(expr, AlwaysFalse):
        return F.lit(False)
    if isinstance(expr, And):
        return to_spark_column(expr.left) & to_spark_column(expr.right)
    if isinstance(expr, Or):
        return to_spark_column(expr.left) | to_spark_column(expr.right)
    if isinstance(expr, Not):
        return ~to_spark_column(expr.child)
    if isinstance(expr, BoundUnaryPredicate):
        c = F.col(expr.term.name)
        return {
            Operation.IS_NULL: c.isNull(),
            Operation.NOT_NULL: c.isNotNull(),
            Operation.IS_NAN: F.isnan(c),
            Operation.NOT_NAN: ~F.isnan(c),
        }[expr.op_]
    if isinstance(expr, BoundLiteralPredicate):
        c = F.col(expr.term.name)
        lv = lit_value(expr.literal)
        op = expr.op_
        if op == Operation.EQ:
            return c == lv
        if op == Operation.NOT_EQ:
            return c != lv
        if op == Operation.LT:
            return c < lv
        if op == Operation.LT_EQ:
            return c <= lv
        if op == Operation.GT:
            return c > lv
        if op == Operation.GT_EQ:
            return c >= lv
        if op == Operation.STARTS_WITH:
            return c.startswith(str(expr.literal.value))
        if op == Operation.NOT_STARTS_WITH:
            return ~c.startswith(str(expr.literal.value))
    if isinstance(expr, BoundSetPredicate):
        c = F.col(expr.term.name)
        vals = [
            conv_value(v, expr.term.type)
            for v in sorted(expr.values, key=lambda v: str(v))
        ]
        col_in = c.isin([F.lit(v) for v in vals])
        return col_in if expr.op_ == Operation.IN else ~col_in
    if isinstance(expr, UnboundPredicate):
        raise ValueError("bind the expression before compiling to Spark")
    raise TypeError(f"cannot compile {expr!r}")


def to_arrow_expression(expr: Expression):
    """Compile a BOUND expression to a pyarrow.dataset filter expression
    — the residual bridge for executor-side Arrow reads (spj.py's
    in-task join, where rows never pass through a Spark Column).  Same
    SQL ternary semantics as to_spark_column: a predicate over null
    evaluates to null and Table.filter drops it."""
    import pyarrow.compute as pc

    from .conversions import days_to_date, micros_to_datetime
    from .types import DateType as _Date
    from .types import TimestampType as _Ts
    from .types import TimestampTzType as _TsTz

    def conv_value(v, t):
        if isinstance(t, _Date):
            return days_to_date(v)
        if isinstance(t, _TsTz):
            return micros_to_datetime(v, tz=True)
        if isinstance(t, _Ts):
            return micros_to_datetime(v, tz=False)
        return v

    if isinstance(expr, AlwaysTrue):
        return pc.scalar(True)
    if isinstance(expr, AlwaysFalse):
        return pc.scalar(False)
    if isinstance(expr, And):
        return to_arrow_expression(expr.left) & to_arrow_expression(expr.right)
    if isinstance(expr, Or):
        return to_arrow_expression(expr.left) | to_arrow_expression(expr.right)
    if isinstance(expr, Not):
        return ~to_arrow_expression(expr.child)
    if isinstance(expr, BoundUnaryPredicate):
        f = pc.field(expr.term.name)
        if expr.op_ == Operation.IS_NULL:
            return f.is_null()
        if expr.op_ == Operation.NOT_NULL:
            return f.is_valid()
        if expr.op_ == Operation.IS_NAN:
            return f.is_nan()
        if expr.op_ == Operation.NOT_NAN:
            return ~f.is_nan()
    if isinstance(expr, BoundLiteralPredicate):
        f = pc.field(expr.term.name)
        v = conv_value(expr.literal.value, expr.literal.type)
        op = expr.op_
        if op == Operation.EQ:
            return f == v
        if op == Operation.NOT_EQ:
            return f != v
        if op == Operation.LT:
            return f < v
        if op == Operation.LT_EQ:
            return f <= v
        if op == Operation.GT:
            return f > v
        if op == Operation.GT_EQ:
            return f >= v
        if op == Operation.STARTS_WITH:
            return pc.starts_with(f, str(expr.literal.value))
        if op == Operation.NOT_STARTS_WITH:
            return ~pc.starts_with(f, str(expr.literal.value))
    if isinstance(expr, BoundSetPredicate):
        f = pc.field(expr.term.name)
        vals = [conv_value(v, expr.term.type) for v in expr.values]
        isin = f.isin(vals)
        if expr.op_ == Operation.IN:
            return isin
        # Arrow's isin maps null → false (not null), so a bare ~isin
        # would KEEP null rows; SQL NOT IN drops them
        return ~isin & f.is_valid()
    if isinstance(expr, UnboundPredicate):
        raise ValueError("bind the expression before compiling to Arrow")
    raise TypeError(f"cannot compile {expr!r} to an Arrow expression")
