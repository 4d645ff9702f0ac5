"""Query registry: every implemented operator/query exposes

  - a Spark callable  ``(spark, sf_dir) -> DataFrame``
  - optionally an ANSI-SQL oracle string DuckDB runs on the same parquet
    tables (pre-registered views region nation customer supplier part
    orders lineitem events documents embeddings).

Column names are aliased identically on both sides; money arithmetic is
done in exact DECIMAL on both sides and cast to DOUBLE at the end so the
driver's value-hash matches bit-for-bit.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QueryDef:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # ANSI SQL for DuckDB, or None → rows-only check
    doc: str = ""


REGISTRY: dict[str, QueryDef] = {}


def query(name: str, oracle: str | None = None, doc: str = ""):
    def deco(fn):
        REGISTRY[name] = QueryDef(fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


# ---- shared exact-arithmetic SQL fragments (identical text on both engines)
# money columns fit DECIMAL(12,2); discount/tax < 1 fit DECIMAL(4,2).
REV = "CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))"
SUM_REV = f"CAST(SUM({REV}) AS DOUBLE)"
CHARGE = f"CAST({REV} AS DECIMAL(18,4)) * (1 + CAST(l_tax AS DECIMAL(4,2)))"


def sum_d(col: str, alias: str) -> str:
    """Exact decimal SUM rendered to double."""
    return f"CAST(SUM(CAST({col} AS DECIMAL(12,2))) AS DOUBLE) AS {alias}"


def all_queries():
    """Import all query modules and return the populated registry."""
    from . import tpch  # noqa: F401
    from . import events  # noqa: F401
    from . import llm  # noqa: F401
    from . import iceberg_ops  # noqa: F401

    return REGISTRY
