"""Randomized schema-evolution sequences vs a pandas model.

Single-shape evolution reads are pinned in test_evolution; this fuzz
interleaves appends, renames, added-with-default columns, int→long
promotion, drops, and row-level deletes in random (seeded) orders and
checks the full scan against an independently-maintained pandas model
after EVERY step — old files must resolve through field ids across any
rename/promotion history, added columns must read defaults for
pre-existing files, and drops must hide values everywhere."""

from __future__ import annotations

import random

import pandas as pd
import pytest

from iceberg_go_distributed_spark.iceberg import expressions as E
from iceberg_go_distributed_spark.iceberg import types as ty
from iceberg_go_distributed_spark.iceberg.catalog import FileSystemCatalog
from iceberg_go_distributed_spark.iceberg.types import NestedField, Schema


def _check(t, spark, model: pd.DataFrame, step):
    got = (
        t.scan()
        .to_df(spark)
        .toPandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    want = model.sort_values("id").reset_index(drop=True)
    assert sorted(got.columns) == sorted(want.columns), (
        f"step {step}: cols {sorted(got.columns)} != {sorted(want.columns)}"
    )
    got = got[sorted(got.columns)]
    want = want[sorted(want.columns)].astype(got.dtypes.to_dict())
    pd.testing.assert_frame_equal(got, want, check_dtype=False), step


@pytest.mark.parametrize("seed", [3, 11, 29, 47])
def test_random_evolution_sequences(tmp_path, spark, seed):
    rng = random.Random(seed)
    cat = FileSystemCatalog(str(tmp_path / "wh"))
    t = cat.create_table(
        f"db.evo{seed}",
        Schema.of(
            0,
            NestedField(1, "id", ty.LongType(), required=True),
            NestedField(2, "val", ty.IntegerType()),
            NestedField(3, "tag", ty.StringType()),
        ),
    )
    t.upgrade_format_version(3)

    next_id = 0
    model = pd.DataFrame({"id": pd.Series(dtype="int64"),
                          "val": pd.Series(dtype="object"),
                          "tag": pd.Series(dtype="object")})
    names = {"val": "val", "tag": "tag"}  # logical → current name
    extra_cols: list[str] = []
    promoted = False

    def append(n):
        nonlocal next_id, model
        rows = []
        for _ in range(n):
            r = {"id": next_id, names["val"]: next_id * 10,
                 names["tag"]: f"t{next_id % 3}"}
            for c in extra_cols:
                r[c] = next_id * 100
            rows.append(r)
            next_id += 1
        cols = ["id", names["val"], names["tag"]] + extra_cols
        ddl = ", ".join(
            f"`{c}` " + ("long" if c != names["tag"] else "string")
            if c != names["val"]
            else f"`{c}` " + ("long" if promoted else "int")
            for c in cols
        )
        df = spark.createDataFrame([tuple(r[c] for c in cols) for r in rows], ddl)
        t.append(df.coalesce(1))
        model = pd.concat([model, pd.DataFrame(rows)], ignore_index=True)

    append(6)
    ops = ["append", "rename", "addcol", "promote", "delete", "drop", "append"]
    for step in range(10):
        op = rng.choice(ops)
        if op == "append":
            append(rng.randint(2, 5))
        elif op == "rename":
            which = rng.choice(["val", "tag"])
            new = f"{which}_{step}"
            t.update_schema().rename_column(names[which], new).commit()
            model = model.rename(columns={names[which]: new})
            names[which] = new
        elif op == "addcol" and len(extra_cols) < 2:
            c = f"x{step}"
            t.update_schema().add_column(c, ty.LongType()).commit()
            model[c] = None  # pre-existing rows read NULL
            extra_cols.append(c)
        elif op == "promote" and not promoted:
            t.update_schema().update_column(names["val"], ty.LongType()).commit()
            promoted = True
        elif op == "delete" and len(model):
            victim = int(rng.choice(model["id"].tolist()))
            t.delete_where(spark, E.equal("id", victim))
            model = model[model["id"] != victim]
        elif op == "drop" and extra_cols:
            c = extra_cols.pop()
            t.update_schema().drop_column(c).commit()
            model = model.drop(columns=[c])
        _check(t, spark, model, f"{step}:{op}")
