"""Local twin of the driver's correctness gate.

For every registered query with an oracle: run the Spark implementation
and the DuckDB oracle on the same parquet tables, sort columns by name,
sort rows, and compare values exactly (floats bit-for-bit after the
determinism rules in registry.py; timestamps normalized to ns).

Stricter than it needs to be on purpose — if this passes, any
reasonable hash-based compare passes too.
"""

from __future__ import annotations

import math
import os
from datetime import datetime
from decimal import Decimal

import pytest

from spark_sql_server_spark.operators import REGISTRY
from tests.conftest import SF_CORRECT, register_duck_views


def _type_class(t) -> str:
    """Coarse cross-engine type class for a Spark simpleString or an
    Arrow type. The value-level compare below converts Decimal→float,
    so it can NOT see a Spark DECIMAL column where the oracle yields
    DOUBLE — but the driver's pandas-hash gate can (Decimal objects vs
    float64 hash differently). Classing both schemas catches it (the
    r4 ROUND6 regression: Spark FLOOR(x)/1000000.0 is BIGINT/DECIMAL →
    DECIMAL, DuckDB's is DOUBLE)."""
    t = str(t)
    if t.startswith("decimal"):
        return "decimal"
    if t in ("double", "float", "float64", "float32", "halffloat"):
        return "float"
    if t.startswith(("int", "uint")) or t in ("tinyint", "smallint", "bigint"):
        return "int"
    if t in ("string", "large_string", "varchar"):
        return "str"
    if t.startswith("timestamp"):
        return "ts"
    if t in ("bool", "boolean"):
        return "bool"
    if t.startswith("date"):
        return "date"
    return t


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if hasattr(v, "isoformat"):  # date
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def _normalize(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r))
    return [colnames[i] for i in order], out


ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is None)

#: Views register_tables creates — the only catalog entries an operator
#: invocation is allowed to add (anything else is a per-invocation leak
#: on a long-running server: the q_bucketed_join / st_* / pipe_build
#: class all found in r3/r4).
_BASE_TABLES = {
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
}


def _assert_catalog_hygiene(spark, name):
    extra = {
        t.name for t in spark.catalog.listTables()
    } - _BASE_TABLES
    assert not extra, (
        f"{name}: leaked catalog entries {sorted(extra)} — drop temp "
        "views / metastore tables before returning (see CLAUDE.md leak "
        "rules)"
    )


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, duck, name):
    spec = REGISTRY[name]
    sf_dir = os.environ.get("PARITY_SF_DIR", SF_CORRECT)
    register_duck_views(duck, sf_dir)

    sdf = spec.fn(spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]
    _assert_catalog_hygiene(spark, name)

    # ONE DuckDB execution: the Arrow table provides column names,
    # precise types, and values (the sf0.1 sweep runs every oracle —
    # re-executing per check tripled its wall time)
    at = duck.execute(spec.oracle).arrow()
    duck_cols = list(at.schema.names)
    cols_data = [at.column(i).to_pylist() for i in range(at.num_columns)]
    duck_rows = list(zip(*cols_data)) if duck_cols else []

    # type-class parity (see _type_class): the value compare normalizes
    # Decimal→float and would mask a Spark-decimal/duck-double split
    # that fails the driver's pandas hash. This also subsumes the old
    # HUGEINT probe: DuckDB HUGEINT arrives as arrow decimal128(38,0),
    # which classes as 'decimal' against Spark's 'int'.
    spark_classes = {
        f.name.lower(): _type_class(f.dataType.simpleString())
        for f in sdf.schema.fields
    }
    duck_classes = {
        f.name.lower(): _type_class(f.type) for f in at.schema
    }
    class_diffs = {
        c: (spark_classes.get(c), duck_classes.get(c))
        for c in spark_classes
        if c in duck_classes and spark_classes[c] != duck_classes[c]
    }
    assert not class_diffs, (
        f"{name}: column type classes differ (spark, duck): {class_diffs} "
        "— the driver's pandas hash will mismatch even if values agree"
    )

    assert sorted(c.lower() for c in spark_cols) == sorted(
        c.lower() for c in duck_cols
    ), f"{name}: column names differ: spark={spark_cols} duck={duck_cols}"

    s_cols, s_rows = _normalize(spark_rows, [c.lower() for c in spark_cols])
    d_cols, d_rows = _normalize(duck_rows, [c.lower() for c in duck_cols])

    assert len(s_rows) == len(d_rows), (
        f"{name}: row count differs: spark={len(s_rows)} duck={len(d_rows)}"
    )
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} row mismatches; first 3: {mismatches[:3]}"
    )


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_queries_run(spark, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, os.environ.get("PARITY_SF_DIR", SF_CORRECT))
    assert df.count() >= 0
    assert df.schema is not None
    _assert_catalog_hygiene(spark, name)
