"""PG system functions as session UDFs.

The 16 functions the reference registers (``catalog.scala:223-245``) so
client metadata SQL resolves — `current_schemas`, `format_type`,
`array_to_string`, visibility checks, etc. These run only on tiny
catalog metadata rows, so plain Python UDFs are fine (never on the data
path).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from spark_sql_server_spark.protocol import pgtypes as P

_OID_TO_NAME = {t.oid: t.name for t in P.ALL_PG_TYPES}

#: oids of the emulated catalog tables / system functions — used by the
#: visibility checks (visible = NOT one of ours, like the reference).
#: Derived from the catalog schema map + the well-known-oid table so the
#: two can never drift apart again (r10 ADVICE: the r10 relations —
#: pg_tablespace/pg_auth_members/pg_extension/… — were reported
#: "visible", inconsistent with the pinned inverted semantics); the two
#: literals are the legacy pg_settings/pg_stat view oids.
def _compute_catalog_table_oids() -> frozenset:
    from spark_sql_server_spark.catalog.pg_catalog import (
        CATALOG_TABLE_SCHEMAS,
        table_oid,
    )
    from spark_sql_server_spark.dialect.rewriter import (
        _CATALOG_RELATION_OIDS,
    )

    return (
        frozenset(
            _CATALOG_RELATION_OIDS.get(n, table_oid(n))
            for n in CATALOG_TABLE_SCHEMAS
        )
        | frozenset(_CATALOG_RELATION_OIDS.values())
        | frozenset((11631, 11642))
    )


_CATALOG_TABLE_OIDS = _compute_catalog_table_oids()
_SYSTEM_FUNCTION_OIDS = frozenset(
    (384, 750, 1081, 1215, 1402, 1597, 1642, 1716, 2079, 2080, 2081, 2092,
     2098, 2162, 2165, 2168, 2250, 2420, 3166, 3415, 3778)
)


def _type_name(oid: int | None) -> str:
    if oid is None:
        return "unknown"
    return _OID_TO_NAME.get(int(oid), "unknown")


def init_system_functions(spark: SparkSession) -> None:
    """Register the PG system functions on this (sub)session."""
    udf = spark.udf.register

    udf(
        "array_to_string",
        lambda arr, delim: delim.join(str(x) for x in arr) if arr is not None else "",
        T.StringType(),
    )
    udf("array_in", lambda: "array_in", T.StringType())
    udf("format_type", lambda oid, typemod: _type_name(oid), T.StringType())
    udf("obj_description", lambda oid, tab: "", T.StringType())
    udf("current_schemas", lambda _b: ["spark"], T.ArrayType(T.StringType()))
    udf("pg_encoding_to_char", lambda enc: "UTF8", T.StringType())
    udf("pg_get_userbyid", lambda uid: "spark-user", T.StringType())
    # psql calls both the 2-arg and 3-arg (pretty) forms
    udf("pg_get_expr", lambda *args: "", T.StringType())
    udf(
        "pg_table_is_visible",
        lambda oid: oid is not None and int(oid) not in _CATALOG_TABLE_OIDS,
        T.BooleanType(),
    )
    # real PG semantics: pg_catalog is always on the search path, so
    # system functions ARE visible (the reference inverts this and its
    # own \df can never list them — we diverge deliberately)
    udf("pg_function_is_visible", lambda oid: oid is not None, T.BooleanType())
    udf(
        "array_upper",
        lambda arr, n: len(arr) if arr is not None else None,
        T.IntegerType(),
    )
    udf("pg_get_function_arguments", lambda oid: "", T.StringType())
    udf("pg_get_function_result", lambda oid: "", T.StringType())
    udf(
        "oidvectortypes",
        lambda oids: ", ".join(_type_name(o) for o in oids) if oids else "",
        T.StringType(),
    )
    # r10 psql meta-command wave (\dn \du \dT \db \dx \l+ \sf):
    # pg_catalog is always on the search path, so types are visible
    udf("pg_type_is_visible", lambda oid: oid is not None, T.BooleanType())
    # single-directory deployment: tablespaces have no separate location
    udf("pg_tablespace_location", lambda oid: "", T.StringType())
    # one implicit superuser — every privilege is held
    udf("has_database_privilege", lambda db, priv: True, T.BooleanType())
    # pg_dump's connection preamble (never a standby here)
    udf("pg_is_in_recovery", lambda: False, T.BooleanType())
    # pg_dump quoting helpers (PG's exact quoting rules: ident quoted
    # unless a clean lower-case identifier that is not a non-
    # unreserved keyword — quote_identifier() in ruleutils.c quotes
    # every keyword whose category != UNRESERVED_KEYWORD, so an object
    # named `table` dumps as "table" and restores; literal doubles
    # quotes). Keyword set = PG 15 kwlist.h RESERVED + TYPE_FUNC_NAME
    # + COL_NAME categories (r11 ADVICE).
    import re as _re

    _pg_reserved = frozenset(
        """all analyse analyze and any array as asc asymmetric both
        case cast check collate column constraint create current_catalog
        current_date current_role current_time current_timestamp
        current_user default deferrable desc distinct do else end except
        false fetch for foreign from grant group having in initially
        intersect into lateral leading limit localtime localtimestamp
        not null offset on only or order placing primary references
        returning select session_user some symmetric system_user table
        then to trailing true union unique user using variadic when
        where window with authorization binary collation concurrently
        cross current_schema freeze full ilike inner is isnull join
        left like natural notnull outer overlaps right similar
        tablesample verbose between bigint bit boolean char character
        coalesce dec decimal exists extract float greatest grouping
        inout int integer interval least national nchar none normalize
        nullif numeric out overlay position precision real row setof
        smallint substring time timestamp treat trim values varchar
        xmlattributes xmlconcat xmlelement xmlexists xmlforest
        xmlnamespaces xmlparse xmlpi xmlroot xmlserialize
        xmltable""".split()
    )

    udf(
        "quote_ident",
        lambda s: (
            None if s is None
            else s
            if _re.fullmatch(r"[a-z_][a-z0-9_]*", s)
            and s not in _pg_reserved
            else '"' + s.replace('"', '""') + '"'
        ),
        T.StringType(),
    )
    udf(
        "quote_literal",
        lambda s: None if s is None else "'" + str(s).replace("'", "''") + "'",
        T.StringType(),
    )
    udf("pg_get_triggerdef", lambda *args: "", T.StringType())
    # default ACL for an object type/owner — NULL here, matching the
    # NULL acl columns, so pg_dump sees "no ACL to dump". STRING (not
    # array): pg_dump's pg_default_acl query CASEs it against the text
    # literal '{}', and every comparison against it happens client-side
    udf("acldefault", lambda objtype, owner: None, T.StringType())
    # sizes aren't tracked per PG database (Spark storage is external);
    # 0 renders as '0 bytes' in \l+ rather than faking a number
    udf("pg_database_size", lambda db: 0, T.LongType())
    udf(
        "pg_size_pretty",
        lambda n: f"{int(n or 0)} bytes",
        T.StringType(),
    )
    udf("shobj_description", lambda oid, cat: "", T.StringType())
    udf("col_description", lambda oid, colnum: "", T.StringType())
    # exotic describe battery (\dd \do \dO \dF \dC \dD): visibility
    # checks over always-empty catalogs + constraint/encoding helpers
    for vis_fn in (
        "pg_opclass_is_visible", "pg_operator_is_visible",
        "pg_ts_config_is_visible", "pg_ts_dict_is_visible",
        "pg_conversion_is_visible", "pg_collation_is_visible",
        "pg_statistics_obj_is_visible", "pg_opfamily_is_visible",
    ):
        udf(vis_fn, lambda oid: oid is not None, T.BooleanType())
    udf("pg_get_constraintdef", lambda *args: "", T.StringType())
    # SQLAlchemy get_view_definition / get_indexes call these (the
    # emulation stores no view SQL or indexes — empty text, like the
    # reference's empty pg_proc answers)
    udf("pg_get_viewdef", lambda *args: "", T.StringType())
    udf("pg_get_indexdef", lambda *args: "", T.StringType())
    udf("pg_char_to_encoding", lambda name: 6, T.IntegerType())  # UTF8
    udf("getdatabaseencoding", lambda: "UTF8", T.StringType())
    udf(
        "pg_get_functiondef",
        lambda oid: "-- function definitions are not stored "
        "(Spark session UDF)",
        T.StringType(),
    )
    # PG current_schema() is the PG namespace name, not Spark's current
    # database ('default') — SQLAlchemy uses it as the default schema
    # for inspect(engine); shadows the Spark builtin like version()
    from spark_sql_server_spark.catalog.pg_catalog import DEFAULT_NAMESPACE

    _ns_name = DEFAULT_NAMESPACE[1]
    udf("current_schema", lambda: _ns_name, T.StringType())
    # interaction shims, not real functions (catalog.scala:241-244)
    udf("ANY", lambda arr: arr[0] if arr else None, T.StringType())
    udf("regtype", lambda oid: _type_name(oid), T.StringType())
    # current_setting reads the advertised defaults (per-session SET
    # overrides live in the protocol layer's SHOW path, which this UDF
    # cannot see — documented divergence)
    from spark_sql_server_spark.catalog.pg_catalog import GUC_DEFAULTS

    udf(
        "current_setting",
        lambda name: GUC_DEFAULTS.get(str(name).lower()) if name else None,
        T.StringType(),
    )
    # standalone `SELECT set_config(...)` is handled as a real SET at the
    # commands layer (pg_dump clears search_path that way); this UDF is
    # the no-side-effect fallback for set_config embedded in a larger
    # expression — it echoes the new value like PG
    udf(
        "set_config",
        lambda name, value, is_local: value,
        T.StringType(),
    )
    # PG-style version(): ORMs parse "PostgreSQL X.Y" out of it
    # (SQLAlchemy's postgresql dialect does SELECT version() on connect).
    # This shadows Spark's built-in version() for the session — the
    # Spark build string rides along in parentheses.
    import pyspark

    ver = (
        f"PostgreSQL {GUC_DEFAULTS.get('server_version', '9.6.0')} "
        f"(Apache Spark {pyspark.__version__}) 64-bit"
    )
    udf("version", lambda: ver, T.StringType())
