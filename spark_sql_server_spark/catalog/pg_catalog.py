"""pg_catalog tables as Spark tables.

Static tables (pg_type, pg_namespace, pg_roles, pg_user + 8 empties)
are written once at server start; runtime tables (pg_class,
pg_attribute, pg_proc, pg_database) are derived from the live Spark
catalog and can be refreshed. Mirrors the table set and schemas the
reference creates (``catalog.scala:87-116, :284-379``) so the JDBC
metadata queries quoted there resolve.
"""

from __future__ import annotations

import zlib

from pyspark.sql import Row, SparkSession

from spark_sql_server_spark.protocol import pgtypes as P

CATALOG_DB = "pg_catalog"

#: Session settings advertised via ParameterStatus / answered by
#: ``SHOW`` — also materialized as ``pg_catalog.pg_settings`` and
#: readable through ``current_setting()`` (psql \dconfig reads the
#: view). The protocol layer overlays per-session values (version conf,
#: application_name, session user) on top of these.
GUC_DEFAULTS: dict[str, str] = {
    "server_version": "9.6.0",
    "server_encoding": "UTF8",
    "client_encoding": "UTF8",
    "application_name": "",
    "datestyle": "ISO",
    "integer_datetimes": "on",
    "timezone": "UTC",
    "standard_conforming_strings": "on",
    "transaction_isolation": "read committed",
    "search_path": '"$user", public',
    "is_superuser": "on",
    "session_authorization": "spark-user",
    "statement_timeout": "0",
}

#: namespace oid/name the reference reports for Spark's default database
DEFAULT_NAMESPACE = (2200, "spark")
USER_ROLE_OID = 10

# (name, schema DDL) — one entry per catalog table the reference creates.
CATALOG_TABLE_SCHEMAS: dict[str, str] = {
    "pg_type": (
        "oid INT, typname STRING, typtype STRING, typlen INT, typnotnull BOOLEAN, "
        "typelem INT, typdelim STRING, typinput STRING, typrelid INT, "
        "typbasetype INT, typtypmod INT, typcollation INT, typnamespace INT"
    ),
    "pg_namespace": "oid INT, nspname STRING",
    "pg_roles": "oid INT, rolname STRING",
    "pg_user": "usename STRING, usesysid INT",
    "pg_settings": (
        "name STRING, setting STRING, unit STRING, category STRING, "
        "short_desc STRING, context STRING, vartype STRING, source STRING, "
        "min_val STRING, max_val STRING, enumvals ARRAY<STRING>, "
        "boot_val STRING, reset_val STRING, pending_restart BOOLEAN"
    ),
    "pg_attrdef": "adrelid INT, adnum SMALLINT, adbin STRING",
    "pg_constraint": (
        "oid INT, confupdtype STRING, confdeltype STRING, conname STRING, "
        "condeferrable BOOLEAN, condeferred BOOLEAN, conkey ARRAY<INT>, "
        "confkey ARRAY<INT>, confrelid INT, conrelid INT, contype STRING"
    ),
    "pg_depend": "objid INT, classid INT, refobjid INT, refclassid INT",
    "pg_description": "objoid INT, classoid INT, objsubid INT, description STRING",
    "pg_index": "oid INT, indrelid INT, indexrelid INT, indisprimary BOOLEAN",
    "pg_inherits": "inhrelid INT, inhparent INT, inhseqno INT",
    "pg_collation": "oid INT, collname STRING",
    "pg_policy": (
        # polroles is an oid array in PG; psql's \d row-security query
        # does `polroles = '{0}'` and `oid = any(polroles)` — the array
        # type (with the '{0}' literal rewrite) keeps both analyzable
        "polname STRING, polrelid INT, polcmd STRING, polroles ARRAY<INT>, "
        "polqual STRING, polwithcheck STRING"
    ),
    "pg_attribute": (
        "oid INT, attrelid INT, attname STRING, atttypid INT, attnotnull BOOLEAN, "
        "atthasdef BOOLEAN, atttypmod INT, attlen INT, attnum INT, "
        "attidentity STRING, attisdropped BOOLEAN, attcollation INT"
    ),
    "pg_proc": (
        "oid INT, proname STRING, prorettype INT, proargtypes ARRAY<INT>, "
        "pronamespace INT, proisagg BOOLEAN, proiswindow BOOLEAN, proretset BOOLEAN"
    ),
    "pg_class": (
        "oid INT, reltablespace INT, relname STRING, reloftype INT, "
        "relpersistence STRING, relkind STRING, relnamespace INT, relowner INT, "
        "relacl ARRAY<STRING>, relchecks SMALLINT, reltoastrelid INT, "
        "relhasindex BOOLEAN, relhasrules BOOLEAN, relhastriggers BOOLEAN, "
        "relrowsecurity BOOLEAN, relforcerowsecurity BOOLEAN, relreplident STRING, "
        "reltriggers SMALLINT, relhasoids BOOLEAN, relispartition BOOLEAN, "
        "relpartbound STRING"
    ),
    "pg_database": (
        "datname STRING, datdba INT, encoding INT, datcollate STRING, "
        "datctype STRING, datacl ARRAY<STRING>"
    ),
}


def table_oid(name: str) -> int:
    """Stable synthetic oid for a user table (crc32 into the >=10000 range)."""
    return 10000 + (zlib.crc32(name.encode()) % 2_000_000)


def init_pg_catalog(spark: SparkSession) -> None:
    """Create the pg_catalog database and its tables (idempotent)."""
    if spark.catalog.databaseExists(CATALOG_DB) and spark.catalog.tableExists(
        f"{CATALOG_DB}.pg_type"
    ):
        cols = {f.name for f in spark.table(f"{CATALOG_DB}.pg_type").schema.fields}
        has_timeout_row = spark.sql(
            f"SELECT 1 FROM {CATALOG_DB}.pg_settings "
            "WHERE name = 'statement_timeout' LIMIT 1"
        ).count() == 1
        if "typtypmod" in cols and has_timeout_row:
            return  # current schema+content rev — nothing to do
        # stale persisted catalog from an older schema rev: rebuild
    # the in-memory catalog is per-process but the warehouse dir is not:
    # clear any orphaned location from a previous process
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
    if warehouse.startswith("file:"):
        warehouse = warehouse[5:]
    if warehouse:
        shutil.rmtree(f"{warehouse}/{CATALOG_DB}.db", ignore_errors=True)
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {CATALOG_DB}")
    for name, schema in CATALOG_TABLE_SCHEMAS.items():
        spark.sql(f"DROP TABLE IF EXISTS {CATALOG_DB}.{name}")
        spark.sql(f"CREATE TABLE {CATALOG_DB}.{name} ({schema}) USING parquet")

    ns_oid, ns_name = DEFAULT_NAMESPACE
    spark.sql(
        f"INSERT INTO {CATALOG_DB}.pg_namespace VALUES ({ns_oid}, '{ns_name}')"
    )
    spark.sql(
        f"INSERT INTO {CATALOG_DB}.pg_roles VALUES ({USER_ROLE_OID}, 'spark-user')"
    )
    spark.sql(
        f"INSERT INTO {CATALOG_DB}.pg_user VALUES ('spark-user', {USER_ROLE_OID})"
    )

    settings_rows = [
        Row(
            name=k,
            setting=v,
            unit=None,
            category="Preset Options",
            short_desc="",
            context="user",
            vartype="string",
            source="default",
            min_val=None,
            max_val=None,
            enumvals=None,
            boot_val=v,
            reset_val=v,
            pending_restart=False,
        )
        for k, v in sorted(GUC_DEFAULTS.items())
    ]
    spark.createDataFrame(
        settings_rows, schema=CATALOG_TABLE_SCHEMAS["pg_settings"]
    ).write.insertInto(f"{CATALOG_DB}.pg_settings")

    # pg_proc: the registered system functions, so psql \df lists them
    # (the reference leaves pg_proc empty)
    _SYSTEM_PROCS = [
        (384, "array_to_string", 1043),
        (750, "array_in", 1043),
        (1081, "format_type", 1043),
        (1215, "obj_description", 1043),
        (1402, "current_schemas", 1009),
        (1597, "pg_encoding_to_char", 1043),
        (1642, "pg_get_userbyid", 1043),
        (1716, "pg_get_expr", 1043),
        (2079, "pg_table_is_visible", 16),
        (2081, "pg_function_is_visible", 16),
        (2092, "array_upper", 23),
        (2162, "pg_get_function_arguments", 1043),
        (2165, "pg_get_function_result", 1043),
        (2420, "oidvectortypes", 1043),
    ]
    proc_rows = [
        Row(
            oid=oid,
            proname=name,
            prorettype=rettype,
            proargtypes=[],
            pronamespace=ns_oid,
            proisagg=False,
            proiswindow=False,
            proretset=False,
        )
        for oid, name, rettype in _SYSTEM_PROCS
    ]
    spark.createDataFrame(
        proc_rows, schema=CATALOG_TABLE_SCHEMAS["pg_proc"]
    ).write.insertInto(f"{CATALOG_DB}.pg_proc")

    type_rows = [
        Row(
            oid=t.oid,
            typname=t.name,
            typtype="b",
            typlen=t.len,
            typnotnull=False,
            typelem=t.elemoid,
            typdelim=",",
            typinput="array_in" if t.name.startswith("_") else f"{t.name}in",
            typrelid=0,
            typbasetype=0,
            typtypmod=-1,  # pgjdbc getColumns reads t.typtypmod for domains
            typcollation=0,
            typnamespace=ns_oid,
        )
        for t in P.ALL_PG_TYPES
    ]
    spark.createDataFrame(type_rows).write.insertInto(f"{CATALOG_DB}.pg_type")

    refresh_runtime_catalog(spark)


def refresh_runtime_catalog(spark: SparkSession) -> None:
    """(Re)populate pg_class / pg_attribute / pg_database from the live
    Spark catalog — the runtime half of the reference's catalog set."""
    ns_oid, _ = DEFAULT_NAMESPACE

    spark.sql(f"TRUNCATE TABLE {CATALOG_DB}.pg_database")
    db_rows = [
        Row(
            datname=db.name,
            datdba=USER_ROLE_OID,
            encoding=6,  # UTF8
            datcollate="C",
            datctype="C",
            datacl=[],
        )
        for db in spark.catalog.listDatabases()
    ]
    if db_rows:
        spark.createDataFrame(
            db_rows, schema=CATALOG_TABLE_SCHEMAS["pg_database"]
        ).write.insertInto(f"{CATALOG_DB}.pg_database")

    tables = [
        t
        for t in spark.catalog.listTables()
        if t.database in (None, "", "default") or t.isTemporary
    ]
    cls_rows = []
    attr_rows = []
    for t in tables:
        oid = table_oid(t.name)
        cls_rows.append(
            Row(
                oid=oid,
                reltablespace=0,
                relname=t.name,
                reloftype=0,
                relpersistence="p",
                relkind="r",
                relnamespace=ns_oid,
                relowner=USER_ROLE_OID,
                relacl=[],
                relchecks=0,
                reltoastrelid=0,
                relhasindex=False,
                relhasrules=False,
                relhastriggers=False,
                relrowsecurity=False,
                relforcerowsecurity=False,
                relreplident="d",
                reltriggers=0,
                relhasoids=False,
                relispartition=False,
                relpartbound=None,
            )
        )
        try:
            cols = spark.catalog.listColumns(t.name)
        except Exception:
            continue
        for i, c in enumerate(cols):
            try:
                from pyspark.sql.types import _parse_datatype_string

                pgt = P.pg_type_for(_parse_datatype_string(c.dataType))
            except Exception:
                pgt = P.VARCHAR
            attr_rows.append(
                Row(
                    oid=0,
                    attrelid=oid,
                    attname=c.name,
                    atttypid=pgt.oid,
                    attnotnull=not c.nullable,
                    atthasdef=False,
                    atttypmod=-1,
                    attlen=pgt.len,
                    attnum=i + 1,
                    attidentity="",
                    attisdropped=False,
                    attcollation=0,
                )
            )

    spark.sql(f"TRUNCATE TABLE {CATALOG_DB}.pg_class")
    if cls_rows:
        spark.createDataFrame(
            cls_rows, schema=CATALOG_TABLE_SCHEMAS["pg_class"]
        ).write.insertInto(f"{CATALOG_DB}.pg_class")
    spark.sql(f"TRUNCATE TABLE {CATALOG_DB}.pg_attribute")
    if attr_rows:
        spark.createDataFrame(
            attr_rows, schema=CATALOG_TABLE_SCHEMAS["pg_attribute"]
        ).write.insertInto(f"{CATALOG_DB}.pg_attribute")
