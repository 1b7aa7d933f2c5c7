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
#: PG's real oid for the pg_catalog namespace — the emulated catalog
#: relations list themselves under it in pg_class so pg_class-walking
#: tools see them (the ^pg_ screens keep them out of \dt/\dn output;
#: psql's \dS name resolution still hides them because
#: pg_table_is_visible keeps the reference's inverted semantics —
#: catalog oids are "not visible", tests/test_pg_catalog.py pins it)
PG_CATALOG_NAMESPACE_OID = 11
USER_ROLE_OID = 10

# (name, schema DDL) — one entry per catalog table the reference creates.
CATALOG_TABLE_SCHEMAS: dict[str, str] = {
    "pg_type": (
        "oid INT, typname STRING, typtype STRING, typlen INT, typnotnull BOOLEAN, "
        "typelem INT, typdelim STRING, typinput STRING, typrelid INT, "
        "typbasetype INT, typtypmod INT, typcollation INT, typnamespace INT, "
        "typarray INT, "  # psql \dT: NOT EXISTS(… el.typarray = t.oid)
        "typdefault STRING, "  # \dD domain defaults (always NULL)
        # pg_dump getTypes column set
        "typowner INT, typacl ARRAY<STRING>, typisdefined BOOLEAN, "
        "typstorage STRING, tableoid INT"
    ),
    # \dn reads nspowner; pg_dump getNamespaces reads nspacl + tableoid
    "pg_namespace": (
        "oid INT, nspname STRING, nspowner INT, nspacl ARRAY<STRING>, "
        "tableoid INT"
    ),
    "pg_roles": (
        # the full column set psql \du/\dg selects
        "oid INT, rolname STRING, rolsuper BOOLEAN, rolinherit BOOLEAN, "
        "rolcreaterole BOOLEAN, rolcreatedb BOOLEAN, rolcanlogin BOOLEAN, "
        "rolconnlimit INT, rolvaliduntil TIMESTAMP, rolreplication BOOLEAN, "
        "rolbypassrls BOOLEAN"
    ),
    "pg_auth_members": (  # empty — no role grants; \du's memberof subquery
        "roleid INT, member INT, grantor INT, admin_option BOOLEAN"
    ),
    "pg_extension": (  # empty — no extensions; \dx + pg_dump getExtensions
        "oid INT, extname STRING, extversion STRING, extnamespace INT, "
        "extowner INT, extrelocatable BOOLEAN, extconfig ARRAY<INT>, "
        "extcondition ARRAY<STRING>, tableoid INT"
    ),
    "pg_tablespace": (  # pg_default/pg_global rows; \db and \l+ join it
        "oid INT, spcname STRING, spcowner INT, spcacl ARRAY<STRING>, "
        "spcoptions ARRAY<STRING>"
    ),
    "pg_user": "usename STRING, usesysid INT",
    "pg_settings": (
        "name STRING, setting STRING, unit STRING, category STRING, "
        "short_desc STRING, context STRING, vartype STRING, source STRING, "
        "min_val STRING, max_val STRING, enumvals ARRAY<STRING>, "
        "boot_val STRING, reset_val STRING, pending_restart BOOLEAN"
    ),
    "pg_attrdef": "oid INT, adrelid INT, adnum SMALLINT, adbin STRING, tableoid INT",
    "pg_constraint": (
        "oid INT, confupdtype STRING, confdeltype STRING, conname STRING, "
        "condeferrable BOOLEAN, condeferred BOOLEAN, conkey ARRAY<INT>, "
        "confkey ARRAY<INT>, confrelid INT, conrelid INT, contype STRING, "
        "contypid INT, tableoid INT, "  # \dD domain checks; \dd join
        # pg_dump getConstraints/getIndexes column set
        "connamespace INT, conindid INT, conislocal BOOLEAN, "
        "convalidated BOOLEAN"
    ),
    "pg_depend": (
        "objid INT, classid INT, refobjid INT, refclassid INT, "
        "objsubid INT, refobjsubid INT, deptype STRING"
    ),
    "pg_description": "objoid INT, classoid INT, objsubid INT, description STRING",
    "pg_index": (
        # the column set SQLAlchemy's get_indexes/get_pk_constraint
        # introspection selects (empty view — no indexes exist here)
        "oid INT, indrelid INT, indexrelid INT, indisprimary BOOLEAN, "
        "indisunique BOOLEAN, indkey ARRAY<INT>, indoption ARRAY<INT>, "
        "indexprs STRING, indpred STRING, indnkeyatts SMALLINT, "
        "indnatts SMALLINT, indisclustered BOOLEAN, "
        "indisreplident BOOLEAN, indisvalid BOOLEAN, indisready BOOLEAN, "
        "tableoid INT"
    ),
    "pg_inherits": "inhrelid INT, inhparent INT, inhseqno INT",
    "pg_collation": (
        # full psql-15 \dO column set
        "oid INT, collname STRING, collnamespace INT, collowner INT, "
        "collencoding INT, collcollate STRING, collctype STRING, "
        "collprovider STRING, collisdeterministic BOOLEAN, "
        "collversion STRING, tableoid INT"
    ),
    # r10 exotic-describe battery (\dC \dL \drds \do \dO \dF \dd \dD) —
    # all empty by design in this emulation
    "pg_cast": (
        "oid INT, castsource INT, casttarget INT, castfunc INT, "
        "castcontext STRING, castmethod STRING, tableoid INT"
    ),
    "pg_language": (
        # tableoid: PG's implicit per-row column, psql \dL joins on it
        "oid INT, lanname STRING, lanowner INT, lanpltrusted BOOLEAN, "
        "lanplcallfoid INT, tableoid INT, laninline STRING, "
        "lanvalidator STRING, lanacl ARRAY<STRING>, lanispl BOOLEAN"
    ),
    "pg_db_role_setting": (
        "setdatabase INT, setrole INT, setconfig ARRAY<STRING>"
    ),
    "pg_operator": (
        "oid INT, oprname STRING, oprnamespace INT, oprleft INT, "
        "oprright INT, oprresult INT, oprcode STRING, oprkind STRING, "
        "oprowner INT, tableoid INT"
    ),
    "pg_opclass": (
        "oid INT, opcname STRING, opcnamespace INT, opcowner INT, "
        "opcintype INT, opcdefault BOOLEAN, opcmethod INT, tableoid INT"
    ),
    "pg_opfamily": (
        "oid INT, opfmethod INT, opfname STRING, opfnamespace INT, "
        "opfowner INT, tableoid INT"
    ),
    "pg_rewrite": (
        "oid INT, rulename STRING, ev_class INT, tableoid INT, "
        "ev_type STRING, is_instead BOOLEAN, ev_enabled STRING"
    ),
    "pg_trigger": (
        "oid INT, tgname STRING, tgrelid INT, tgconstraint INT, "
        "tgisinternal BOOLEAN, tableoid INT, tgfoid STRING, "
        "tgenabled STRING, tgdeferrable BOOLEAN, tginitdeferred BOOLEAN"
    ),
    "pg_am": (
        "oid INT, amname STRING, amhandler STRING, amtype STRING, "
        "tableoid INT"
    ),
    "pg_ts_config": (
        "oid INT, cfgname STRING, cfgnamespace INT, cfgowner INT, "
        "cfgparser INT, tableoid INT"
    ),
    "pg_conversion": (
        "oid INT, conname STRING, connamespace INT, conforencoding INT, "
        "contoencoding INT, condefault BOOLEAN, conowner INT, tableoid INT"
    ),
    "pg_policy": (
        # polroles is an oid array in PG; psql's \d row-security query
        # does `polroles = '{0}'` and `oid = any(polroles)` — the array
        # type (with the '{0}' literal rewrite) keeps both analyzable
        "polname STRING, polrelid INT, polcmd STRING, polroles ARRAY<INT>, "
        "polqual STRING, polwithcheck STRING, oid INT, tableoid INT"
    ),
    "pg_attribute": (
        "oid INT, attrelid INT, attname STRING, atttypid INT, attnotnull BOOLEAN, "
        "atthasdef BOOLEAN, atttypmod INT, attlen INT, attnum INT, "
        "attidentity STRING, attisdropped BOOLEAN, attcollation INT, "
        "attacl ARRAY<STRING>, "  # \dp column privileges (always NULL)
        "attstorage STRING, attstattarget INT, "  # psql 15 \d+ Storage col
        # pg_dump getTableAttrs column set
        "attalign STRING, attislocal BOOLEAN, attoptions ARRAY<STRING>, "
        "attfdwoptions ARRAY<STRING>, tableoid INT"
    ),
    "pg_proc": (
        "oid INT, proname STRING, prorettype INT, proargtypes ARRAY<INT>, "
        "pronamespace INT, proisagg BOOLEAN, proiswindow BOOLEAN, "
        "proretset BOOLEAN, pronargs SMALLINT, "
        # pg_dump getFuncs/getAggregates column set
        "prolang INT, proowner INT, proacl ARRAY<STRING>, tableoid INT"
    ),
    "pg_class": (
        "oid INT, reltablespace INT, relname STRING, reloftype INT, "
        "relpersistence STRING, relkind STRING, relnamespace INT, relowner INT, "
        "relacl ARRAY<STRING>, relchecks SMALLINT, reltoastrelid INT, "
        "relhasindex BOOLEAN, relhasrules BOOLEAN, relhastriggers BOOLEAN, "
        "relrowsecurity BOOLEAN, relforcerowsecurity BOOLEAN, relreplident STRING, "
        "reltriggers SMALLINT, relhasoids BOOLEAN, relispartition BOOLEAN, "
        "relpartbound STRING, reloptions ARRAY<STRING>, "  # \d+ storage opts
        "relam INT, "  # SQLAlchemy get_indexes joins pg_am on i.relam
        # pg_dump getTables column set
        "relpages INT, relallvisible INT, relfrozenxid INT, "
        "relminmxid INT, relispopulated BOOLEAN, reltype INT, tableoid INT"
    ),
    "pg_database": (
        "oid INT, datname STRING, datdba INT, encoding INT, datcollate STRING, "
        "datctype STRING, datacl ARRAY<STRING>, dattablespace INT, "
        # pg_dump -Fc dumpDatabase / pg_dumpall column set
        "datistemplate BOOLEAN, datconnlimit INT, datfrozenxid INT, "
        "datminmxid INT, datallowconn BOOLEAN, tableoid INT"
    ),
    # ---- pg_dump surface: object classes that don't exist in this
    # emulation (no text-search objects, FDWs, transforms, …) — all
    # empty WHERE-false views with the pg_dump-era column sets
    "pg_ts_parser": (
        "oid INT, prsname STRING, prsnamespace INT, prsstart STRING, "
        "prstoken STRING, prsend STRING, prsheadline STRING, "
        "prslextype STRING, tableoid INT"
    ),
    "pg_ts_dict": (
        "oid INT, dictname STRING, dictnamespace INT, dictowner INT, "
        "dicttemplate INT, dictinitoption STRING, tableoid INT"
    ),
    "pg_ts_template": (
        "oid INT, tmplname STRING, tmplnamespace INT, tmplinit STRING, "
        "tmpllexize STRING, tableoid INT"
    ),
    "pg_foreign_data_wrapper": (
        "oid INT, fdwname STRING, fdwowner INT, fdwhandler STRING, "
        "fdwvalidator STRING, fdwacl ARRAY<STRING>, "
        "fdwoptions ARRAY<STRING>, tableoid INT"
    ),
    "pg_foreign_server": (
        "oid INT, srvname STRING, srvowner INT, srvfdw INT, "
        "srvtype STRING, srvversion STRING, srvacl ARRAY<STRING>, "
        "srvoptions ARRAY<STRING>, tableoid INT"
    ),
    "pg_foreign_table": "ftrelid INT, ftserver INT, ftoptions ARRAY<STRING>",
    "pg_default_acl": (
        "oid INT, defaclrole INT, defaclnamespace INT, "
        "defaclobjtype STRING, defaclacl ARRAY<STRING>, tableoid INT"
    ),
    "pg_transform": (
        "oid INT, trftype INT, trflang INT, trffromsql STRING, "
        "trftosql STRING, tableoid INT"
    ),
    "pg_event_trigger": (
        "oid INT, evtname STRING, evtenabled STRING, evtevent STRING, "
        "evtowner INT, evttags ARRAY<STRING>, evtfoid STRING, tableoid INT"
    ),
    "pg_init_privs": (
        "objoid INT, classoid INT, objsubid INT, privtype STRING, "
        "initprivs ARRAY<STRING>"
    ),
    "pg_range": (
        "rngtypid INT, rngsubtype INT, rngmultitypid INT, "
        "rngcollation INT, rngsubopc INT, rngcanonical STRING, "
        "rngsubdiff STRING, tableoid INT"
    ),
    "pg_largeobject_metadata": (
        "oid INT, lomowner INT, lomacl ARRAY<STRING>, tableoid INT"
    ),
    "pg_largeobject": "loid INT, pageno INT, data BINARY",
    "pg_statistic_ext": (
        "oid INT, stxname STRING, stxnamespace INT, stxowner INT, "
        "stxrelid INT, stxstattarget INT, stxkeys ARRAY<INT>, tableoid INT"
    ),
    "pg_publication": (
        "oid INT, pubname STRING, pubowner INT, puballtables BOOLEAN, "
        "pubinsert BOOLEAN, pubupdate BOOLEAN, pubdelete BOOLEAN, "
        "pubtruncate BOOLEAN, pubviaroot BOOLEAN, tableoid INT"
    ),
    "pg_amop": (
        "oid INT, amopfamily INT, amoplefttype INT, amoprighttype INT, "
        "amopstrategy INT, amoppurpose STRING, amopopr INT, "
        "amopmethod INT, amopsortfamily INT, tableoid INT"
    ),
    "pg_amproc": (
        "oid INT, amprocfamily INT, amproclefttype INT, "
        "amprocrighttype INT, amprocnum INT, amproc STRING, tableoid INT"
    ),
    "pg_seclabel": (
        "objoid INT, classoid INT, objsubid INT, provider STRING, "
        "label STRING"
    ),
    "pg_shseclabel": "objoid INT, classoid INT, provider STRING, label STRING",
    "pg_seclabels": (  # the system VIEW pg_dump actually reads
        "objoid INT, classoid INT, objsubid INT, objtype STRING, "
        "objnamespace INT, objname STRING, provider STRING, label STRING"
    ),
    "pg_shdescription": "objoid INT, classoid INT, description STRING",
    "pg_sequence": (
        "seqrelid INT, seqtypid INT, seqstart BIGINT, seqincrement BIGINT, "
        "seqmax BIGINT, seqmin BIGINT, seqcache BIGINT, seqcycle BOOLEAN"
    ),
}

#: pg_tablespace rows (PG's builtin pair); \l+ joins dattablespace → oid
_TABLESPACES = ((1663, "pg_default"), (1664, "pg_global"))

#: Catalog relations that are empty BY DESIGN in this emulation (no
#: row policies, no extensions, no role grants, …). Created as
#: ``WHERE false`` VIEWS instead of parquet tables: the optimizer's
#: empty-relation propagation then erases whole subquery trees over
#: them — which matters because psql's \dp nests a correlated scalar
#: subquery INSIDE another correlated subquery's aggregate argument, a
#: shape Spark cannot decorrelate over a real scan (INTERNAL_ERROR:
#: Cannot generate code for expression: outer(...)) but folds away
#: over an empty LocalRelation.
_EMPTY_VIEW_TABLES = frozenset((
    "pg_attrdef", "pg_constraint", "pg_depend", "pg_description",
    "pg_index", "pg_inherits", "pg_collation", "pg_policy",
    "pg_auth_members", "pg_extension", "pg_cast", "pg_language",
    "pg_db_role_setting", "pg_operator", "pg_opclass", "pg_ts_config",
    "pg_conversion", "pg_opfamily", "pg_rewrite", "pg_trigger", "pg_am",
    "pg_ts_parser", "pg_ts_dict", "pg_ts_template",
    "pg_foreign_data_wrapper", "pg_foreign_server", "pg_foreign_table",
    "pg_default_acl", "pg_transform", "pg_event_trigger",
    "pg_init_privs", "pg_range", "pg_largeobject_metadata",
    "pg_largeobject", "pg_statistic_ext", "pg_publication",
    "pg_seclabel", "pg_shseclabel", "pg_shdescription", "pg_sequence",
    "pg_amop", "pg_amproc", "pg_seclabels",
))


def _empty_view_sql(name: str, schema: str) -> str:
    cols = ", ".join(
        f"CAST(NULL AS {c.split(' ', 1)[1]}) AS {c.split(' ', 1)[0]}"
        for c in schema.split(", ")
    )
    return (
        f"CREATE OR REPLACE VIEW {CATALOG_DB}.{name} AS "
        f"SELECT {cols} WHERE false"
    )


def table_oid(name: str) -> int:
    """Stable synthetic oid for a user table (crc32 into the >=10000 range)."""
    return 10000 + (zlib.crc32(name.encode()) % 2_000_000)


def _insert_catalog_rows(spark: SparkSession, rows, table: str) -> None:
    """Single-slice write of a tiny metadata relation.

    A default createDataFrame(list) parallelizes into
    defaultParallelism slices, so every catalog table was written as
    ~32 near-empty parquet files — and every later catalog scan (and
    the incremental collect path's per-partition fetch) paid for each
    of them (guide §6 small-files). One slice → one file. (A
    .coalesce(1) on the pickled frame is ~10x slower than slicing at
    parallelize time — measured.)"""
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1),
        schema=CATALOG_TABLE_SCHEMAS[table],
    ).write.insertInto(f"{CATALOG_DB}.{table}")


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
        # "typarray" is the r10 schema-revision marker (psql \dn/\du/
        # \dT/\db/\dx/\l+ catalog extension wave); "relam" is the first
        # r11 marker (SQLAlchemy introspection: pg_class.relam + the
        # full pg_index column set); pg_type "tableoid" is the second
        # r11 marker (pg_dump surface: tableoid everywhere + the
        # object-class relations pg_dump walks)
        cls_cols = {
            f.name for f in spark.table(f"{CATALOG_DB}.pg_class").schema.fields
        }
        # content probe (columns alone can't see a row-level revision):
        # builtin types must live in pg_catalog's namespace so pg_dump
        # (which dumps every type in a dumpable namespace) skips them
        builtin_ns_ok = False
        if "typnamespace" in cols:
            try:
                builtin_ns_ok = spark.sql(
                    f"SELECT typnamespace FROM {CATALOG_DB}.pg_type "
                    "WHERE oid = 16"
                ).collect()[0][0] == PG_CATALOG_NAMESPACE_OID
            except Exception:  # noqa: BLE001
                builtin_ns_ok = False
        if (
            "typtypmod" in cols and "typarray" in cols
            and "tableoid" in cols and builtin_ns_ok
            and "relam" in cls_cols and has_timeout_row
        ):
            init_information_schema(spark)  # idempotent view refresh
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
        # Spark 4 raises WRONG_COMMAND_FOR_OBJECT_TYPE (42809) when
        # DROP VIEW IF EXISTS hits an existing TABLE (and vice versa),
        # so a schema-revision rebuild over a persisted older catalog
        # (where a now-view relation was a parquet table) must tolerate
        # the kind mismatch instead of crashing at init.
        for drop in (
            f"DROP VIEW IF EXISTS {CATALOG_DB}.{name}",
            f"DROP TABLE IF EXISTS {CATALOG_DB}.{name}",
        ):
            try:
                spark.sql(drop)
            except Exception:  # AnalysisException: object-kind mismatch
                pass
        if name in _EMPTY_VIEW_TABLES:
            spark.sql(_empty_view_sql(name, schema))
        else:
            spark.sql(f"CREATE TABLE {CATALOG_DB}.{name} ({schema}) USING parquet")

    ns_oid, ns_name = DEFAULT_NAMESPACE
    spark.sql(
        f"INSERT INTO {CATALOG_DB}.pg_namespace "
        f"VALUES ({ns_oid}, '{ns_name}', {USER_ROLE_OID}, NULL, 2615), "
        f"({PG_CATALOG_NAMESPACE_OID}, 'pg_catalog', {USER_ROLE_OID}, "
        "NULL, 2615)"
    )
    spark.sql(
        f"INSERT INTO {CATALOG_DB}.pg_roles VALUES ({USER_ROLE_OID}, "
        "'spark-user', true, true, true, true, true, -1, NULL, false, false)"
    )
    spark.sql(
        f"INSERT INTO {CATALOG_DB}.pg_user VALUES ('spark-user', {USER_ROLE_OID})"
    )
    for ts_oid, ts_name in _TABLESPACES:
        spark.sql(
            f"INSERT INTO {CATALOG_DB}.pg_tablespace VALUES "
            f"({ts_oid}, '{ts_name}', {USER_ROLE_OID}, NULL, NULL)"
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
    _insert_catalog_rows(spark, settings_rows, "pg_settings")

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
        (2080, "pg_type_is_visible", 16),
        (2081, "pg_function_is_visible", 16),
        (2092, "array_upper", 23),
        (2162, "pg_get_function_arguments", 1043),
        (2165, "pg_get_function_result", 1043),
        (2168, "pg_database_size", 20),
        (2250, "has_database_privilege", 16),
        (2420, "oidvectortypes", 1043),
        (3166, "pg_size_pretty", 1043),
        (3415, "shobj_description", 1043),
        (3778, "pg_tablespace_location", 1043),
        (2098, "pg_get_functiondef", 1043),
        (1216, "col_description", 1043),
    ]
    proc_rows = [
        Row(
            oid=oid,
            proname=name,
            prorettype=rettype,
            proargtypes=[],
            # pg_catalog namespace: these are system functions, and
            # pg_dump's getFuncs (WHERE pronamespace != pg_catalog's
            # oid) must not try to dump them as user functions
            pronamespace=PG_CATALOG_NAMESPACE_OID,
            proisagg=False,
            proiswindow=False,
            proretset=False,
            pronargs=0,
            prolang=12,  # 'internal'
            proowner=USER_ROLE_OID,
            proacl=None,
            tableoid=1255,
        )
        for oid, name, rettype in _SYSTEM_PROCS
    ]
    _insert_catalog_rows(spark, proc_rows, "pg_proc")

    # typarray: base type → oid of its array type (the type whose
    # typelem points back at it); psql \dT uses it to suppress the
    # array shadow of every base type
    arr_of = {t.elemoid: t.oid for t in P.ALL_PG_TYPES if t.elemoid}
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
            # pg_catalog: these ARE PG's builtin types — r11 moved them
            # off the user namespace so pg_dump (which dumps every type
            # in a dumpable namespace) correctly skips them. pgjdbc's
            # bootstrap query still resolves: it LEFT JOINs the
            # current_schemas() subquery, and getTypeInfo's
            # pg_namespace join matches the pg_catalog row.
            typnamespace=PG_CATALOG_NAMESPACE_OID,
            typarray=arr_of.get(t.oid, 0),
            typdefault=None,
            typowner=USER_ROLE_OID,
            typacl=None,
            typisdefined=True,
            typstorage="x" if t.len == -1 else "p",
            tableoid=1247,
        )
        for t in P.ALL_PG_TYPES
    ]
    _insert_catalog_rows(spark, type_rows, "pg_type")

    refresh_runtime_catalog(spark)
    init_information_schema(spark)


#: PG's SQL-standard data_type spellings for information_schema.columns
_INFOSCHEMA_DATA_TYPES = {
    "int2": "smallint", "int4": "integer", "int8": "bigint",
    "float4": "real", "float8": "double precision",
    "varchar": "character varying", "bpchar": "character",
    "bool": "boolean", "timestamp": "timestamp without time zone",
    "timestamptz": "timestamp with time zone", "bytea": "bytea",
    "date": "date", "numeric": "numeric", "text": "text",
}


def init_information_schema(spark: SparkSession) -> None:
    """SQL-standard ``information_schema`` views over the pg_catalog
    emulation — beyond the reference (which ships only pg_catalog), but
    what BI/ELT tools (dbt, Metabase, Superset) actually query first.
    PG itself implements information_schema exactly this way: standard
    views over the system catalogs. All views delegate to the live
    pg_catalog tables, so refresh_runtime_catalog keeps them current;
    CREATE OR REPLACE makes re-init idempotent."""
    # pg_authid = pg_roles + rolpassword (NULL — no stored verifiers);
    # pg_dumpall --globals-only reads it for CREATE/ALTER ROLE output.
    # Lives here because this function runs on BOTH the fresh-build and
    # the revision-probe early-exit paths (idempotent CREATE OR REPLACE)
    spark.sql(
        f"CREATE OR REPLACE VIEW {CATALOG_DB}.pg_authid AS "
        f"SELECT *, CAST(NULL AS STRING) AS rolpassword "
        f"FROM {CATALOG_DB}.pg_roles"
    )
    spark.sql("CREATE DATABASE IF NOT EXISTS information_schema")
    dt_case = "CASE t.typname " + " ".join(
        f"WHEN '{k}' THEN '{v}'" for k, v in _INFOSCHEMA_DATA_TYPES.items()
    ) + " ELSE t.typname END"
    views = {
        "schemata": f"""
            SELECT 'spark' AS catalog_name, n.nspname AS schema_name,
                   'spark-user' AS schema_owner
            FROM {CATALOG_DB}.pg_namespace n
        """,
        "tables": f"""
            SELECT 'spark' AS table_catalog, n.nspname AS table_schema,
                   c.relname AS table_name,
                   CASE c.relkind WHEN 'r' THEN 'BASE TABLE'
                                  WHEN 'v' THEN 'VIEW' END AS table_type
            FROM {CATALOG_DB}.pg_class c
            JOIN {CATALOG_DB}.pg_namespace n ON n.oid = c.relnamespace
            WHERE c.relkind IN ('r', 'v')
        """,
        "views": f"""
            SELECT 'spark' AS table_catalog, n.nspname AS table_schema,
                   c.relname AS table_name,
                   CAST(NULL AS STRING) AS view_definition
            FROM {CATALOG_DB}.pg_class c
            JOIN {CATALOG_DB}.pg_namespace n ON n.oid = c.relnamespace
            WHERE c.relkind = 'v'
        """,
        "columns": f"""
            SELECT 'spark' AS table_catalog, n.nspname AS table_schema,
                   c.relname AS table_name, a.attname AS column_name,
                   a.attnum AS ordinal_position,
                   CAST(NULL AS STRING) AS column_default,
                   CASE WHEN a.attnotnull THEN 'NO' ELSE 'YES' END
                     AS is_nullable,
                   {dt_case} AS data_type,
                   CAST(NULL AS INT) AS character_maximum_length,
                   CAST(NULL AS INT) AS numeric_precision,
                   CAST(NULL AS INT) AS numeric_scale,
                   t.typname AS udt_name
            FROM {CATALOG_DB}.pg_attribute a
            JOIN {CATALOG_DB}.pg_class c ON c.oid = a.attrelid
            JOIN {CATALOG_DB}.pg_namespace n ON n.oid = c.relnamespace
            LEFT JOIN {CATALOG_DB}.pg_type t ON t.oid = a.atttypid
            WHERE a.attnum > 0 AND NOT a.attisdropped
        """,
        # constraint views: empty by design (delegate to the empty
        # pg_constraint view so the schemas stay authoritative)
        "table_constraints": f"""
            SELECT 'spark' AS constraint_catalog,
                   'spark' AS constraint_schema, conname AS constraint_name,
                   'spark' AS table_schema, CAST(NULL AS STRING) AS table_name,
                   contype AS constraint_type
            FROM {CATALOG_DB}.pg_constraint
        """,
        "key_column_usage": f"""
            SELECT 'spark' AS constraint_catalog,
                   'spark' AS constraint_schema, conname AS constraint_name,
                   'spark' AS table_schema, CAST(NULL AS STRING) AS table_name,
                   CAST(NULL AS STRING) AS column_name,
                   CAST(NULL AS INT) AS ordinal_position
            FROM {CATALOG_DB}.pg_constraint
        """,
        "referential_constraints": f"""
            SELECT 'spark' AS constraint_catalog,
                   'spark' AS constraint_schema, conname AS constraint_name,
                   confupdtype AS update_rule, confdeltype AS delete_rule
            FROM {CATALOG_DB}.pg_constraint
        """,
    }
    for name, body in views.items():
        spark.sql(
            f"CREATE OR REPLACE VIEW information_schema.{name} AS {body}"
        )


def refresh_runtime_catalog(spark: SparkSession) -> None:
    """(Re)populate pg_class / pg_attribute / pg_database from the live
    Spark catalog — the runtime half of the reference's catalog set."""
    ns_oid, _ = DEFAULT_NAMESPACE

    spark.sql(f"TRUNCATE TABLE {CATALOG_DB}.pg_database")
    db_rows = [
        Row(
            oid=table_oid(f"db:{db.name}"),
            datname=db.name,
            datdba=USER_ROLE_OID,
            encoding=6,  # UTF8
            datcollate="C",
            datctype="C",
            datacl=None,  # NULL = no ACL (pg_dump: parseable or absent)
            dattablespace=1663,  # pg_default
            datistemplate=False,
            datconnlimit=-1,
            datfrozenxid=0,
            datminmxid=0,
            datallowconn=True,
            tableoid=1262,
        )
        for db in spark.catalog.listDatabases()
    ]
    if db_rows:
        _insert_catalog_rows(spark, db_rows, "pg_database")

    #: the emulated system catalogs appear in pg_class too (namespace
    #: pg_catalog) so psql's \dS and \d pg_type resolve; schema-string
    #: types map to pg_type oids for their pg_attribute rows
    _SCHEMA_TYPE_OIDS = {
        "INT": 23, "SMALLINT": 21, "BIGINT": 20, "STRING": 1043,
        "BOOLEAN": 16, "TIMESTAMP": 1114,
        "ARRAY<INT>": 1007, "ARRAY<STRING>": 1009,
    }
    from spark_sql_server_spark.dialect.rewriter import (
        _CATALOG_RELATION_OIDS,
    )

    system_rels = [
        (
            _CATALOG_RELATION_OIDS.get(name, table_oid(name)),
            name,
            "v" if name in _EMPTY_VIEW_TABLES else "r",
            [c.split(" ", 1) for c in schema.split(", ")],
        )
        for name, schema in CATALOG_TABLE_SCHEMAS.items()
    ]

    tables = [
        (table_oid(t.name), t.name, "r", None)
        for t in spark.catalog.listTables()
        if t.database in (None, "", "default") or t.isTemporary
    ] + system_rels
    cls_rows = []
    attr_rows = []
    for oid, tname, relkind, sys_cols in tables:
        cls_rows.append(
            Row(
                oid=oid,
                reltablespace=0,
                relname=tname,
                reloftype=0,
                relpersistence="p",
                relkind=relkind,
                relnamespace=(
                    PG_CATALOG_NAMESPACE_OID if sys_cols is not None
                    else ns_oid
                ),
                relowner=USER_ROLE_OID,
                relacl=None,  # NULL = no ACL (pg_dump: parseable or absent)
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
                reloptions=None,
                relam=0,
                relpages=0,
                relallvisible=0,
                relfrozenxid=0,
                relminmxid=0,
                relispopulated=True,
                reltype=0,
                tableoid=1259,
            )
        )
        if sys_cols is not None:
            cols = [
                (cname, _SCHEMA_TYPE_OIDS.get(ctype.upper(), 1043), -1, True)
                for cname, ctype in sys_cols
            ]
        else:
            try:
                listed = spark.catalog.listColumns(tname)
            except Exception:
                continue
            cols = []
            for c in listed:
                try:
                    from pyspark.sql.types import _parse_datatype_string

                    pgt = P.pg_type_for(_parse_datatype_string(c.dataType))
                except Exception:
                    pgt = P.VARCHAR
                cols.append((c.name, pgt.oid, pgt.len, c.nullable))
        for i, (cname, ctypid, clen, cnullable) in enumerate(cols):
            attr_rows.append(
                Row(
                    oid=0,
                    attrelid=oid,
                    attname=cname,
                    atttypid=ctypid,
                    attnotnull=not cnullable,
                    atthasdef=False,
                    atttypmod=-1,
                    attlen=clen,
                    attnum=i + 1,
                    attidentity="",
                    attisdropped=False,
                    attcollation=0,
                    attacl=None,
                    # 'x' (extended) for varlena types, 'p' for fixed
                    attstorage="x" if clen == -1 else "p",
                    attstattarget=-1,
                    attalign="i",
                    attislocal=True,
                    attoptions=None,
                    attfdwoptions=None,
                    tableoid=1249,
                )
            )

    spark.sql(f"TRUNCATE TABLE {CATALOG_DB}.pg_class")
    if cls_rows:
        _insert_catalog_rows(spark, cls_rows, "pg_class")
    spark.sql(f"TRUNCATE TABLE {CATALOG_DB}.pg_attribute")
    if attr_rows:
        _insert_catalog_rows(spark, attr_rows, "pg_attribute")
