"""Statement classification / interception ahead of Spark.

PG clients open every connection with transaction and SET commands the
server must handle itself (SURVEY.md §2.A22-A23):

* ``BEGIN`` → no-op, reply ``CommandComplete("BEGIN")`` (reference
  ``commands.scala:30-32``, ``protocol.scala:461-463``).
* ``COMMIT`` / ``ROLLBACK`` → error "Operation not allowed" — the
  reference rejects them (test ``PgJdbcSuite.scala:1135-1142``).
* ``SET key = value`` → apply to the session conf, return **zero rows**
  (clients hang otherwise, ``protocol.scala:626-638``); ``SET`` of the
  scheduler-pool key switches the fair-scheduler pool.
* ``SELECT/…`` → normal query path through the dialect rewriter.
"""

from __future__ import annotations

import enum
import re
from dataclasses import dataclass


class StatementClass(enum.Enum):
    QUERY = "query"
    BEGIN = "begin"
    COMMIT = "commit"
    ROLLBACK = "rollback"
    SET = "set"
    SHOW_SET = "show_set"  # `SET` with no args / `SET -v`: show all conf
    EMPTY = "empty"
    DEALLOCATE = "deallocate"
    COPY_OUT = "copy_out"  # COPY ... TO STDOUT — our extension
                           # (the reference rejects COPY, protocol.scala:679-701)
    COPY_IN = "copy_in"    # COPY table FROM STDIN — ingest extension
    DECLARE_CURSOR = "declare_cursor"  # SQL-level cursors — our extension
    FETCH = "fetch"                    # (psycopg2 named cursors use these;
    CLOSE_CURSOR = "close_cursor"      #  the reference has only protocol portals)
    PREPARE = "prepare"        # SQL-level PREPARE name [(types)] AS query
    EXECUTE_STMT = "execute"   # EXECUTE name [(arg exprs)]
    SHOW_GUC = "show_guc"      # PG `SHOW <setting>` / `SHOW ALL` (Spark's
                               # own SHOW TABLES/… passes through as QUERY)
    RESET = "reset"            # PG `RESET <setting>` / `RESET ALL` — undo SET
    SET_CONFIG = "set_config"  # SELECT set_config('name','value',is_local)
                               # — SET spelled as a function (pg_dump's
                               # first statement clears search_path this
                               # way); is_local=true would be
                               # transaction-scoped in PG, session-scoped
                               # here (no transactions — documented)
    BACKEND_CTL = "backend_ctl"  # SELECT pg_cancel_backend(pid) /
                                 # pg_terminate_backend(pid) — admin surface
    LISTEN = "listen"      # PG LISTEN channel
    UNLISTEN = "unlisten"  # PG UNLISTEN channel | *
    NOTIFY = "notify"      # PG NOTIFY channel [, 'payload']
    DISCARD = "discard"        # PG `DISCARD ALL|PLANS|SEQUENCES|TEMP` —
                               # pgbouncer sends DISCARD ALL between clients
    MAINT = "maint"            # PG maintenance statements with nothing to do
                               # on Spark (no dead tuples, no PG indexes):
                               # VACUUM / CHECKPOINT / REINDEX / bare ANALYZE
                               # complete as no-ops with their PG tags so
                               # maintenance scripts and ORMs don't error
                               # (Spark's own ANALYZE TABLE/TABLES still
                               # passes through and runs for real)
    UPDATE_DELETE = "update_delete"  # PG UPDATE/DELETE — emulated over
                               # immutable Spark storage (dialect/dml.py):
                               # temp views + wire-created managed tables
                               # get a SELECT-rewrite + relation replace;
                               # everything else a clean 0A000, never a
                               # raw Spark stack trace (r11 VERDICT 3)


@dataclass
class Statement:
    cls: StatementClass
    sql: str
    #: for SET: (key, value)
    set_kv: tuple[str, str] | None = None
    #: PG tag for CommandComplete
    tag: str = ""
    #: for COPY_OUT: the inner SELECT and the output format ('text'|'csv')
    copy_query: str | None = None
    copy_format: str = "text"
    copy_header: bool = False
    #: for DECLARE/FETCH/CLOSE: cursor name; FETCH also carries a count
    cursor_name: str | None = None
    fetch_count: int | None = None  # None → ALL
    #: FETCH/MOVE direction keyword (NEXT/PRIOR/FIRST/LAST/ABSOLUTE/
    #: RELATIVE/FORWARD/BACKWARD/ALL); None for plain `FETCH [n]`
    fetch_direction: str | None = None
    #: MOVE repositions without returning rows
    fetch_move: bool = False
    #: DECLARE ... SCROLL CURSOR — backward/absolute FETCH allowed
    cursor_scroll: bool = False
    #: COPY WITH (DELIMITER 'x' / NULL 'marker') overrides
    copy_delim: str | None = None
    copy_null: str | None = None
    #: for PREPARE: declared parameter count (None → infer from max $n)
    prepare_nparams: int | None = None


_DECLARE_RE = re.compile(
    r"^\s*DECLARE\s+(?P<name>[\w\"]+)\s+(?P<opts>(?:BINARY\s+|INSENSITIVE\s+|"
    r"NO\s+SCROLL\s+|SCROLL\s+)*)CURSOR\s+(?:WITH(?:OUT)?\s+HOLD\s+)?FOR\s+"
    r"(?P<query>.+)$",
    re.IGNORECASE | re.DOTALL,
)

#: PG FETCH/MOVE grammar: [direction] [count] [FROM|IN] cursor.
#: NEXT/PRIOR/FIRST/LAST take no count; ABSOLUTE/RELATIVE require one
#: (may be negative); FORWARD/BACKWARD take an optional count or ALL;
#: a bare signed count means FORWARD n (negative → BACKWARD |n|).
_FETCH_RE = re.compile(
    r"^\s*(?P<verb>FETCH|MOVE)\s+"
    r"(?:(?P<dir>NEXT|PRIOR|FIRST|LAST|ABSOLUTE|RELATIVE|FORWARD|BACKWARD"
    r"|ALL)\s+)?"
    r"(?P<count>[+-]?\d+|ALL)?\s*"
    r"(?:FROM\s+|IN\s+)?(?P<name>[\w\"]+)\s*$",
    re.IGNORECASE,
)

_CLOSE_RE = re.compile(r"^\s*CLOSE\s+(?P<name>[\w\"]+|ALL)\s*$", re.IGNORECASE)

#: types group tolerates one paren-nesting level so parameterized types
#: like ``(DECIMAL(10,2), VARCHAR(20))`` parse (the types themselves are
#: only *counted* — Spark's analyzer coerces the spliced expressions)
_PREPARE_RE = re.compile(
    r"^\s*PREPARE\s+(?P<name>[\w\"]+)\s*"
    r"(?:\((?P<types>[^()]*(?:\([^()]*\)[^()]*)*)\))?\s+AS\s+"
    r"(?P<query>.+)$",
    re.IGNORECASE | re.DOTALL,
)

_EXECUTE_RE = re.compile(
    r"^\s*EXECUTE\s+(?P<name>[\w\"]+)\s*(?:\((?P<args>.*)\))?\s*$",
    re.IGNORECASE | re.DOTALL,
)

_DEALLOCATE_RE = re.compile(
    r"^\s*DEALLOCATE\s+(?:PREPARE\s+)?(?P<name>[\w\"]+|ALL)\s*$",
    re.IGNORECASE,
)


def split_top_level_commas(raw: str) -> list[str]:
    """Split an EXECUTE argument list on commas outside quotes/parens."""
    out: list[str] = []
    buf: list[str] = []
    depth = 0
    in_str = in_qid = False
    i = 0
    while i < len(raw):
        ch = raw[i]
        nxt = raw[i + 1] if i + 1 < len(raw) else ""
        if in_str:
            buf.append(ch)
            if ch == "'":
                if nxt == "'":
                    buf.append(nxt)
                    i += 1
                else:
                    in_str = False
        elif in_qid:
            buf.append(ch)
            if ch == '"':
                in_qid = False
        elif ch == "'":
            in_str = True
            buf.append(ch)
        elif ch == '"':
            in_qid = True
            buf.append(ch)
        elif ch == "(":
            depth += 1
            buf.append(ch)
        elif ch == ")":
            depth -= 1
            buf.append(ch)
        elif ch == "," and depth == 0:
            out.append("".join(buf).strip())
            buf = []
        else:
            buf.append(ch)
        i += 1
    tail = "".join(buf).strip()
    if tail:
        out.append(tail)
    return out


def count_placeholders(sql: str) -> int:
    """Highest ``$n`` referenced outside string literals / quoted
    identifiers — PG's inferred parameter count when PREPARE declares
    no type list."""
    top = 0
    in_str = in_qid = False
    i = 0
    while i < len(sql):
        ch = sql[i]
        nxt = sql[i + 1] if i + 1 < len(sql) else ""
        if in_str:
            if ch == "'":
                if nxt == "'":
                    i += 1
                else:
                    in_str = False
        elif in_qid:
            if ch == '"':
                in_qid = False
        elif ch == "'":
            in_str = True
        elif ch == '"':
            in_qid = True
        elif ch == "$" and nxt.isdigit():
            j = i + 1
            while j < len(sql) and sql[j].isdigit():
                j += 1
            top = max(top, int(sql[i + 1 : j]))
            i = j - 1
        i += 1
    return top


def substitute_params(sql: str, args: list[str]) -> str:
    """Replace ``$n`` placeholders (outside string literals / quoted
    identifiers) with the n-th argument expression, parenthesized —
    PG's EXECUTE evaluates argument *expressions*, so textual splice of
    already-valid SQL fragments is the faithful move."""
    out: list[str] = []
    in_str = in_qid = False
    i = 0
    while i < len(sql):
        ch = sql[i]
        nxt = sql[i + 1] if i + 1 < len(sql) else ""
        if in_str:
            out.append(ch)
            if ch == "'":
                if nxt == "'":
                    out.append(nxt)
                    i += 1
                else:
                    in_str = False
        elif in_qid:
            out.append(ch)
            if ch == '"':
                in_qid = False
        elif ch == "'":
            in_str = True
            out.append(ch)
        elif ch == '"':
            in_qid = True
            out.append(ch)
        elif ch == "$" and nxt.isdigit():
            j = i + 1
            while j < len(sql) and sql[j].isdigit():
                j += 1
            n = int(sql[i + 1 : j])
            if n < 1 or n > len(args):
                raise ValueError(
                    f"there is no parameter ${n} (statement takes {len(args)})"
                )
            out.append(f"({args[n - 1]})")
            i = j - 1
        else:
            out.append(ch)
        i += 1
    return "".join(out)


_COPY_RE = re.compile(
    r"^\s*COPY\s+(?P<src>\((?P<query>.*)\)|[\w.\"]+)"
    r"\s*(?:\((?P<cols>[^)]*)\))?\s+TO\s+STDOUT"
    r"(?P<opts>.*)$",
    re.IGNORECASE | re.DOTALL,
)


def _strip_pg_schema(name: str) -> str:
    """Drop a leading user-namespace qualifier (pg_dump emits
    ``COPY spark.region (…) TO stdout`` — the registered views are
    session-level, unqualified in Spark)."""
    head, _, tail = name.partition(".")
    if tail and head.strip('"') in ("spark", "public"):
        return tail
    return name

_COPY_IN_RE = re.compile(
    r"^\s*COPY\s+(?P<table>[\w.\"]+)\s*(?:\((?P<cols>[^)]*)\))?\s+FROM\s+STDIN"
    r"(?P<opts>.*)$",
    re.IGNORECASE | re.DOTALL,
)


_COPY_DELIM_RE = re.compile(
    r"DELIMITER\s+(?:AS\s+)?E?'(?P<d>(?:[^']|'')+)'", re.IGNORECASE
)
_COPY_NULL_RE = re.compile(
    r"NULL\s+(?:AS\s+)?'(?P<n>(?:[^']|'')*)'", re.IGNORECASE
)


def _copy_options(opts: str) -> tuple[str | None, str | None]:
    """(delimiter, null marker) from a COPY options tail — PG accepts
    both the modern ``WITH (FORMAT CSV, DELIMITER ';')`` and the legacy
    ``WITH DELIMITER AS ';'`` spellings."""
    delim = null = None
    m = _COPY_DELIM_RE.search(opts)
    if m:
        delim = m.group("d").replace("''", "'")
        if delim == "\\t":
            delim = "\t"
        if len(delim) != 1:
            # PG rejects these up front; without this check the
            # single-char splitters silently produce one-column rows
            raise ValueError(
                "COPY delimiter must be a single one-byte character"
            )
    m = _COPY_NULL_RE.search(opts)
    if m:
        null = m.group("n").replace("''", "'")
    return delim, null


_LISTEN_RE = re.compile(r"^\s*LISTEN\s+(?P<ch>[\w\"]+)\s*$", re.IGNORECASE)
_UNLISTEN_RE = re.compile(
    r"^\s*UNLISTEN\s+(?P<ch>[\w\"]+|\*)\s*$", re.IGNORECASE
)
_NOTIFY_RE = re.compile(
    r"^\s*NOTIFY\s+(?P<ch>[\w\"]+)\s*(?:,\s*'(?P<payload>(?:[^']|'')*)')?\s*$",
    re.IGNORECASE,
)

def _fold_channel(raw: str) -> str:
    """PG folds unquoted identifiers to lowercase — ``LISTEN Foo`` +
    ``NOTIFY foo`` must deliver. Double-quoted names stay verbatim."""
    if len(raw) >= 2 and raw.startswith('"') and raw.endswith('"'):
        return raw[1:-1].replace('""', '"')
    return raw.lower()


_SET_CONFIG_RE = re.compile(
    r"^\s*SELECT\s+(?:pg_catalog\.)?set_config\s*\(\s*"
    r"'(?P<name>[^']*)'\s*,\s*(?:'(?P<val>[^']*)'|(?P<null>NULL))\s*,\s*"
    r"(?P<local>true|false)\s*\)\s*$",
    re.IGNORECASE,
)

_BACKEND_RE = re.compile(
    r"^\s*SELECT\s+pg_(?P<kind>cancel|terminate)_backend\s*"
    r"\(\s*(?P<pid>\d+)\s*\)\s*$",
    re.IGNORECASE,
)

_SET_RE = re.compile(
    r"^\s*SET\s+(?:SESSION\s+|LOCAL\s+)?(?P<key>[A-Za-z_][\w.]*)\s*"
    r"(?:=|\s+TO\s+)\s*(?P<val>.+?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)


def split_statements(raw: str) -> list[str]:
    """Split a simple-query string on top-level semicolons.

    The reference rejects multi-statement strings
    (``protocol.scala:605-608``); we support them (SURVEY §7 "What is
    hard" item 3) since psql sends them routinely.
    """
    out: list[str] = []
    buf: list[str] = []
    in_str = in_qid = False
    in_line_comment = in_block_comment = False
    i = 0
    while i < len(raw):
        ch = raw[i]
        nxt = raw[i + 1] if i + 1 < len(raw) else ""
        if in_line_comment:
            buf.append(ch)
            if ch == "\n":
                in_line_comment = False
        elif in_block_comment:
            buf.append(ch)
            if ch == "*" and nxt == "/":
                buf.append(nxt)
                i += 1
                in_block_comment = False
        elif in_str:
            buf.append(ch)
            if ch == "'":
                if nxt == "'":
                    buf.append(nxt)
                    i += 1
                else:
                    in_str = False
        elif in_qid:
            buf.append(ch)
            if ch == '"':
                in_qid = False
        elif ch == "'":
            in_str = True
            buf.append(ch)
        elif ch == '"':
            in_qid = True
            buf.append(ch)
        elif ch == "-" and nxt == "-":
            in_line_comment = True
            buf.append(ch)
        elif ch == "/" and nxt == "*":
            in_block_comment = True
            buf.append(ch)
        elif ch == ";":
            s = "".join(buf).strip()
            if s:
                out.append(s)
            buf = []
        else:
            buf.append(ch)
        i += 1
    s = "".join(buf).strip()
    if s:
        out.append(s)
    return [e for stmt in out for e in _expand_multi_drop(stmt)]


_ALTER_OWNER_RE = re.compile(
    r"^\s*ALTER\s+(?P<kind>TABLE|SCHEMA|VIEW|DATABASE|SEQUENCE|TYPE|FUNCTION)"
    r"\s+[\w.\"]+\s+OWNER\s+TO\s+[\w\"-]+\s*$",
    re.IGNORECASE,
)

_CREATE_USER_SCHEMA_RE = re.compile(
    r"^\s*CREATE\s+SCHEMA\s+(?:IF\s+NOT\s+EXISTS\s+)?(?:spark|public)\s*$",
    re.IGNORECASE,
)

_MULTI_DROP_RE = re.compile(
    r"^\s*DROP\s+(?P<kind>TABLE|VIEW)\s+(?P<ifex>IF\s+EXISTS\s+)?"
    r"(?P<names>[\w.\"]+(?:\s*,\s*[\w.\"]+)+)\s*(?P<tail>CASCADE|RESTRICT)?\s*$",
    re.IGNORECASE,
)

_MULTI_TRUNCATE_RE = re.compile(
    r"^\s*TRUNCATE\s+(?:TABLE\s+)?"
    r"(?P<names>[\w.\"]+(?:\s*,\s*[\w.\"]+)+)\s*$",
    re.IGNORECASE,
)


def _expand_multi_drop(stmt: str) -> list[str]:
    """PG allows ``DROP TABLE a, b, c`` and ``TRUNCATE a, b, c``; Spark
    takes one relation per statement. Expand the list forms (pgbench -i
    leads with a 4-table drop + truncate) — names can't contain
    top-level commas, so a plain split is exact."""
    m = _MULTI_DROP_RE.match(stmt)
    if m:
        kind = m.group("kind")
        ifex = "IF EXISTS " if m.group("ifex") else ""
        return [
            f"DROP {kind} {ifex}{name.strip()}"
            for name in m.group("names").split(",")
        ]
    m = _MULTI_TRUNCATE_RE.match(stmt)
    if m:
        return [
            f"TRUNCATE TABLE {name.strip()}"
            for name in m.group("names").split(",")
        ]
    return [stmt]


def classify_statement(sql: str) -> Statement:
    s = sql.strip().rstrip(";").strip()
    if not s:
        return Statement(StatementClass.EMPTY, sql)
    word0 = s.split(None, 1)[0].upper()
    if word0 == "BEGIN" or (
        word0 == "START" and s.upper().startswith("START TRANSACTION")
    ):
        return Statement(StatementClass.BEGIN, sql, tag="BEGIN")
    if word0 in ("COMMIT", "END"):
        return Statement(StatementClass.COMMIT, sql, tag="COMMIT")
    if word0 in ("VACUUM", "CHECKPOINT", "REINDEX"):
        return Statement(StatementClass.MAINT, sql, tag=word0)
    if word0 in ("UPDATE", "DELETE"):
        # emulated DML (dialect/dml.py); Spark's native parser has no
        # usable UPDATE/DELETE for these tables — intercept both
        return Statement(StatementClass.UPDATE_DELETE, sql, tag=word0)
    if word0 == "ALTER":
        m = _ALTER_OWNER_RE.match(s)
        if m:
            # pg_dump emits ALTER <kind> x OWNER TO role after every
            # object; single-role emulation — nothing to change
            return Statement(
                StatementClass.MAINT, sql,
                tag=f"ALTER {m.group('kind').upper()}",
            )
    if word0 == "CREATE":
        m = _CREATE_USER_SCHEMA_RE.match(s)
        if m:
            # the 'spark'/'public' namespace already exists by the
            # catalog fiction (nspname 'spark' IS Spark's default db) —
            # restoring a dump of this server must not error on it
            return Statement(
                StatementClass.MAINT, sql, tag="CREATE SCHEMA",
            )
    if word0 == "LOCK":
        # pg_dump takes ACCESS SHARE locks on every dumped table; no
        # lock manager here (reads are snapshot-isolated parquet scans)
        return Statement(StatementClass.MAINT, sql, tag="LOCK TABLE")
    if word0 in ("ANALYZE", "ANALYSE"):
        words = s.split(None, 2)
        if len(words) == 1 or words[1].upper() not in ("TABLE", "TABLES"):
            # PG `ANALYZE [table [(cols)]]` — Spark's ANALYZE TABLE(S)
            # statements fall through and execute for real
            return Statement(StatementClass.MAINT, sql, tag="ANALYZE")
    if word0 in ("ROLLBACK", "ABORT"):
        return Statement(StatementClass.ROLLBACK, sql, tag="ROLLBACK")
    if word0 == "DEALLOCATE":
        m = _DEALLOCATE_RE.match(s)
        name = m.group("name").strip('"') if m else "ALL"
        return Statement(
            StatementClass.DEALLOCATE,
            sql,
            cursor_name=name,  # reuse field for the statement name
            tag="DEALLOCATE ALL" if name.upper() == "ALL" else "DEALLOCATE",
        )
    if word0 == "PREPARE":
        m = _PREPARE_RE.match(s)
        if m:
            types = m.group("types")
            nparams = (
                len([t for t in split_top_level_commas(types) if t.strip()])
                if types is not None
                else None
            )
            return Statement(
                StatementClass.PREPARE,
                sql,
                cursor_name=m.group("name").strip('"'),
                copy_query=m.group("query").strip(),
                tag="PREPARE",
                prepare_nparams=nparams,
            )
    if word0 == "EXECUTE":
        m = _EXECUTE_RE.match(s)
        if m:
            return Statement(
                StatementClass.EXECUTE_STMT,
                sql,
                cursor_name=m.group("name").strip('"'),
                copy_query=m.group("args"),  # raw arg list (may be None)
            )
    if word0 == "DECLARE":
        m = _DECLARE_RE.match(s)
        if m:
            opts = (m.group("opts") or "").upper()
            return Statement(
                StatementClass.DECLARE_CURSOR,
                sql,
                cursor_name=m.group("name").strip('"'),
                copy_query=m.group("query").strip(),
                tag="DECLARE CURSOR",
                # "NO SCROLL" contains "SCROLL" — check the negation first
                cursor_scroll="SCROLL" in opts and "NO SCROLL" not in opts,
            )
    if word0 in ("FETCH", "MOVE"):
        m = _FETCH_RE.match(s)
        if m:
            count = m.group("count")
            direction = (m.group("dir") or "").upper() or None
            is_all = count is not None and count.upper() == "ALL"
            if direction in ("FORWARD", "BACKWARD") and is_all:
                # FORWARD ALL / BACKWARD ALL vs bare FORWARD (= 1 row)
                direction = f"{direction} ALL"
            elif direction is None and is_all:
                direction = "ALL"
            return Statement(
                StatementClass.FETCH,
                sql,
                cursor_name=m.group("name").strip('"'),
                fetch_count=None if count in (None, "") or is_all
                else int(count),
                fetch_direction=direction,
                fetch_move=m.group("verb").upper() == "MOVE",
            )
    if word0 == "CLOSE":
        m = _CLOSE_RE.match(s)
        if m:
            return Statement(
                StatementClass.CLOSE_CURSOR,
                sql,
                cursor_name=m.group("name").strip('"'),
                tag="CLOSE CURSOR",
            )
    if word0 == "COPY":
        m = _COPY_IN_RE.match(s)
        if m:
            raw_opts = m.group("opts") or ""
            opts = raw_opts.upper()
            cols = m.group("cols")
            delim, null = _copy_options(raw_opts)
            return Statement(
                StatementClass.COPY_IN,
                sql,
                cursor_name=_strip_pg_schema(
                    m.group("table")
                ).strip('"'),  # reuse field for table
                copy_query=cols.strip() if cols else None,  # reuse for column list
                copy_format="binary" if "BINARY" in opts
                else "csv" if "CSV" in opts else "text",
                copy_header="HEADER" in opts,
                copy_delim=delim,
                copy_null=null,
            )
        m = _COPY_RE.match(s)
        if m:
            inner = m.group("query")
            if inner is None:
                cols = (m.group("cols") or "").strip()
                src = _strip_pg_schema(m.group("src"))
                inner = f"SELECT {cols or '*'} FROM {src}"
            raw_opts = m.group("opts") or ""
            opts = raw_opts.upper()
            delim, null = _copy_options(raw_opts)
            return Statement(
                StatementClass.COPY_OUT,
                sql,
                copy_query=inner.strip(),
                copy_format="binary" if "BINARY" in opts
                else "csv" if "CSV" in opts else "text",
                copy_header="HEADER" in opts,
                copy_delim=delim,
                copy_null=null,
            )
        # COPY FROM etc. falls through as a query → Spark will reject it
    if word0 == "SHOW":
        rest = s.split(None, 1)[1].strip() if len(s.split(None, 1)) > 1 else ""
        up = rest.upper()
        if up == "TRANSACTION ISOLATION LEVEL":
            return Statement(
                StatementClass.SHOW_GUC, sql,
                cursor_name="transaction_isolation", tag="SHOW",
            )
        if up == "ALL":
            return Statement(
                StatementClass.SHOW_GUC, sql, cursor_name="ALL", tag="SHOW",
            )
        # a single identifier that is NOT a Spark SHOW object keyword is
        # a PG setting name; everything else (SHOW TABLES [IN db], SHOW
        # FUNCTIONS LIKE …) stays a Spark query
        if re.fullmatch(r"[A-Za-z_][\w.]*", rest) and up not in (
            "TABLES", "DATABASES", "SCHEMAS", "NAMESPACES", "VIEWS",
            "FUNCTIONS", "COLUMNS", "PARTITIONS", "CATALOGS",
            "TBLPROPERTIES", "USER",
        ):
            return Statement(
                StatementClass.SHOW_GUC, sql, cursor_name=rest, tag="SHOW",
            )
    if word0 == "SELECT":
        m = _SET_CONFIG_RE.match(s)
        if m:
            return Statement(
                StatementClass.SET_CONFIG, sql,
                set_kv=(m.group("name"),
                        "" if m.group("null") else m.group("val")),
                tag="SELECT 1",
            )
        m = _BACKEND_RE.match(s)
        if m:
            # monitoring tools issue these verbatim; the pid is a server
            # session pid (pg_stat_activity.pid), handled server-side
            return Statement(
                StatementClass.BACKEND_CTL, sql,
                cursor_name=m.group("pid"),
                copy_query=m.group("kind").lower(),
                tag="SELECT 1",
            )
    if word0 == "LISTEN":
        m = _LISTEN_RE.match(s)
        if m:
            return Statement(
                StatementClass.LISTEN, sql,
                cursor_name=_fold_channel(m.group("ch")), tag="LISTEN",
            )
    if word0 == "UNLISTEN":
        m = _UNLISTEN_RE.match(s)
        if m:
            ch = m.group("ch")
            return Statement(
                StatementClass.UNLISTEN, sql,
                cursor_name=ch if ch == "*" else _fold_channel(ch),
                tag="UNLISTEN",
            )
    if word0 == "NOTIFY":
        m = _NOTIFY_RE.match(s)
        if m:
            payload = (m.group("payload") or "").replace("''", "'")
            return Statement(
                StatementClass.NOTIFY, sql,
                cursor_name=_fold_channel(m.group("ch")),
                copy_query=payload, tag="NOTIFY",
            )
    if word0 == "RESET":
        # PG RESET <name> / RESET ALL (Spark's bare `RESET` — reset every
        # conf — has no name and passes through as a query)
        rest = s.split(None, 1)[1].strip() if len(s.split(None, 1)) > 1 else ""
        if re.fullmatch(r"[A-Za-z_][\w.]*", rest):
            return Statement(
                StatementClass.RESET, sql, cursor_name=rest, tag="RESET"
            )
    if word0 == "DISCARD":
        rest = (s.split(None, 1)[1].strip().upper()
                if len(s.split(None, 1)) > 1 else "")
        if rest in ("ALL", "PLANS", "SEQUENCES", "TEMP", "TEMPORARY"):
            target = "TEMP" if rest == "TEMPORARY" else rest
            return Statement(
                StatementClass.DISCARD, sql, cursor_name=target,
                tag=f"DISCARD {target}",
            )
    if word0 == "SET":
        rest_up = s.split(None, 2)
        if len(rest_up) > 1 and rest_up[1].upper() in (
            "TRANSACTION",
            "CONSTRAINTS",
        ) or s.upper().startswith("SET SESSION CHARACTERISTICS"):
            # no transactions / constraint triggers to configure —
            # complete with the PG tag (pg_dump sets REPEATABLE READ,
            # READ ONLY right after BEGIN)
            return Statement(StatementClass.MAINT, sql, tag="SET")
        m = _SET_RE.match(s)
        if m:
            val = m.group("val").strip()
            if val.upper() == "DEFAULT":
                # PG: `SET x TO DEFAULT` ≡ `RESET x`
                return Statement(
                    StatementClass.RESET, sql,
                    cursor_name=m.group("key"), tag="SET",
                )
            if len(val) >= 2 and val[0] == "'" and val[-1] == "'":
                val = val[1:-1].replace("''", "'")
            return Statement(
                StatementClass.SET, sql, set_kv=(m.group("key"), val), tag="SET"
            )
        return Statement(StatementClass.SHOW_SET, sql, tag="SET")
    return Statement(StatementClass.QUERY, sql)
