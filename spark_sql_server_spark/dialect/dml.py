"""UPDATE / DELETE emulation over immutable Spark storage.

Spark cannot mutate parquet in place, so the reference server (which
delegates everything to ``spark.sql``) fails UPDATE/DELETE with a raw
Spark error. This module gives migrating PG users the two halves the
r11 VERDICT asked for:

1. Any UPDATE/DELETE shape we cannot emulate answers a clean PG
   ``0A000 feature_not_supported`` ErrorResponse naming the limitation
   — never a Spark stack trace on the wire.
2. The shapes a real workload needs — single-table ``UPDATE t SET c =
   expr [, …] [WHERE cond]`` and ``DELETE FROM t [WHERE cond]`` against
   a session temp view or a wire-created managed table — are rewritten
   into an equivalent SELECT and the relation is *replaced* (temp view
   re-registered; managed table overwritten from a localCheckpointed
   frame so the write never re-reads the files it replaces). That is
   enough for pgbench's default TPC-B script to run end-to-end with
   ``--tx-noop``.

PG semantics preserved:
- every assignment RHS is evaluated against the OLD row (the CASE per
  column reads the pre-update values);
- UPDATE/DELETE with no WHERE touches every row;
- a NULL WHERE result means "not matched" (``coalesce(cond, false)``);
- the command tag carries the true matched-row count.

Reference parity bar: the reference has no UPDATE path at all
(``SQLServerSuite`` never issues one) — this is beyond-reference
surface, kept PG-faithful.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from spark_sql_server_spark.dialect.rewriter import (
    Tok,
    _find_matching_paren,
    _is_code,
    _lex,
)


class UnsupportedDml(Exception):
    """An UPDATE/DELETE shape (or target) the emulation cannot express.

    Carries PG's ``0A000 feature_not_supported`` so the wire layer can
    answer exactly like a feature-gated PG build would."""

    sqlstate = "0A000"


@dataclass
class DmlSpec:
    kind: str  # "UPDATE" | "DELETE"
    table: str  # unquoted relation name (qualifiers already stripped)
    assignments: list[tuple[str, str]] = field(default_factory=list)
    where: str | None = None
    alias: str | None = None  # `UPDATE t AS x …` — the WHERE may
    # reference x.col, so the rewrites keep the alias in their FROM


_CLAUSE_STOPPERS = {"WHERE", "FROM", "RETURNING", "USING"}


def _render(toks: list[Tok]) -> str:
    return "".join(t.text for t in toks).strip()


def _strip_qualifier(name_toks: list[Tok]) -> str:
    """Normalize the relation-name tokens: drop a leading ``spark.`` /
    ``public.`` qualifier (the catalog fiction's schema names), unquote
    a quoted identifier."""
    code = [t for t in name_toks if _is_code(t)]
    # name [. name]* — keep the last dotted segment when the qualifier
    # is one of ours, reject other qualifiers (no cross-db writes)
    parts: list[str] = []
    expect_name = True
    for t in code:
        if expect_name and t.kind in ("word", "qident"):
            parts.append(t.text)
            expect_name = False
        elif not expect_name and t.text == ".":
            expect_name = True
        else:
            raise UnsupportedDml(
                f"cannot parse relation name {_render(name_toks)!r}"
            )
    if expect_name or not parts:
        raise UnsupportedDml("missing relation name")
    if len(parts) > 2 or (
        len(parts) == 2 and parts[0].strip('"').lower() not in ("spark", "public")
    ):
        raise UnsupportedDml(
            f"cannot modify {'.'.join(parts)}: only unqualified relations "
            "(schema 'spark'/'public') are writable"
        )
    name = parts[-1]
    if name.startswith('"') and name.endswith('"'):
        name = name[1:-1].replace('""', '"')
    return name


def _split_top_level(toks: list[Tok], sep: str = ",") -> list[list[Tok]]:
    out: list[list[Tok]] = [[]]
    depth = 0
    for t in toks:
        if t.text == "(":
            depth += 1
        elif t.text == ")":
            depth -= 1
        if depth == 0 and t.text == sep:
            out.append([])
        else:
            out[-1].append(t)
    return out


def _find_top_level_keyword(
    toks: list[Tok], start: int, words: set[str]
) -> int:
    depth = 0
    i = start
    while i < len(toks):
        t = toks[i]
        if t.text == "(":
            close = _find_matching_paren(toks, i)
            if close == -1:
                raise UnsupportedDml("unbalanced parentheses")
            i = close + 1
            continue
        if depth == 0 and t.kind == "word" and t.text.upper() in words:
            return i
        i += 1
    return -1


def parse_dml(sql: str) -> DmlSpec:
    """Parse a raw UPDATE/DELETE statement into a :class:`DmlSpec`.

    Raises :class:`UnsupportedDml` (→ 0A000 on the wire) for every
    shape outside the emulatable core: multi-relation forms
    (``UPDATE … FROM``, ``DELETE … USING``), ``RETURNING``,
    ``WHERE CURRENT OF``, and sub-SELECT-free oddities the lexer can't
    place."""
    toks = _lex(sql.strip().rstrip(";"))
    code_idx = [i for i, t in enumerate(toks) if _is_code(t)]
    if not code_idx:
        raise UnsupportedDml("empty DML statement")
    head = toks[code_idx[0]].text.upper()

    if head == "UPDATE":
        # UPDATE [ONLY] <rel> [[AS] alias] SET a = e [, …] [WHERE c]
        set_i = _find_top_level_keyword(toks, code_idx[0] + 1, {"SET"})
        if set_i == -1:
            raise UnsupportedDml("UPDATE without SET")
        name_toks = toks[code_idx[0] + 1 : set_i]
        ncode = [t for t in name_toks if _is_code(t)]
        if ncode and ncode[0].kind == "word" and ncode[0].text.upper() == "ONLY":
            ncode = ncode[1:]
        # optional alias: trailing AS word after a complete name
        alias: str | None = None
        if len(ncode) >= 2 and ncode[-2].text.upper() == "AS":
            alias = ncode[-1].text
            ncode = ncode[:-2]
        table = _strip_qualifier(ncode)

        stop_i = _find_top_level_keyword(
            toks, set_i + 1, _CLAUSE_STOPPERS
        )
        assign_toks = toks[set_i + 1 : stop_i if stop_i != -1 else len(toks)]
        where: str | None = None
        if stop_i != -1:
            stopper = toks[stop_i].text.upper()
            if stopper != "WHERE":
                raise UnsupportedDml(
                    f"UPDATE … {stopper} is not supported (single-table "
                    "UPDATE only; Spark-backed storage is immutable — "
                    "emulation covers SET/WHERE)"
                )
            nxt = _find_top_level_keyword(
                toks, stop_i + 1, _CLAUSE_STOPPERS - {"WHERE"}
            )
            if nxt != -1:
                raise UnsupportedDml(
                    f"UPDATE … {toks[nxt].text.upper()} is not supported"
                )
            where = _render(toks[stop_i + 1 :]) or None
            if where and "current of" in where.lower():
                raise UnsupportedDml("WHERE CURRENT OF is not supported")

        assignments: list[tuple[str, str]] = []
        for seg in _split_top_level(assign_toks):
            scode = [t for t in seg if _is_code(t)]
            eq = next(
                (k for k, t in enumerate(scode) if t.text == "="), -1
            )
            if eq < 1:
                raise UnsupportedDml(
                    f"cannot parse SET assignment {_render(seg)!r}"
                )
            col_toks = scode[:eq]
            if len(col_toks) != 1 or col_toks[0].kind not in ("word", "qident"):
                # (a, b) = (1, 2) row-form or qualified column — out of
                # the emulatable core
                raise UnsupportedDml(
                    f"unsupported SET target {_render(col_toks)!r}"
                )
            col = col_toks[0].text
            if col.startswith('"') and col.endswith('"'):
                col = col[1:-1].replace('""', '"')
            # expression = original token stream after the '=' (keep
            # spacing — find the '=' position in the unfiltered seg)
            eq_pos = next(k for k, t in enumerate(seg) if t.text == "=")
            expr = _render(seg[eq_pos + 1 :])
            if not expr or expr.upper() == "DEFAULT":
                raise UnsupportedDml(
                    "SET col = DEFAULT is not supported (no column "
                    "defaults on Spark-backed tables)"
                )
            assignments.append((col, expr))
        if not assignments:
            raise UnsupportedDml("UPDATE with no assignments")
        return DmlSpec("UPDATE", table, assignments, where, alias)

    if head == "DELETE":
        # DELETE FROM [ONLY] <rel> [[AS] alias] [WHERE c]
        if (
            len(code_idx) < 2
            or toks[code_idx[1]].text.upper() != "FROM"
        ):
            raise UnsupportedDml("DELETE without FROM")
        stop_i = _find_top_level_keyword(
            toks, code_idx[1] + 1, _CLAUSE_STOPPERS
        )
        name_toks = toks[code_idx[1] + 1 : stop_i if stop_i != -1 else len(toks)]
        ncode = [t for t in name_toks if _is_code(t)]
        if ncode and ncode[0].kind == "word" and ncode[0].text.upper() == "ONLY":
            ncode = ncode[1:]
        alias = None
        if len(ncode) >= 2 and ncode[-2].text.upper() == "AS":
            alias = ncode[-1].text
            ncode = ncode[:-2]
        table = _strip_qualifier(ncode)
        where = None
        if stop_i != -1:
            stopper = toks[stop_i].text.upper()
            if stopper != "WHERE":
                raise UnsupportedDml(
                    f"DELETE … {stopper} is not supported (single-table "
                    "DELETE only)"
                )
            nxt = _find_top_level_keyword(
                toks, stop_i + 1, _CLAUSE_STOPPERS - {"WHERE"}
            )
            if nxt != -1:
                raise UnsupportedDml(
                    f"DELETE … {toks[nxt].text.upper()} is not supported"
                )
            where = _render(toks[stop_i + 1 :]) or None
            if where and "current of" in where.lower():
                raise UnsupportedDml("WHERE CURRENT OF is not supported")
        return DmlSpec("DELETE", table, [], where, alias)

    raise UnsupportedDml(f"not a DML statement: {head}")


def _bq(name: str) -> str:
    return "`" + name.replace("`", "``") + "`"


def _from_clause(spec: DmlSpec) -> str:
    rel = _bq(spec.table)
    if spec.alias:
        a = spec.alias
        if a.startswith('"') and a.endswith('"'):
            a = a[1:-1].replace('""', '"')
        rel += f" AS {_bq(a)}"
    return rel


def build_count_sql(spec: DmlSpec) -> str:
    """Matched-row count for the command tag (PG reports true counts)."""
    cond = spec.where or "true"
    return (
        f"SELECT count(*) FROM {_from_clause(spec)} "
        f"WHERE coalesce(({cond}), false)"
    )


def build_rewrite_sql(spec: DmlSpec, fields) -> str:
    """The SELECT producing the post-DML contents of the relation.

    ``fields`` is the relation's ``schema.fields``; each assigned
    column CASTs its new value back to the declared type so the
    replacement frame is schema-identical to the original (an UPDATE
    must never silently retype a column)."""
    cond = spec.where or "true"
    if spec.kind == "DELETE":
        return (
            f"SELECT * FROM {_from_clause(spec)} "
            f"WHERE NOT coalesce(({cond}), false)"
        )
    assigned = {}
    for col, expr in spec.assignments:
        key = col.lower()
        if key in assigned:
            raise UnsupportedDml(
                f"column {col!r} assigned twice in UPDATE"
            )
        assigned[key] = expr
    names = {f.name.lower() for f in fields}
    for col in assigned:
        if col not in names:
            # let the analyzer's 42703 happen with PG's spelling
            raise UnsupportedDml(
                f'column "{col}" of relation "{spec.table}" does not exist'
            )
    cols = []
    for f in fields:
        q = _bq(f.name)
        expr = assigned.get(f.name.lower())
        if expr is None:
            cols.append(q)
        else:
            typ = f.dataType.simpleString()
            cols.append(
                f"CASE WHEN coalesce(({cond}), false) "
                f"THEN CAST(({expr}) AS {typ}) ELSE {q} END AS {q}"
            )
    return f"SELECT {', '.join(cols)} FROM {_from_clause(spec)}"
