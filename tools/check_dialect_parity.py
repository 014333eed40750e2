#!/usr/bin/env python
"""Result-parity check for the reference E2E suite queries.

Usage: python tools/check_dialect_parity.py DUMP_DIR [REPORT_MD]

DUMP_DIR comes from `Test/runMain graft.dialect.DialectDump DUMP_DIR`:
the synthetic catalog as parquet, each suite query's Spark result as
parquet, and queries.json. This script replays every query in DuckDB over
the same tables and compares results positionally (both engines keep the
SELECT order; auto-generated column NAMES differ by engine, so names are
not compared), with tolerant float equality.

Outcomes per query:
  match          - same shape, same values
  MISMATCH       - both engines ran it, values differ (real semantic gap)
  duckdb-dialect - DuckDB cannot parse/run this SQL (Calcite-ism DuckDB
                   lacks); not a correctness signal for the engine
"""
import json
import math
import sys

import duckdb
import pandas as pd


def load(dump_dir):
    con = duckdb.connect()
    import glob, os
    for d in sorted(glob.glob(f"{dump_dir}/tables/*")):
        t = os.path.basename(d)
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{d}/*.parquet'")
    with open(f"{dump_dir}/queries.json") as f:
        queries = json.load(f)
    return con, queries


def _skip_literal(sql: str, p: int) -> int:
    """Given p at an opening single quote, return the index just past the
    literal's closing quote, treating '' as an escaped quote."""
    q = p + 1
    n = len(sql)
    while q < n:
        if sql[q] == "'":
            if q + 1 < n and sql[q + 1] == "'":
                q += 2
                continue
            break
        q += 1
    return q + 1


def _literal_spans(sql: str):
    """[start, end) spans of single-quoted literals in sql."""
    spans, i, n = [], 0, len(sql)
    while i < n:
        if sql[i] == "'":
            e = _skip_literal(sql, i)
            spans.append((i, e))
            i = e
        else:
            i += 1
    return spans


def _rewrite_calls(sql: str, fname: str, rewrite) -> str:
    """Replace every call of `fname` (case-insensitive, word boundary) with
    rewrite(args) where args are the top-level comma-split argument strings.
    Nested calls are handled by recursing on the argument text first.
    Quote-aware: function-name hits inside string literals are ignored, and
    parens/commas inside literals (regex quantifiers like 'a{1,3}', a
    literal '(' in a pattern, commas in a strptime format) never affect
    depth tracking or argument splitting."""
    out = []
    i = 0
    up = sql.upper()
    f = fname.upper()
    spans = _literal_spans(sql)

    def in_literal(pos):
        return any(s <= pos < e for s, e in spans)

    while True:
        j = up.find(f, i)
        while j >= 0 and ((j > 0 and (sql[j - 1].isalnum() or sql[j - 1] == "_"))
                          or in_literal(j)):
            j = up.find(f, j + 1)
        if j < 0:
            out.append(sql[i:])
            return "".join(out)
        k = j + len(f)
        while k < len(sql) and sql[k].isspace():
            k += 1
        if k >= len(sql) or sql[k] != "(":
            out.append(sql[i:j + len(f)])
            i = j + len(f)
            continue
        out.append(sql[i:j])
        depth, args, start, end = 0, [], k + 1, len(sql) - 1
        p = k
        while p < len(sql):
            c = sql[p]
            if c == "'":
                p = _skip_literal(sql, p)
                continue
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    args.append(sql[start:p])
                    end = p
                    break
            elif c == "," and depth == 1:
                args.append(sql[start:p])
                start = p + 1
            p += 1
        args = [_rewrite_calls(a.strip(), fname, rewrite) for a in args]
        out.append(rewrite(args))
        i = end + 1


_INTERVAL_RE = __import__("re").compile(
    r"INTERVAL\s+'(?P<val>[^']*)'\s+"
    r"(?P<start>YEAR|MONTH|DAY|HOUR|MINUTE|SECOND)"
    r"(?P<prec>\s*\(\d+\))?"
    r"(?:\s+TO\s+(?P<end>YEAR|MONTH|DAY|HOUR|MINUTE|SECOND))?",
    __import__("re").IGNORECASE)


def _interval_to_duckdb(m):
    """Rewrite a Calcite field-qualified interval literal into DuckDB's
    unit-name form. Only fires for the syntax DuckDB cannot parse (a TO
    range or a leading-field precision); plain `INTERVAL '5' DAY` passes
    through untouched, so already-working queries keep their exact SQL."""
    if not m.group("prec") and not m.group("end"):
        return m.group(0)
    val = m.group("val").strip()
    start = m.group("start").upper()
    end = (m.group("end") or start).upper()
    neg = val.startswith("-")
    if neg:
        val = val[1:].strip()
    parts = {}
    try:
        if start == "YEAR" and end == "MONTH":
            y, mo = val.split("-")
            parts = {"years": y, "months": mo}
        elif start == end:
            parts = {start.lower() + "s": val}
        else:
            # SQL-standard packed day-time value: 'D H:M:S' prefixes
            if start == "DAY":
                d, _, rest = val.partition(" ")
                parts["days"] = d
                hms = rest.strip().split(":") if rest.strip() else []
                sub_start = "HOUR"
            else:
                hms = val.split(":")
                sub_start = start
            seq = ["HOUR", "MINUTE", "SECOND"]
            fields = seq[seq.index(sub_start):seq.index(end) + 1]
            if len(fields) != len(hms):
                return m.group(0)
            for f, v in zip(fields, hms):
                parts[f.lower() + "s"] = v
    except ValueError:
        return m.group(0)
    # a malformed packed value with an empty component (e.g. '2 :30') must
    # fall through untouched, like the len-mismatch case above — dropping
    # just the empty field would silently translate half the literal
    if any(v == "" for v in parts.values()):
        return m.group(0)
    sign = "-" if neg else ""
    words = " ".join(f"{sign}{v} {f}" for f, v in parts.items())
    return f"INTERVAL '{words}'"


def translate_for_duckdb(sql: str) -> str:
    """Bridge the Calcite spellings the engine's dialect accepts to DuckDB
    equivalents with the SAME semantics the engine (Spark) implements, so
    the replay compares values instead of skipping:

    - TIMESTAMPADD(unit, n, ts): interval ADDITION is identical in both
      engines -> ts + n * INTERVAL 1 unit.
    - TIMESTAMPDIFF(unit, a, b): Calcite/Spark count COMPLETE units
      (ChronoUnit.between), which is DuckDB's date_sub — NOT date_diff,
      which counts boundary crossings.
    - CHAR_LENGTH -> length (same code-point counting).
    - TO_DATE/TO_TIMESTAMP(s, '%fmt') -> try_strptime: same %-directives,
      and try_ mirrors the engine's null-on-unparsable (non-ANSI) mode.
    - INITCAP: Spark semantics (whitespace-delimited words, rest
      lowercased) spelled as a DuckDB list_transform over split words.
    - COUNT(a, b, ...) [DISTINCT]: Calcite counts rows where ALL args are
      non-null; spelled with a CASE filter (and a ROW value for DISTINCT).
    - ASIN/ACOS outside [-1,1]: Calcite/cudf/Spark yield NaN; DuckDB
      raises — domain-guard with a CASE yielding NAN.
    - REGEXP_REPLACE(s, re, rep): Calcite/Spark replace ALL occurrences;
      DuckDB only the first without the 'g' flag.
    - LN(x <= 0): Spark yields NULL (non-ANSI); DuckDB raises.
    - SUBSTRING(s, 0, n): Calcite/Spark treat start 0 as 1 (n chars);
      DuckDB lets position 0 consume one of the n.
    - Multi-field interval literals (INTERVAL '2 01:03:10' DAY TO
      SECOND, INTERVAL '23:15' HOUR(2) TO MINUTE): DuckDB's parser has
      no field-qualifier syntax; the value means the same duration, so
      spell it as DuckDB's unit-name form ('2 days 1 hours 3 minutes
      10 seconds'). Same for single fields with leading precision.
    - REGEXP_REPLACE(s, re, rep, pos): the position form replaces only
      from pos on, keeping the prefix verbatim (Calcite/cudf and Spark's
      4-arg regexp_replace agree) -> prefix || regexp_replace(substr).
    """
    def ts_add(args):
        unit, n, ts = args[0], args[1], args[2]
        unit = unit.replace("SQL_TSI_", "")
        return f"(CAST({ts} AS TIMESTAMP) + ({n}) * INTERVAL 1 {unit})"

    def ts_diff(args):
        unit, a, b = args[0], args[1], args[2]
        unit = unit.replace("SQL_TSI_", "").lower()
        return f"date_sub('{unit}', CAST({a} AS TIMESTAMP), CAST({b} AS TIMESTAMP))"

    def to_date(args):
        if len(args) == 1:
            return f"CAST({args[0]} AS DATE)"
        return f"CAST(try_strptime({args[0]}, {args[1]}) AS DATE)"

    def to_timestamp(args):
        if len(args) == 1:
            return f"CAST({args[0]} AS TIMESTAMP)"
        return f"try_strptime({args[0]}, {args[1]})"

    def initcap(args):
        x = args[0]
        return ("array_to_string(list_transform(string_split(lower(" + x +
                "), ' '), w -> upper(w[1]) || w[2:]), ' ')")

    def count_multi(args):
        distinct = args and args[0].upper().startswith("DISTINCT ")
        if distinct:
            args = [args[0][len("DISTINCT "):]] + args[1:]
        if len(args) == 1:
            return f"count({'DISTINCT ' if distinct else ''}{args[0]})"
        notnull = " AND ".join(f"({a}) IS NOT NULL" for a in args)
        if distinct:
            row = ", ".join(args)
            return f"count(DISTINCT CASE WHEN {notnull} THEN row({row}) END)"
        return f"count(CASE WHEN {notnull} THEN 1 END)"

    def domain_guard(fn):
        # NULL arm first: NULL BETWEEN -1 AND 1 is NULL, which would fall
        # to the NaN branch, while Calcite/Spark return NULL for fn(NULL)
        def g(args):
            x = args[0]
            return (f"(CASE WHEN ({x}) IS NULL THEN NULL "
                    f"WHEN ({x}) BETWEEN -1 AND 1 THEN {fn}({x}) "
                    f"ELSE CAST('nan' AS DOUBLE) END)")
        return g

    sql = _INTERVAL_RE.sub(_interval_to_duckdb, sql)
    sql = _rewrite_calls(sql, "TIMESTAMPADD", ts_add)
    sql = _rewrite_calls(sql, "TIMESTAMPDIFF", ts_diff)
    sql = _rewrite_calls(sql, "CHAR_LENGTH", lambda a: f"length({a[0]})")
    sql = _rewrite_calls(sql, "TO_DATE", to_date)
    sql = _rewrite_calls(sql, "TO_TIMESTAMP", to_timestamp)
    sql = _rewrite_calls(sql, "INITCAP", initcap)
    sql = _rewrite_calls(sql, "COUNT", count_multi)
    def regexp_replace(args):
        if len(args) == 3:
            return f"regexp_replace({args[0]}, {args[1]}, {args[2]}, 'g')"
        if len(args) == 4 and args[3].strip().isdigit():
            s, re_, rep, pos = args[0], args[1], args[2], int(args[3])
            return (f"(substring({s}, 1, {pos - 1}) || "
                    f"regexp_replace(substring({s}, {pos}), {re_}, {rep}, 'g'))")
        return f"regexp_replace({', '.join(args)})"

    def substring(args):
        if len(args) >= 2 and args[1].strip() == "0":
            args = [args[0], "1"] + args[2:]
        return f"substring({', '.join(args)})"

    sql = _rewrite_calls(sql, "ASIN", domain_guard("asin"))
    sql = _rewrite_calls(sql, "ACOS", domain_guard("acos"))
    sql = _rewrite_calls(sql, "REGEXP_REPLACE", regexp_replace)
    sql = _rewrite_calls(sql, "SUBSTRING", substring)
    sql = _rewrite_calls(
        sql, "LN",
        lambda a: f"(CASE WHEN ({a[0]}) > 0 THEN ln({a[0]}) ELSE NULL END)")
    return sql


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df.columns = [f"c{i}" for i in range(len(df.columns))]
    key = df.astype(str)
    order = key.sort_values(by=list(key.columns), kind="mergesort").index
    return df.loc[order].reset_index(drop=True)


def _is_dateish(v) -> bool:
    import datetime
    return isinstance(v, (datetime.date, datetime.datetime, pd.Timestamp))


def cells_equal(a, b) -> bool:
    try:
        na, nb = pd.isna(a), pd.isna(b)
        if (na is True) and (nb is True):
            return True
    except (TypeError, ValueError):
        pass
    # pandas maps DuckDB DATE to Timestamp but Spark-parquet DATE to
    # datetime.date — same value, different boxing
    if _is_dateish(a) and _is_dateish(b):
        return pd.Timestamp(a) == pd.Timestamp(b)
    # Spark-parquet day-time intervals surface as microsecond ints;
    # DuckDB intervals as Timedelta — same duration, different boxing
    if isinstance(a, pd.Timedelta) or isinstance(b, pd.Timedelta):
        try:
            ta = a if isinstance(a, pd.Timedelta) else pd.Timedelta(microseconds=int(a))
            tb = b if isinstance(b, pd.Timedelta) else pd.Timedelta(microseconds=int(b))
            return ta == tb
        except (TypeError, ValueError):
            return str(a) == str(b)
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-9)
    return str(a) == str(b)


def compare(got: pd.DataFrame, exp: pd.DataFrame):
    if got.shape[1] != exp.shape[1]:
        return f"column count {got.shape[1]} vs {exp.shape[1]}"
    g, x = canon(got), canon(exp)
    if len(g) != len(x):
        return f"row count {len(g)} vs {len(x)}"
    for c in g.columns:
        ga, xa = g[c].tolist(), x[c].tolist()
        for i, (a, b) in enumerate(zip(ga, xa)):
            if not cells_equal(a, b):
                return f"col {c} row {i}: spark={a!r} duckdb={b!r}"
    return None


# Queries where DuckDB's OWN semantics differ from Calcite/cudf (what the
# reference implements and Spark matches), or where the query itself is
# nondeterministic. A value difference here is expected, not an engine bug.
KNOWN_DIVERGENCES = {
    "dayOfWeekSuite": "DuckDB dayofweek() is 0=Sunday; Calcite DAYOFWEEK "
                      "(and Spark) is 1=Sunday — engine matches the reference",
    "castSuite__TEST_10": "CAST(double AS INTEGER): DuckDB rounds half-even; "
                          "Calcite/cudf/Spark truncate toward zero",
    "castSuite__TEST_13": "CAST(double AS INTEGER): DuckDB rounds half-even; "
                          "Calcite/cudf/Spark truncate toward zero",
    "substringSuite__TEST_12": "LEFT/RIGHT with negative length: Calcite/Spark "
                               "return '', DuckDB trims from the other end",
    "windowFunctionSuite__TEST_22": "ORDER BY (l_orderkey, max_keys) LIMIT 50 "
                                    "is not a total order; engines break the "
                                    "boundary tie differently",
}


def known_reason(key):
    for k, reason in KNOWN_DIVERGENCES.items():
        if key == k or key.startswith(k + "__") or key.split("__")[0] == k:
            return reason
    return None


def main(dump_dir, report_md=None):
    con, queries = load(dump_dir)
    matched, mismatched, dialect_skips, known = [], [], [], []
    for key in sorted(queries):
        sql = queries[key]
        try:
            got = pd.read_parquet(f"{dump_dir}/results/{key}")
        except Exception as e:
            mismatched.append((key, f"no spark dump: {e}"))
            continue
        try:
            exp = con.execute(translate_for_duckdb(sql)).df()
        except Exception as e:
            dialect_skips.append((key, str(e).split("\n")[0][:160]))
            continue
        diff = compare(got, exp)
        if diff is None:
            matched.append(key)
        elif known_reason(key):
            known.append((key, known_reason(key)))
        else:
            mismatched.append((key, diff))

    total_run = len(matched) + len(mismatched) + len(known)
    lines = []
    lines.append("# DIALECT_PARITY — suite results vs DuckDB\n")
    lines.append("Produced by graft.dialect.DialectDump + tools/check_dialect_parity.py.")
    lines.append("Every reference E2E suite query both engines can run is compared")
    lines.append("value-for-value (positional columns, sorted rows, 1e-9 float tol).\n")
    lines.append(f"- queries dumped by Spark: **{len(queries)}**")
    lines.append(f"- runnable in DuckDB: **{total_run}** -> "
                 f"**{len(matched)} match / {len(mismatched)} unexplained mismatch"
                 f" / {len(known)} known engine-semantics divergence**")
    lines.append(f"- DuckDB-dialect skips (Calcite SQL DuckDB lacks): {len(dialect_skips)}\n")
    if mismatched:
        lines.append("## Unexplained mismatches\n")
        for k, d in mismatched:
            lines.append(f"- `{k}`: {d}")
        lines.append("")
    if known:
        lines.append("## Known divergences (DuckDB vs Calcite/cudf semantics — the\n"
                     "engine matches the reference side)\n")
        for k, d in known:
            lines.append(f"- `{k}`: {d}")
        lines.append("")
    if dialect_skips:
        lines.append("## DuckDB-dialect skips\n")
        for k, d in dialect_skips:
            lines.append(f"- `{k}`: {d}")
        lines.append("")
    report = "\n".join(lines)
    if report_md:
        with open(report_md, "w") as f:
            f.write(report)
    print(report if not report_md else
          f"match={len(matched)} mismatch={len(mismatched)} known={len(known)} "
          f"duckdb_skip={len(dialect_skips)} -> {report_md}")
    for k, d in mismatched[:15]:
        print(f"MISMATCH {k}: {d}")
    return 1 if mismatched else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else None))
