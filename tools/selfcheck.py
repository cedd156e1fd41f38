#!/usr/bin/env python3
"""Replicates the driver's correctness gate locally: reads each
outDir/<name> parquet written by graft.Verify, runs the matching oracle SQL
in DuckDB over the same testdata parquets, and compares values exactly
(columns sorted by name; rows compared as sorted tuples)."""
import json
import math
import sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    return v


def table_rows(names, rows):
    order = sorted(range(len(names)), key=lambda i: names[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    return sorted(names), sorted(out, key=repr)


def lint_portable(name, schema):
    """Gate-output portability lint: the driver hashes Spark parquet output
    against DuckDB's fetch, and wide decimals / nested composites have
    engine-specific canonical forms. Three incidents to date (q_range_join,
    q_embed_quantize, q_join_cardinality) were all DECIMAL(p>18) outputs that
    were value-identical but hash-red. Gates must cast to BIGINT/DOUBLE or
    string-serialize before returning."""
    import pyarrow as pa
    bad = []

    def walk(field, path):
        t = field.type
        if pa.types.is_decimal(t) and t.precision > 18:
            bad.append(f"{path}: DECIMAL({t.precision},{t.scale}) — cast to BIGINT/DOUBLE or string-serialize")
        elif pa.types.is_struct(t):
            bad.append(f"{path}: STRUCT — flatten or JSON-serialize")
        elif pa.types.is_map(t):
            bad.append(f"{path}: MAP — flatten or JSON-serialize")
        elif pa.types.is_list(t) or pa.types.is_large_list(t):
            inner = t.value_field
            if pa.types.is_struct(inner.type) or pa.types.is_list(inner.type) or pa.types.is_decimal(inner.type):
                bad.append(f"{path}: ARRAY<{inner.type}> — nested composite, JSON-serialize")
    for f in schema:
        walk(f, f.name)
    return bad


def _arrow_family(t):
    """Collapse an arrow type to the fetch-dtype FAMILY the driver's pandas
    compare actually sees. All integer widths are one family (int32 vs int64
    compare equal as Python ints); HUGEINT has no arrow analogue on the
    Spark side so it can never appear here."""
    import pyarrow as pa
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return ("list", _arrow_family(t.value_type))
    return f"other:{t}"


def _duck_family(ts):
    """Collapse a DuckDB DESCRIBE type string to the same family lattice.
    Returns (family, problem_or_None): HUGEINT/UHUGEINT and STRUCT/MAP are
    non-portable regardless of the Spark side — pandas fetches HUGEINT as
    float64/object (the q_embed_audit incident) and composites have
    engine-specific canonical forms."""
    t = ts.strip().upper()
    if t.endswith("[]"):
        fam, prob = _duck_family(t[:-2])
        return ("list", fam), prob
    if t in ("HUGEINT", "UHUGEINT"):
        return "int", f"{ts} — pandas fetches float64/object, not int64; CAST to BIGINT/DOUBLE in the oracle SQL"
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int", None
    if t in ("FLOAT", "REAL", "DOUBLE"):
        return "float", None
    if t.startswith("DECIMAL"):
        return "decimal", None
    if t == "BOOLEAN":
        return "bool", None
    if t in ("VARCHAR", "TEXT", "STRING"):
        return "string", None
    if t in ("BLOB", "BYTEA"):
        return "binary", None
    if t == "DATE":
        return "date", None
    if t.startswith("TIMESTAMP"):
        return "timestamp", None
    if t.startswith("STRUCT") or t.startswith("MAP") or t.startswith("UNION"):
        return f"other:{ts}", f"{ts} — flatten or JSON-serialize in the oracle SQL"
    return f"other:{ts}", None


def lint_oracle(con, spark_schema, sql):
    """ORACLE-side portability lint (the 4th incident of the value-identical/
    hash-red class was on THIS side — q_embed_audit's sum(fx) HUGEINT — which
    the Spark-schema walk above cannot see). DESCRIBEs the oracle SQL and
    checks each output column's DuckDB fetch dtype FAMILY against the Spark
    parquet column of the same name: intrinsically non-portable fetches
    (HUGEINT, STRUCT/MAP) and int-vs-float-style family mismatches are
    exactly what the driver's pandas compare hashes differently."""
    bad = []
    try:
        desc = con.execute("DESCRIBE " + sql).fetchall()
    except Exception:
        return bad  # a broken oracle surfaces as its own failure below
    spark_fams = {f.name: _arrow_family(f.type) for f in spark_schema} if spark_schema is not None else {}
    for row in desc:
        col_name, col_type = row[0], row[1]
        fam, prob = _duck_family(col_type)
        if prob:
            bad.append(f"{col_name}: {prob}")
        elif col_name in spark_fams and fam != spark_fams[col_name]:
            bad.append(
                f"{col_name}: oracle fetches {col_type} ({fam}) but the Spark gate emits "
                f"{spark_fams[col_name]} — align the families (CAST in the oracle or the gate)")
    return bad


def selftest():
    """Seeded regression for the oracle-side lint: a sum(BIGINT) (HUGEINT)
    oracle against an int64 Spark schema MUST be flagged; the cast twin must
    pass clean."""
    import pyarrow as pa
    con = duckdb.connect()
    spark_schema = pa.schema([pa.field("s", pa.int64())])
    hot = lint_oracle(con, spark_schema, "SELECT sum(x) AS s FROM (SELECT CAST(1 AS BIGINT) AS x)")
    assert hot and "HUGEINT" in hot[0], f"HUGEINT case not flagged: {hot}"
    cold = lint_oracle(con, spark_schema, "SELECT CAST(sum(x) AS BIGINT) AS s FROM (SELECT CAST(1 AS BIGINT) AS x)")
    assert not cold, f"cast twin falsely flagged: {cold}"
    mixed = lint_oracle(con, pa.schema([pa.field("v", pa.int64())]), "SELECT 1.5 AS v")
    assert mixed, "int-vs-decimal family mismatch not flagged"
    print("selftest OK: HUGEINT flagged, BIGINT cast clean, family mismatch flagged")
    return 0


def lint_survey(path="SURVEY.md", catalog_gates=()):
    """SURVEY §2 table-parse lint (round-14 judge item #3): the operator
    inventory must stay machine-parseable — every row ONE line of the form
    `| <id> | ... | ... | [x] |` with 4+ cells, no blank line splitting a
    table (the r12 duplicate-id incident started as exactly this hygiene
    debt), ids unique. Returns a list of problems (empty = clean)."""
    import re
    p = Path(path)
    if not p.exists():
        return [f"{path} missing"]
    lines = p.read_text().split("\n")
    try:
        s = next(i for i, l in enumerate(lines) if l.startswith("## §2"))
        e = next(i for i, l in enumerate(lines) if l.startswith("## §3"))
    except StopIteration:
        return ["SURVEY.md §2/§3 headers not found"]
    sec = lines[s:e]
    problems = []
    ids = []
    for i, l in enumerate(sec):
        if l.strip() == "":
            prev = next((x for x in reversed(sec[:i]) if x.strip() != ""), "")
            nxt = next((x for x in sec[i + 1:] if x.strip() != ""), "")
            if prev.startswith("|") and nxt.startswith("|"):
                problems.append(f"§2 line {s + i + 1}: blank line splits a table")
        elif l.startswith("|"):
            if re.match(r"^\| (#|---)", l) or l.startswith("|---"):
                continue
            m = re.match(r"^\| (\d+[a-z]?) \|", l)
            if not m:
                problems.append(f"§2 line {s + i + 1}: table row without an id "
                                f"(wrapped cell?): {l[:60]}")
                continue
            if l.count("|") < 5:
                problems.append(f"§2 line {s + i + 1}: row {m.group(1)} has "
                                f"fewer than 4 cells (wrapped?)")
            ids.append(m.group(1))
    dupes = sorted({x for x in ids if ids.count(x) > 1})
    if dupes:
        problems.append(f"§2 duplicate ids: {dupes}")
    # catalog → §2 direction (round-14 judge item: q_valid_format was a
    # green catalog gate uncited by any inventory row): every gate the
    # current Verify run produced must be named somewhere in §2.
    if catalog_gates:
        sec_text = "\n".join(sec)
        uncited = sorted(g for g in catalog_gates
                         if not re.search(rf"\b{re.escape(g)}\b", sec_text))
        if uncited:
            problems.append(f"§2 does not cite catalog gate(s): {uncited}")
    if not problems:
        print(f"SURVEY §2 lint: {len(ids)} rows parse clean, ids unique"
              + (f"; all {len(catalog_gates)} catalog gates cited"
                 if catalog_gates else ""))
    return problems


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    failures = []
    for name in sorted(oracle):
        sql = oracle[name]
        pdir = Path(out_dir) / name
        if not pdir.exists():
            failures.append((name, "spark output missing"))
            continue
        tbl = pq.read_table(pdir)
        for msg in lint_portable(name, tbl.schema):
            failures.append((name, f"LINT non-portable gate output type — {msg}"))
        for msg in lint_oracle(con, tbl.schema, sql):
            failures.append((name, f"LINT non-portable ORACLE fetch dtype — {msg}"))
        s_names, s_rows = table_rows(tbl.column_names, list(zip(*[c.to_pylist() for c in tbl.columns])) if tbl.num_columns else [])
        try:
            cur = con.execute(sql)
            d_rows = cur.fetchall()
            d_names = [d[0] for d in cur.description]
        except Exception as e:
            failures.append((name, f"oracle error: {e}"))
            continue
        d_names_s, d_rows_s = table_rows(d_names, d_rows)
        if s_names != d_names_s:
            failures.append((name, f"columns differ: spark={s_names} duckdb={d_names_s}"))
            continue
        if len(s_rows) != len(d_rows_s):
            failures.append((name, f"row count differs: spark={len(s_rows)} duckdb={len(d_rows_s)}"))
            continue
        bad = [(a, b) for a, b in zip(s_rows, d_rows_s) if a != b]
        if bad:
            failures.append((name, f"{len(bad)} mismatched rows; first: spark={bad[0][0]} duckdb={bad[0][1]}"))
        else:
            print(f"OK   {name}: {len(s_rows)} rows")
    # rows-only queries
    gates = set(oracle)
    for pdir in sorted(Path(out_dir).iterdir()):
        if pdir.is_dir() and pdir.name not in oracle:
            n = pq.read_table(pdir).num_rows
            print(f"ROWS {pdir.name}: {n} rows")
            gates.add(pdir.name)
    for msg in lint_survey(Path(__file__).resolve().parent.parent / "SURVEY.md",
                           catalog_gates=sorted(gates)):
        failures.append(("SURVEY", f"LINT {msg}"))
    for name, msg in failures:
        print(f"FAIL {name}: {msg}")
    print(f"\n{len(oracle) - len(failures)}/{len(oracle)} oracle queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    if len(sys.argv) == 2 and sys.argv[1] == "--selftest":
        sys.exit(selftest())
    sys.exit(main(sys.argv[1], sys.argv[2]))
