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
    for pdir in sorted(Path(out_dir).iterdir()):
        if pdir.is_dir() and pdir.name not in oracle:
            n = pq.read_table(pdir).num_rows
            print(f"ROWS {pdir.name}: {n} rows")
    for name, msg in failures:
        print(f"FAIL {name}: {msg}")
    print(f"\n{len(oracle) - len(failures)}/{len(oracle)} oracle queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
