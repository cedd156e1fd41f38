#!/usr/bin/env python3
"""Times every oracle SQL in DuckDB against one SF's parquet tables — the
single-node baseline the Spark bench is compared to (BASELINE.md).
Usage: baseline.py <sf_dir> <oracle_sql.json> [timeout_s]"""
import json
import sys
import threading
import time
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main(sf_dir, oracle_path, timeout_s=180.0):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.loads(Path(oracle_path).read_text())
    results = {}
    for name in sorted(oracle):
        timer = threading.Timer(timeout_s, con.interrupt)
        timer.start()
        t0 = time.monotonic()
        try:
            n = len(con.execute(oracle[name]).fetchall())
            results[name] = {"sec": round(time.monotonic() - t0, 3), "rows": n}
        except Exception as e:
            results[name] = {"sec": round(time.monotonic() - t0, 3),
                             "error": str(e).splitlines()[0][:120]}
        finally:
            timer.cancel()
        r = results[name]
        print(f"{name}: {r['sec']}s " + (f"{r['rows']} rows" if "rows" in r else f"ERR {r['error']}"),
              file=sys.stderr)
    total = sum(r["sec"] for r in results.values() if "rows" in r)
    print(json.dumps({"sf": sf_dir, "total_sec": round(total, 1), "queries": results}))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], float(sys.argv[3]) if len(sys.argv) > 3 else 180.0)
