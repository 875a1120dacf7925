#!/usr/bin/env python3
"""Head-to-head: time each DuckDB oracle query at a given sf and
compare against the engine's Bench JSON — local evidence for the
"within 2x of single-node throughput" acceptance gate.

Usage: bench_duck.py <sfDir> <verifyOutDir> [benchJsonFile]
"""
import sys, os, json, time
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
bench = None
if len(sys.argv) > 3:
    with open(sys.argv[3]) as f:
        for line in f:
            if '"metric"' in line:
                bench = json.loads(line[line.index('{'):])

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()
con = duckdb.connect()
con.execute(f"SET threads TO {os.cpu_count()}")
for t in TABLES:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
rows = []
total = 0.0
for name in sorted(oracle):
    t0 = time.time()
    try:
        con.execute(oracle[name]).fetchall()
        dt = time.time() - t0
    except Exception as e:
        dt = float("nan")
    total += dt if dt == dt else 0.0
    spark_t = bench["queries"].get(name) if bench else None
    rows.append((name, dt, spark_t))

print(f"{'query':28s} {'duckdb_s':>9s} {'spark_s':>9s} {'ratio':>7s}")
for name, dt, st in rows:
    ratio = f"{st/dt:7.2f}" if st and dt == dt and dt > 0 else "    n/a"
    print(f"{name:28s} {dt:9.3f} {st if st else float('nan'):9.3f} {ratio}")
print(f"{'TOTAL':28s} {total:9.3f} "
      f"{bench['value'] if bench else float('nan'):9.3f}")
