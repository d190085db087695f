#!/usr/bin/env python3
"""Dev-loop replica of the driver's t2 correctness gate.

Runs AFTER `sbt "runMain graft.Verify <sfDir> <outDir>"`:
replays outDir/oracle_sql.json in DuckDB over the same sfDir parquet
tables, and compares each query's dumped parquet against the oracle
result — columns sorted by name, rows sorted, exact value equality
(floats bit-compared; the engine's determinism conventions are
supposed to make that pass). Reports per-query PASS/FAIL + diffs.

Usage: python3 tools/compare.py <sfDir> <outDir>
"""
import sys, os, json, math
import duckdb
import pyarrow.parquet as pq

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [colnames[i] for i in order], out

def norm(v):
    if isinstance(v, float):
        return v
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v

def eq(a, b):
    if type(a) is float and type(b) is float:
        if math.isnan(a) and math.isnan(b): return True
        return a == b
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(eq(x, y) for x, y in zip(a, b))
    return a == b

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        tbl = pq.read_table(d)
        got_cols = tbl.column_names
        got_rows = [tuple(row[c] for c in got_cols) for row in tbl.to_pylist()]
        if name not in oracles:
            print(f"  ~  {name}: no oracle ({len(got_rows)} rows, rows-only check)")
            continue
        try:
            cur = con.execute(oracles[name])
            exp_cols = [c[0] for c in cur.description]
            exp_rows = cur.fetchall()
        except Exception as e:
            print(f" FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        gc, gr = canon(got_rows, got_cols)
        ec, er = canon(exp_rows, exp_cols)
        if gc != ec:
            print(f" FAIL {name}: columns {gc} vs oracle {ec}")
            n_fail += 1
            continue
        if len(gr) != len(er):
            print(f" FAIL {name}: {len(gr)} rows vs oracle {len(er)}")
            n_fail += 1
            continue
        bad = None
        for i, (a, b) in enumerate(zip(gr, er)):
            if not eq(a, b):
                bad = (i, a, b)
                break
        if bad:
            i, a, b = bad
            print(f" FAIL {name}: row {i} differs")
            for c, x, y in zip(gc, a, b):
                if not eq(x, y):
                    extra = f" (diff={x-y:.3e})" if isinstance(x, float) and isinstance(y, float) else ""
                    print(f"        {c}: spark={x!r} oracle={y!r}{extra}")
            n_fail += 1
        else:
            print(f" PASS {name} ({len(gr)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
