#!/usr/bin/env python3
"""Local pre-validation of SparkEntry oracles: run each oracle_sql.json query
in DuckDB over the sf tables and compare with the Verify parquet output,
mimicking the driver's compare (sort columns by name, sort rows, hash values).
Usage: check_oracle.py <sfdir> <verify_outdir>
"""
import sys, json, glob, os
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    # ScaleProbe-replicated tables are Spark-written DIRECTORIES of parts
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{src}'")

oracles = json.load(open(f"{outdir}/oracle_sql.json"))
fail = 0
for name in sorted(os.listdir(outdir)):
    d = os.path.join(outdir, name)
    if not os.path.isdir(d):
        continue
    got = con.execute(f"SELECT * FROM '{d}/*.parquet'").fetchdf()
    if name not in oracles:
        print(f"[rows-only] {name}: {len(got)} rows")
        continue
    try:
        exp = con.execute(oracles[name]).fetchdf()
    except Exception as e:
        if "Out of Memory" in str(e):
            # long-lived connections accumulate allocator state over a
            # 100+-oracle run and spuriously OOM on arbitrary queries —
            # retry once on a FRESH connection before calling it real
            try:
                con2 = duckdb.connect()
                for p in glob.glob(f"{sfdir}/*.parquet"):
                    tname = os.path.basename(p)[:-8]
                    con2.execute(f"CREATE VIEW {tname} AS SELECT * FROM '{p}'")
                exp = con2.execute(oracles[name]).fetchdf()
                got = con2.execute(f"SELECT * FROM '{d}/*.parquet'").fetchdf()
            except Exception as e2:
                print(f"[ORACLE-ERR] {name}: {e2} (after fresh-connection retry)")
                fail += 1
                continue
        else:
            print(f"[ORACLE-ERR] {name}: {e}")
            fail += 1
            continue
    gc, ec = sorted(got.columns), sorted(exp.columns)
    if gc != ec:
        print(f"[SCHEMA] {name}: spark={gc} oracle={ec}")
        fail += 1
        continue
    # dtype-kind comparison (driver may check schema strictly)
    kinds = lambda df: {c: df[c].dtype.kind for c in gc}
    gk, ek = kinds(got), kinds(exp)
    if gk != ek:
        diff = {c: (gk[c], ek[c]) for c in gc if gk[c] != ek[c]}
        print(f"[DTYPE] {name}: {diff}")
    g = got[gc].sort_values(gc).reset_index(drop=True)
    e = exp[gc].sort_values(gc).reset_index(drop=True)
    if len(g) != len(e):
        print(f"[ROWS] {name}: spark={len(g)} oracle={len(e)}")
        fail += 1
        continue
    # value compare: exact on non-floats, exact-repr on floats (driver hashes)
    bad = []
    for c in gc:
        gv, ev = g[c].tolist(), e[c].tolist()
        for i, (a, b) in enumerate(zip(gv, ev)):
            ok = (a == b) or (a != a and b != b) or (a is None and b is None)
            if not ok:
                bad.append((c, i, a, b))
                if len(bad) > 3:
                    break
        if len(bad) > 3:
            break
    if bad:
        print(f"[VALUES] {name}: {bad[:4]}")
        fail += 1
    else:
        print(f"[OK] {name}: {len(g)} rows")
print("FAILURES:", fail)
sys.exit(1 if fail else 0)
