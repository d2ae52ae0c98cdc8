#!/usr/bin/env python3
"""Stricter local mirror of the driver's correctness gate than
verify_local.py: in addition to the canonicalized value compare, any
arrow-level TYPE difference between the Spark parquet dump and DuckDB's
arrow result is a FAILURE, and values are rendered with plain str()
(no float-repr tolerance). Rationale: the round-1 driver hash diverged
on 5 queries whose values were exact — the only remaining degree of
freedom is the arrow type (Decimal vs float, tz-aware vs naive
timestamp), which changes any str/repr-based hash. If arrow types are
identical AND str-values are identical, every reasonable hash agrees.
Usage: verify_strict.py <sfDir> <outDir>."""
import sys, os, json, glob
import duckdb
import pyarrow.parquet as pq

sf_dir, out_dir = sys.argv[1], sys.argv[2]
oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split():
    p = os.path.join(sf_dir, f"{t}.parquet")
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    cols = [cols[i] for i in order]
    rows = sorted(tuple(str(r[i]) for i in order) for r in rows)
    return cols, rows

fail = 0
# Walk the manifest of attempted queries when present (see verify_local):
# an errored query leaves no dump dir and must fail, not be skipped.
manifest_path = os.path.join(out_dir, "_queries.json")
if os.path.exists(manifest_path):
    names = json.load(open(manifest_path))
    for name in names:
        if not os.path.isdir(os.path.join(out_dir, name)):
            print(f"[FAIL] {name}: no dump directory (query errored in Verify)")
            fail += 1
else:
    names = sorted(os.listdir(out_dir))
for name in names:
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d):
        continue
    files = glob.glob(os.path.join(d, "*.parquet"))
    if not files:
        print(f"[FAIL] {name}: no parquet output"); fail += 1; continue
    tbl = pq.read_table(files[0])
    s_cols = list(tbl.column_names)
    s_rows = [tuple(row[c] for c in s_cols) for row in tbl.to_pylist()]
    if name not in oracle:
        print(f"[rows-only] {name}: {len(s_rows)} rows "
              f"({'OK' if len(s_rows) > 0 else 'EMPTY!'})")
        continue
    try:
        o_tbl = con.execute(oracle[name]).arrow()
        o_cols = list(o_tbl.column_names)
        o_rows = [tuple(row[c] for c in o_cols) for row in o_tbl.to_pylist()]
    except Exception as e:
        print(f"[FAIL] {name}: oracle error: {e}"); fail += 1; continue
    sp = pq.read_schema(files[0])
    sp_map = {c: str(t) for c, t in zip(sp.names, sp.types)}
    # Boundary lint (mirrors Verify.scala): decimal output on an oracled
    # query is an automatic FAIL — the r8 driver hash diverged on exactly
    # the decimal-emitting ops even when values and arrow types matched.
    dec_cols = [c for c, t in sp_map.items() if t.startswith("decimal")]
    if dec_cols:
        print(f"[FAIL] {name}: DecimalType at oracle boundary {dec_cols} "
              "(driver hash canonicalizes decimal differently; cast to DOUBLE)")
        fail += 1
        continue
    ar_map = {c: str(t) for c, t in zip(o_tbl.schema.names, o_tbl.schema.types)}
    tdiff = [(c, sp_map.get(c), ar_map.get(c))
             for c in sorted(set(sp_map) | set(ar_map))
             if sp_map.get(c) != ar_map.get(c)]
    if tdiff:
        print(f"[FAIL] {name}: arrow type diff {tdiff}")
        fail += 1
        continue
    sc, sr = canon(s_cols, s_rows)
    oc, orows = canon(o_cols, o_rows)
    if sc != oc:
        print(f"[FAIL] {name}: columns differ spark={sc} oracle={oc}")
        fail += 1
    elif sr != orows:
        print(f"[FAIL] {name}: {len(sr)} vs {len(orows)} rows; first diff:")
        for a, b in zip(sr, orows):
            if a != b:
                print(f"   spark : {a}\n   oracle: {b}"); break
        else:
            n = min(len(sr), len(orows))
            print(f"   extra rows beyond {n}: spark={sr[n:n+2]} oracle={orows[n:n+2]}")
        fail += 1
    else:
        print(f"[ OK ] {name}: {len(sr)} rows, {len(sc)} cols")
print("ALL OK" if fail == 0 else f"{fail} FAILURES")
sys.exit(1 if fail else 0)
