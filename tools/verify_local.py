#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: read Verify.scala's
parquet dumps, run each oracle_sql.json query in DuckDB over the same
fixture parquet tables, canonicalize (sort columns by name, sort rows),
and compare values exactly. Usage: verify_local.py <sfDir> <outDir>."""
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
    def norm(v):
        if isinstance(v, float):
            return repr(v)
        return str(v)
    rows = sorted(tuple(norm(r[i]) for i in order) for r in rows)
    return cols, rows

fail = 0
# A query that errors in Verify leaves NO dump dir — walk the manifest of
# attempted queries (when present), not the surviving directories, so a
# missing dump is a loud failure instead of a silent skip.
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
        o_tbl = con.execute(oracle[name]).arrow()  # one execution serves both checks
        o_cols = list(o_tbl.column_names)
        o_rows = [tuple(row[c] for c in o_cols) for row in o_tbl.to_pylist()]
    except Exception as e:
        print(f"[FAIL] {name}: oracle error: {e}"); fail += 1; continue
    # arrow-schema audit: the driver's hash is type-width-sensitive
    # (r7: events_rfm printed [TYPE] here and said OK while the driver
    # failed on decimal(28,2) vs decimal(38,2)) — so ANY arrow-type
    # mismatch is a FAIL, not informational. The local gate must
    # predict the driver.
    type_fail = False
    try:
        ar = o_tbl.schema
        sp = pq.read_schema(files[0])
        sp_map = {c: str(t) for c, t in zip(sp.names, sp.types)}
        # Boundary lint (mirrors Verify.scala / verify_strict.py):
        # decimal output on an oracled query is a FAIL even when types
        # match — r8's two driver hash failures were exactly the two
        # decimal-emitting oracled ops, bit-identical locally.
        dec_cols = [c for c, t in sp_map.items() if t.startswith("decimal")]
        if dec_cols:
            print(f"[FAIL] {name}: DecimalType at oracle boundary "
                  f"{dec_cols} (cast to DOUBLE on both engines)")
            fail += 1
            type_fail = True
        ar_map = {c: str(t) for c, t in zip(ar.names, ar.types)}
        tdiff = [(c, sp_map[c], ar_map[c]) for c in sp_map
                 if c in ar_map and sp_map[c] != ar_map[c]]
        if tdiff:
            print(f"[FAIL] {name}: arrow type mismatch {tdiff}")
            fail += 1
            type_fail = True
    except Exception:
        pass
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
    elif not type_fail:
        print(f"[ OK ] {name}: {len(sr)} rows, {len(sc)} cols")
print("ALL OK" if fail == 0 else f"{fail} FAILURES")
sys.exit(1 if fail else 0)
