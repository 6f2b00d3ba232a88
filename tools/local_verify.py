#!/usr/bin/env python3
"""Dev-only harness mimicking the driver's correctness gate.

Usage: python3 tools/local_verify.py <sfDir> <outDir> [query ...]

Reads each <outDir>/<name> parquet (written by graft.Verify), runs the
corresponding oracle SQL from <outDir>/oracle_sql.json in DuckDB against the
raw parquet tables in <sfDir>, normalizes both sides (sort columns by name,
sort rows, stringify) and compares hashes. This script is tooling for local
iteration only — the library itself has no Python dependency.
"""
import sys, os, json, glob, hashlib
import duckdb

def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = repr(v)
            elif isinstance(v, (bytes, bytearray)):
                v = v.hex()
            else:
                v = str(v)
            vals.append(v)
        out.append("\x01".join(vals))
    out.sort()
    return hashlib.sha256("\x02".join(out).encode()).hexdigest(), len(out)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = os.path.join(sf_dir, t + ".parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = n_weak = 0
    # every registered query must have produced a dump dir — a query that
    # threw inside graft.Verify leaves no dir and would otherwise vanish
    # from this report entirely (the round-9 failure mode)
    qpath = os.path.join(out_dir, "queries.json")
    if os.path.exists(qpath):
        registered = set(json.load(open(qpath)))
        if only:
            registered &= only
        dumped = {os.path.basename(d) for d in glob.glob(os.path.join(out_dir, "*"))
                  if os.path.isdir(d)}
        for name in sorted(registered - dumped):
            print(f"[FAIL] {name}: no dump dir (query threw in graft.Verify?)")
            n_fail += 1
    for d in sorted(glob.glob(os.path.join(out_dir, "*"))):
        if not os.path.isdir(d):
            continue
        name = os.path.basename(d)
        if only and name not in only:
            continue
        files = glob.glob(os.path.join(d, "*.parquet"))
        if not files:
            print(f"[FAIL] {name}: no spark output");  n_fail += 1; continue
        sq = con.execute(f"SELECT * FROM read_parquet({files!r})")
        s_cols = [c[0] for c in sq.description]; s_rows = sq.fetchall()
        if name not in oracles:
            ok = len(s_rows) > 0
            print(f"[{'weak' if ok else 'FAIL'}] {name}: rows-only check, {len(s_rows)} rows")
            n_weak += ok; n_fail += (not ok); continue
        try:
            oq = con.execute(oracles[name])
            o_cols = [c[0] for c in oq.description]; o_rows = oq.fetchall()
        except Exception as e:
            print(f"[FAIL] {name}: oracle error: {e}"); n_fail += 1; continue
        if sorted(s_cols) != sorted(o_cols):
            print(f"[FAIL] {name}: schema mismatch spark={sorted(s_cols)} oracle={sorted(o_cols)}")
            n_fail += 1; continue
        sh, sn = norm(s_rows, s_cols); oh, on = norm(o_rows, o_cols)
        if sn != on:
            print(f"[FAIL] {name}: row count spark={sn} oracle={on}"); n_fail += 1
        elif sh != oh:
            print(f"[FAIL] {name}: hash mismatch ({sn} rows)"); n_fail += 1
        else:
            print(f"[pass] {name}: {sn} rows"); n_pass += 1
    print(f"== {n_pass} pass, {n_weak} weak, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
