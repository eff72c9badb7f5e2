#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Reads each SparkEntry query's parquet dump (written by graft.Verify) and
compares it cell-by-cell, in row order, with DuckDB running the authored
oracle SQL on the same fixture tables. Columns are sorted by name first
(mirrors the driver's hash protocol). Strict: type-class differences are
reported too.
"""
import duckdb, json, sys, math, os
from decimal import Decimal

TABLES = ['region','nation','customer','supplier','part','orders','lineitem',
          'events','documents','embeddings']

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
    out = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_out'
    only = set(sys.argv[3].split(',')) if len(sys.argv) > 3 else None
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f'{out}/oracle_sql.json'))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        d = f'{out}/{name}'
        if not os.path.isdir(d):
            print(f'FAIL {name}: spark output missing (query errored?)')
            n_fail += 1
            continue
        try:
            res = con.execute(sql)
            ocols = [c[0] for c in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f'FAIL {name}: oracle error: {e}')
            n_fail += 1
            continue
        try:
            sres = con.execute(f"SELECT * FROM '{d}/*.parquet'")
            scols = [c[0] for c in sres.description]
            srows = sres.fetchall()
        except Exception as e:
            print(f'FAIL {name}: cannot read spark output: {e}')
            n_fail += 1
            continue
        if sorted(ocols) != sorted(scols):
            print(f'FAIL {name}: columns differ\n  spark : {sorted(scols)}\n  oracle: {sorted(ocols)}')
            n_fail += 1
            continue
        if len(orows) != len(srows):
            print(f'FAIL {name}: row counts differ spark={len(srows)} oracle={len(orows)}')
            n_fail += 1
            continue
        sperm = sorted(range(len(scols)), key=lambda i: scols[i])
        operm = sorted(range(len(ocols)), key=lambda i: ocols[i])
        cols = sorted(scols)
        bad = []
        typewarn = set()
        for r, (sr, orow) in enumerate(zip(srows, orows)):
            for ci, (si, oi) in enumerate(zip(sperm, operm)):
                a, b = sr[si], orow[oi]
                if a is None and b is None:
                    continue
                if type(a) is not type(b):
                    typewarn.add(f'{cols[ci]}: {type(a).__name__} vs {type(b).__name__}')
                eq = a == b
                if not eq and isinstance(a, float) and isinstance(b, float):
                    eq = math.isnan(a) and math.isnan(b)
                if not eq and isinstance(a, (int, float, Decimal)) and isinstance(b, (int, float, Decimal)):
                    try:
                        eq = Decimal(str(a)) == Decimal(str(b))
                    except Exception:
                        pass
                if not eq:
                    bad.append((r, cols[ci], a, b))
                    if len(bad) >= 5:
                        break
            if len(bad) >= 5:
                break
        if bad:
            print(f'FAIL {name}: {len(bad)}+ cell mismatches (rows={len(srows)})')
            for r, c, a, b in bad[:5]:
                print(f'  row {r} col {c}: spark={a!r} oracle={b!r}')
            n_fail += 1
        else:
            msg = f'pass {name} ({len(srows)} rows)'
            if typewarn:
                msg += '  [type-mismatch: ' + '; '.join(sorted(typewarn)) + ']'
            print(msg)
            n_pass += 1
    # queries without oracle (a_*) — just confirm output exists
    for d in sorted(os.listdir(out)):
        p = f'{out}/{d}'
        if os.path.isdir(p) and d not in oracle:
            n = con.execute(f"SELECT count(*) FROM '{p}/*.parquet'").fetchone()[0]
            print(f'info {d}: no oracle, {n} rows')
    print(f'== {n_pass} pass / {n_fail} fail ==')
    sys.exit(1 if n_fail else 0)

if __name__ == '__main__':
    main()
