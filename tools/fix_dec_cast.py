#!/usr/bin/env python3
"""One-shot rewrite of OracleSql.scala: route every DuckDB
DECIMAL->DOUBLE cast through VARCHAR.

Why: DuckDB's direct DECIMAL->DOUBLE cast is not correctly rounded
(observed: DECIMAL(28,6) '56586554400.730012' -> 56586554400.73002,
1 ulp high), while VARCHAR->DOUBLE uses strtod (correctly rounded) and
Spark's Decimal.toDouble (java BigDecimal.doubleValue) is correctly
rounded. Any dsum() whose exact decimal needs >=17 significant digits
can therefore hash-diverge at scale (the round-6 sf1 q_agg_groupby
sum_charge ulp). Wrapping the inner expression in CAST(... AS VARCHAR)
makes DuckDB correctly rounded too; for already-DOUBLE expressions the
varchar round-trip is the identity (shortest-roundtrip printing).

Rewrites CAST(<expr> AS DOUBLE) -> CAST(CAST(<expr> AS VARCHAR) AS
DOUBLE) wherever <expr> textually contains DECIMAL( — i.e. only casts
that can see a decimal-typed input.
"""
import re, sys

path = 'src/main/scala/graft/oracle/OracleSql.scala'
src = open(path).read()

out = []
i = 0
n_rewritten = 0
while True:
    j = src.find('CAST(', i)
    if j < 0:
        out.append(src[i:])
        break
    # find balanced close of this CAST(
    depth = 0
    k = j + 4  # position of '('
    end = None
    while k < len(src):
        c = src[k]
        if c == '(':
            depth += 1
        elif c == ')':
            depth -= 1
            if depth == 0:
                end = k
                break
        k += 1
    if end is None:
        out.append(src[i:])
        break
    inner = src[j + 5:end]
    m = re.search(r'\s+AS\s+DOUBLE\s*$', inner)
    if m and 'DECIMAL(' in inner[:m.start()] \
         and not re.search(r'\s+AS\s+VARCHAR\s*$', inner[:m.start()].rstrip()):
        expr = inner[:m.start()]
        out.append(src[i:j])
        out.append('CAST(CAST(' + expr + ' AS VARCHAR) AS DOUBLE)')
        n_rewritten += 1
        i = end + 1
    else:
        # leave untouched, but continue scanning INSIDE it (nested casts)
        out.append(src[i:j + 5])
        i = j + 5

res = ''.join(out)
open(path, 'w').write(res)
print(f'rewrote {n_rewritten} CAST(..decimal.. AS DOUBLE) sites')
