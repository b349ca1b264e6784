#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already ran.
Compares each <outDir>/<name> parquet against the oracle SQL in
<outDir>/oracle_sql.json executed by DuckDB over <sfDir>'s tables.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes a bit: floats rounded for display compare only
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output");  n_fail += 1; continue
        try:
            import pyarrow.parquet as pq
            got = norm(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
            # typed-kind info comes from the ARROW schemas (null-proof:
            # pandas floats nullable ints, which would mask an int-vs-float
            # split exactly where the driver's typed hash rejects it)
            got_types = {f.name: f.type
                         for p in sorted(files) for f in pq.read_schema(p)}
            exp_arrow = con.execute(sql).arrow()
            exp = norm(exp_arrow.to_pandas())
            exp_types = {f.name: f.type for f in exp_arrow.schema}
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: cols got={list(got.columns)} exp={list(exp.columns)}")
            n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows got={len(got)} exp={len(exp)}")
            n_fail += 1; continue
        # value compare, column by column (tolerant float compare)
        bad = None
        for c in got.columns:
            g, e = got[c], exp[c]
            # The driver hashes EXACT typed values: an int64 Spark column
            # vs a HUGEINT/float oracle column fails its hash even when
            # the values are identical. Mirror that strictness here —
            # never let allclose() coerce across an int/float kind split.
            import pyarrow as pa
            def akind(t):
                if t is None: return '?'
                if pa.types.is_integer(t): return 'i'
                if pa.types.is_floating(t): return 'f'
                if pa.types.is_decimal(t): return 'd'
                return 'o'
            gk, ek = akind(got_types.get(c)), akind(exp_types.get(c))
            if 'i' in (gk, ek) and {gk, ek} & {'f', 'd', 'o'}:
                bad = (f"{c}: type kind mismatch got={got_types.get(c)} "
                       f"exp={exp_types.get(c)} (driver's exact hash would"
                       " reject; CAST the oracle side, e.g."
                       " CAST(sum(x) AS BIGINT))")
                break
            try:
                if g.dtype.kind == 'f' or e.dtype.kind == 'f':
                    import numpy as np
                    if not np.allclose(g.astype(float), e.astype(float),
                                       rtol=1e-12, atol=1e-9, equal_nan=True):
                        bad = c; break
                else:
                    if not (g.astype(str).values == e.astype(str).values).all():
                        bad = c; break
            except Exception as ex:
                bad = f"{c} ({ex})"; break
        if bad:
            print(f"FAIL {name}: column {bad} differs")
            m = (got[bad].astype(str).values != exp[bad].astype(str).values) \
                if not str(bad).endswith(')') else None
            if m is not None and m.any():
                i = m.argmax()
                print(f"  first diff row {i}: got={got[bad].iloc[i]!r} exp={exp[bad].iloc[i]!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
