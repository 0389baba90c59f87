import duckdb, json, sys, glob
sfdir = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.001'
outdir = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_out'
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.execute(f"create view {t} as select * from '{sfdir}/{t}.parquet'")
oracle = json.load(open(f'{outdir}/oracle_sql.json'))
fails = []
for name, sql in sorted(oracle.items()):
    try:
        exp = con.execute(sql).df()
    except Exception as e:
        fails.append((name, f'duckdb error: {e}')); continue
    try:
        got = duckdb.connect().execute(f"select * from '{outdir}/{name}/*.parquet'").df()
    except Exception as e:
        fails.append((name, f'spark output missing: {e}')); continue
    # normalize: sort columns by name, sort rows by all values
    exp = exp.reindex(sorted(exp.columns), axis=1)
    got = got.reindex(sorted(got.columns), axis=1)
    if list(exp.columns) != list(got.columns):
        fails.append((name, f'schema: exp {list(exp.columns)} got {list(got.columns)}')); continue
    if len(exp) != len(got):
        fails.append((name, f'rows: exp {len(exp)} got {len(got)}')); continue
    exp = exp.sort_values(by=list(exp.columns), ignore_index=True)
    got = got.sort_values(by=list(got.columns), ignore_index=True)
    # the driver's hash is TYPE-sensitive: a DuckDB HUGEINT (sum over
    # ints -> arrow decimal128) vs a Spark BIGINT hash-mismatches even
    # when every value is identical. Treat dtype divergence beyond the
    # benign int32/int64 widening as a failure here too, so it never
    # survives to the driver gate (this is what made x_bom_validation
    # red in round 2 while values matched).
    def norm_kind(dt):
        k = getattr(dt, 'kind', 'O')
        return {'i': 'int', 'u': 'int', 'f': 'float', 'b': 'bool',
                'M': 'ts', 'O': 'obj'}.get(k, k)
    dtype_bad = [c for c in exp.columns
                 if norm_kind(exp[c].dtype) != norm_kind(got[c].dtype)]
    if dtype_bad:
        fails.append((name, 'dtype: ' + ', '.join(
            f'{c} exp={exp[c].dtype} got={got[c].dtype}' for c in dtype_bad)))
        continue
    import pandas as pd
    try:
        pd.testing.assert_frame_equal(exp, got, check_dtype=False, check_exact=True)
        print(f'OK    {name} ({len(got)} rows)')
    except AssertionError as e:
        fails.append((name, str(e).split(chr(10))[0:6]))
for name, why in fails:
    print(f'FAIL  {name}: {why}')
print(f'\n{len(oracle)-len(fails)}/{len(oracle)} matched')
