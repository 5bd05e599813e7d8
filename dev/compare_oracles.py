import duckdb, json, glob, os, sys
import pandas as pd

outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_s5"
sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

sqls = json.load(open(os.path.join(outdir, "oracle_sql.json")))
con = duckdb.connect()
for t in ['lineitem','orders','customer','nation','region','part','supplier','events','documents','embeddings']:
    p = f"{sf}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

def canon(df):
    # STRICT on integer widths: the driver hasher distinguishes DuckDB
    # HUGEINT/INT32 from Spark BIGINT, so we must NOT coerce here (the old
    # int64-normalizing version called q_tm_sessions green while the driver
    # hashed it red). We keep only float rounding (tolerance the driver also
    # applies) and datetime unit alignment (storage detail, not a SQL type).
    df = df[sorted(df.columns)]
    for c in df.columns:
        if str(df[c].dtype).startswith('float'):
            df[c] = df[c].round(9)
        if str(df[c].dtype).startswith('datetime64'):
            df[c] = df[c].astype('datetime64[us]')
    return df.sort_values(by=list(df.columns), key=lambda s: s.astype(str) if s.dtype == object else s).reset_index(drop=True)

def dtypes_of(df):
    return {c: str(df[c].dtype) for c in sorted(df.columns)}

fails, okc = [], 0
for name, sql in sorted(sqls.items()):
    spark_dir = os.path.join(outdir, name)
    if not os.path.isdir(spark_dir):
        fails.append((name, "missing spark output")); continue
    try:
        o = con.execute(sql).fetchdf()
        s = duckdb.connect().execute(
            f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").fetchdf()
        co, cs = canon(o), canon(s)
        if list(co.columns) != list(cs.columns):
            fails.append((name, f"cols oracle={list(co.columns)} spark={list(cs.columns)}")); continue
        if dtypes_of(co) != dtypes_of(cs):
            diff = {c: (dtypes_of(co)[c], dtypes_of(cs)[c])
                    for c in co.columns if str(co[c].dtype) != str(cs[c].dtype)}
            fails.append((name, f"DTYPE oracle-vs-spark {diff}")); continue
        if len(co) != len(cs):
            fails.append((name, f"rows oracle={len(co)} spark={len(cs)}")); continue
        try:
            pd.testing.assert_frame_equal(co, cs, check_dtype=False, check_exact=False, rtol=1e-9, atol=1e-9)
            okc += 1
        except AssertionError as e:
            fails.append((name, str(e).split('\n')[0] + " | " + str(e).split('\n')[-1]))
    except Exception as e:
        fails.append((name, f"ERR {type(e).__name__}: {str(e)[:200]}"))

print(f"OK {okc}/{len(sqls)}")
for n, m in fails:
    print("FAIL", n, m[:300])
