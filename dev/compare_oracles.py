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
    df = df[sorted(df.columns)]
    # normalize ints to int64 where possible (DuckDB HUGEINT etc.)
    for c in df.columns:
        if df[c].dtype == object:
            try:
                df[c] = pd.to_numeric(df[c])
            except Exception:
                pass
        if str(df[c].dtype).startswith('float'):
            df[c] = df[c].round(9)
        if str(df[c].dtype) in ('Int64','int32','uint32','int16'):
            df[c] = df[c].astype('int64')
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

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
