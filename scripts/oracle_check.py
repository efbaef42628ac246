import duckdb, json, sys, glob, hashlib
import pandas as pd

sfdir = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
outdir = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_r2'
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
oracle = json.load(open(f'{outdir}/oracle_sql.json'))

def canon(df):
    df = df[sorted(df.columns)]
    return df

for name, sql in sorted(oracle.items()):
    try:
        odf = con.sql(sql).df()
    except Exception as e:
        print(f"{name}: ORACLE ERROR {e}"); continue
    files = glob.glob(f'{outdir}/{name}/*.parquet')
    if not files:
        print(f"{name}: NO SPARK OUTPUT"); continue
    sdf = pd.concat([pd.read_parquet(f) for f in files])
    odf, sdf = canon(odf), canon(sdf)
    if list(odf.columns) != list(sdf.columns):
        print(f"{name}: SCHEMA MISMATCH oracle={list(odf.columns)} spark={list(sdf.columns)}"); continue
    if len(odf) != len(sdf):
        print(f"{name}: ROWCOUNT {len(odf)} vs {len(sdf)}"); continue
    # sort rows for comparison, hash values as strings
    so = odf.astype(str).sort_values(by=list(odf.columns)).reset_index(drop=True)
    ss = sdf.astype(str).sort_values(by=list(sdf.columns)).reset_index(drop=True)
    ho = hashlib.md5(so.to_csv(index=False).encode()).hexdigest()
    hs = hashlib.md5(ss.to_csv(index=False).encode()).hexdigest()
    # also check dtypes roughly
    dt_o = [str(t) for t in odf.dtypes]; dt_s = [str(t) for t in sdf.dtypes]
    tm = "types_ok" if dt_o == dt_s else f"TYPES {dt_o} vs {dt_s}"
    if ho == hs:
        print(f"{name}: MATCH rows={len(odf)} {tm}")
    else:
        print(f"{name}: HASH MISMATCH rows={len(odf)} {tm}")
        diff = (so != ss).any(axis=1)
        print(so[diff].head(3)); print(ss[diff].head(3))
