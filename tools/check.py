#!/usr/bin/env python3
"""Local stand-in for the driver's t2 gate: run graft.Verify at a given SF,
then execute each oracle SQL in DuckDB over the same parquet tables and
compare (schema by sorted column names, rows as sorted multisets).

Usage: python3 tools/check.py [sfdir] [outdir] [--skip-verify]
"""
import sys, json, glob, subprocess
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

if "--skip-verify" not in sys.argv:
    # No shell pipe: `os.system('sbt ... | tail')` returned tail's status, so
    # a failed Verify run silently compared stale parquet from a prior run.
    proc = subprocess.run(
        ["sbt", "-batch", f"runMain graft.Verify {sfdir} {outdir}"],
        cwd="/root/repo", stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    print("\n".join(proc.stdout.splitlines()[-3:]))
    if proc.returncode != 0:
        sys.exit("verify run failed")

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails, passes = [], []
for name in sorted(oracle):
    spark_dir = f"{outdir}/{name}"
    if not glob.glob(f"{spark_dir}/*.parquet"):
        fails.append((name, "no spark output")); continue
    try:
        odf = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        fails.append((name, f"oracle error: {e}")); continue
    sdf = con.execute(f"SELECT * FROM '{spark_dir}/*.parquet'").fetchdf()
    scols, ocols = sorted(sdf.columns), sorted(odf.columns)
    if scols != ocols:
        fails.append((name, f"schema: spark={scols} oracle={ocols}")); continue
    s = sdf[scols].sort_values(scols).reset_index(drop=True)
    o = odf[ocols].sort_values(ocols).reset_index(drop=True)
    if len(s) != len(o):
        fails.append((name, f"rowcount: spark={len(s)} oracle={len(o)}")); continue
    # value compare: exact on strings/ints, exact on floats too (both engines
    # must produce bit-identical doubles by construction). Dtype KIND mismatch
    # is a FAILURE, not a cast: the driver's hash gate canonicalizes integer
    # widths (int32 Spark vs int64 DuckDB queries are green at the driver) but
    # an int column vs a float64 oracle column (DuckDB sum(BIGINT) -> HUGEINT
    # -> float64, the q130/q174 class) can never hash-match even when the
    # values agree — so width differences compare as int64, kind differences
    # fail here just as they do at the driver.
    mismatch = None
    for c in scols:
        sk, ok = s[c].dtype.kind, o[c].dtype.kind
        if sk != ok and not ({sk, ok} <= {"i", "u"}):
            mismatch = f"col {c} dtype: spark={s[c].dtype} oracle={o[c].dtype}"
            break
        if s[c].dtype != o[c].dtype:  # integer width only: widen both
            sv, ov = s[c].astype("int64"), o[c].astype("int64")
        else:
            sv, ov = s[c], o[c]
        neq = ~((sv == ov) | (sv.isna() & ov.isna()))
        if neq.any():
            i = neq.idxmax()
            mismatch = f"col {c} row {i}: spark={sv[i]!r} oracle={ov[i]!r} ({int(neq.sum())} diffs)"
            break
    if mismatch: fails.append((name, mismatch))
    else: passes.append((name, len(s)))

for n, r in passes: print(f"PASS {n} ({r} rows)")
for n, m in fails: print(f"FAIL {n}: {m}")
print(f"\n{len(passes)} passed, {len(fails)} failed")
sys.exit(1 if fails else 0)
