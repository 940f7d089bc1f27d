#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle correctness gate.

Runs graft.Verify via sbt (writes each query result to parquet +
oracle_sql.json), then executes each oracle in DuckDB over the same
testdata parquet and compares: schema (column names), row count, and a
value hash computed over column-name-sorted, row-sorted string-rendered
cells. Mirrors the contract described in the builder prompt.

Usage: python3 tools/check.py [sfdir] [--skip-verify] [only_query ...]
"""
import json, re, subprocess, sys, hashlib, math, os, shutil

# First positional is the SF dir only if it actually is a directory;
# otherwise it's part of the query filter (`check.py q05` must filter).
args = [a for a in sys.argv[1:] if not a.startswith("--")]
if args and os.path.isdir(args[0]):
    SF, only = args[0], set(args[1:])
else:
    SF, only = "/root/testdata/sf0.01", set(args)
OUT = "/tmp/graft_verify"
skip_verify = "--skip-verify" in sys.argv


def selected(name):
    return not only or name in only or name.split("_")[0] in only


verify_failed = set()
if not skip_verify:
    if os.path.isdir(OUT):
        if not only:
            shutil.rmtree(OUT)  # drop stale result dirs from removed queries
        else:
            # drop stale parquet for the SELECTED queries too — a query
            # that crashes in Verify must not green-light last run's dump
            for d in os.listdir(OUT):
                p = os.path.join(OUT, d)
                if os.path.isdir(p) and selected(d):
                    shutil.rmtree(p)
    env = {**os.environ, "SPARK_GRAFT_CPUS": "8"}
    env.pop("SPARK_GRAFT_ONLY", None)  # never inherit a shell-exported filter
    if only:
        env["SPARK_GRAFT_ONLY"] = ",".join(sorted(only))
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {SF} {OUT}'],
        capture_output=True, text=True, cwd="/root/repo", env=env)
    if r.returncode != 0:
        print(r.stdout[-4000:]); print(r.stderr[-4000:]); sys.exit(1)
    for line in (r.stdout + "\n" + r.stderr).splitlines():
        if "[verify]" in line:
            print(line)
            # sbt's forked-run logger prefixes program output ("[info] "
            # on stdout, "[error] " on stderr), so the query name is NOT
            # a fixed token position — anchor on the "[verify]" marker
            # itself (Verify.scala's one failure-message shape:
            # "[verify] <name> failed: <msg>")
            m = re.search(r"\[verify\]\s+(\S+)\s+failed", line)
            if m:
                verify_failed.add(m.group(1))

import duckdb
import pandas as pd

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

oracles = json.load(open(f"{OUT}/oracle_sql.json"))

def render(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)

def dtype_warns(got: pd.DataFrame, exp: pd.DataFrame):
    """Int-vs-float dtype mismatches that render() hides.

    DuckDB types a bare sum(CASE...) as HUGEINT, which pandas renders
    float64 (3750.0) while Spark's parquet reads int64 (3750); render()
    collapses integral floats so the local hash stays green while any
    type-faithful hasher (the driver's) reds. Surface the class as a
    WARN even when the hash matches (r19 verdict item #2). Both sides
    promote nullable ints to float64 identically, so a real NULL-bearing
    int column never trips this.
    """
    num = {"i", "u", "f"}
    out = []
    for c in sorted(set(got.columns) & set(exp.columns)):
        kg, ke = got[c].dtype.kind, exp[c].dtype.kind
        if kg != ke and kg in num and ke in num and "f" in (kg, ke):
            out.append(f"{c}: spark {got[c].dtype} vs oracle {exp[c].dtype}")
    return out


def frame_hash(df: pd.DataFrame):
    df = df[sorted(df.columns)]
    rows = sorted("\x1f".join(render(v) for v in row) for row in df.itertuples(index=False, name=None))
    h = hashlib.sha256()
    for row in rows:
        h.update(row.encode()); h.update(b"\x1e")
    return h.hexdigest()[:16]

fails = 0
warns = 0
for name in sorted(verify_failed):
    print(f"FAIL {name}: crashed in Verify (see [verify] line above)")
    fails += 1
for name in sorted(oracles):
    if not selected(name):
        continue
    if name in verify_failed:
        continue  # already counted as a FAIL above; don't double-count
    path = f"{OUT}/{name}"
    try:
        got = pd.read_parquet(path)
    except Exception as e:
        print(f"FAIL {name}: no spark result ({e})"); fails += 1; continue
    try:
        exp = con.execute(oracles[name]).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}"); fails += 1; continue
    if sorted(got.columns) != sorted(exp.columns):
        print(f"FAIL {name}: columns {sorted(got.columns)} vs oracle {sorted(exp.columns)}"); fails += 1; continue
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} vs oracle {len(exp)}"); fails += 1; continue
    hg, he = frame_hash(got), frame_hash(exp)
    for w in dtype_warns(got, exp):
        print(f"WARN {name}: dtype parity {w} (driver hash may red even if local hash greens)")
        warns += 1
    if hg != he:
        print(f"FAIL {name}: hash {hg} vs {he}")
        both = got[sorted(got.columns)].merge(exp[sorted(exp.columns)], how="outer", indicator=True)
        diff = both[both["_merge"] != "both"]
        print(diff.head(6).to_string())
        fails += 1; continue
    print(f"ok   {name}: rows={len(got)} hash={hg}")

# rows-only queries (no oracle) — restricted to the query set Verify
# just dumped, so stale dirs from removed queries are never reported ok.
try:
    current = set(json.load(open(f"{OUT}/query_names.json")))
except Exception:
    current = set(os.listdir(OUT))
for name in sorted(os.listdir(OUT)):
    p = os.path.join(OUT, name)
    if os.path.isdir(p) and name in current and name not in oracles and selected(name):
        try:
            n = len(pd.read_parquet(p))
            print(f"ok   {name}: rows={n} (rows-only, no oracle)")
            if n == 0:
                print(f"WARN {name}: zero rows");
        except Exception as e:
            print(f"FAIL {name}: unreadable ({e})"); fails += 1

tail = f" ({warns} dtype warnings)" if warns else ""
print(f"\n{'ALL GREEN' if fails == 0 else f'{fails} FAILURES'}{tail}")
sys.exit(1 if fails else 0)
