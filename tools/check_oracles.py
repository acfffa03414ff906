"""Local mirror of the driver's correctness gate: run each queries()
entry on Spark and its oracle_sql() on DuckDB at sf0.01, compare
row-count, schema width, and order-insensitive values.

Usage: python tools/check_oracles.py [query ...]
       python tools/check_oracles.py --changed-since <git-ref>

``--changed-since`` selects only the queries whose implementation could
have moved since <git-ref>: it diffs the package, computes the dirty
module closure over the package's import graph (a change to kernels.py
dirties em/hmm/... and everything above), and keeps each query whose
entry-function source references a dirty module. A change to
__spark_entry__.py or tools/local_oracle.py conservatively selects
everything. This keeps the full gate runnable on every close-out
without paying the full sweep for a one-module change.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys
import traceback

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402
from bigdata_event_stream_detection_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "bigdata_event_stream_detection_spark"


def _module_graph() -> dict[str, set[str]]:
    """module basename -> set of package modules it imports (direct)."""
    deps: dict[str, set[str]] = {}
    pkg_root = os.path.join(REPO, PKG)
    names = set()
    for dirpath, _dirs, files in os.walk(pkg_root):
        for f in files:
            if f.endswith(".py"):
                names.add(f[:-3])
    imp = re.compile(
        r"^\s*from\s+\.+([\w.]*)\s+import\s+([\w, ]+)|"
        r"^\s*from\s+" + PKG + r"\.([\w.]+)\s+import", re.M)
    for dirpath, _dirs, files in os.walk(pkg_root):
        for f in files:
            if not f.endswith(".py"):
                continue
            src = open(os.path.join(dirpath, f)).read()
            mods = set()
            for m in imp.finditer(src):
                for grp in (m.group(1), m.group(3)):
                    if grp:
                        mods.add(grp.split(".")[-1])
                if m.group(2):  # from . import em as em_ops, windows
                    for tok in m.group(2).split(","):
                        tok = tok.strip().split(" as ")[0].strip()
                        if tok in names:
                            mods.add(tok)
            deps[f[:-3]] = mods & names
    return deps


def _dirty_closure(changed: set[str], deps: dict[str, set[str]]) -> set[str]:
    dirty = set(changed)
    grew = True
    while grew:
        grew = False
        for mod, ds in deps.items():
            if mod not in dirty and ds & dirty:
                dirty.add(mod)
                grew = True
    return dirty


def changed_queries(ref: str, qs: dict) -> set[str] | None:
    """Queries affected since ``ref``; None means 'run everything'."""
    import inspect

    out = subprocess.run(
        ["git", "diff", "--name-only", ref, "--", PKG,
         "__spark_entry__.py", "tools/local_oracle.py"],
        cwd=REPO, capture_output=True, text=True, check=True).stdout
    files = [f for f in out.splitlines() if f]
    if any(f in ("__spark_entry__.py", "tools/local_oracle.py")
           for f in files):
        return None
    changed = {os.path.basename(f)[:-3] for f in files if f.endswith(".py")}
    if not changed:
        return set()
    dirty = _dirty_closure(changed, _module_graph())
    word = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")
    picked = set()
    for name, fn in qs.items():
        try:
            toks = set(word.findall(inspect.getsource(fn)))
        except OSError:
            picked.add(name)   # unknown source: be conservative
            continue
        if toks & dirty:
            picked.add(name)
    return picked


def normalize(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in cols:
            v = r[c] if not isinstance(r, tuple) else r[cols.index(c)]
            if isinstance(v, float):
                v = round(v, 6)
            vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


def main():
    args = sys.argv[1:]
    qs_all = entry_mod.queries()
    if args[:1] == ["--changed-since"]:
        picked = changed_queries(args[1], qs_all)
        only = None if picked is None else picked
        extra = set(args[2:])
        if only is not None:
            only |= extra
            if not only:
                print("no queries affected since", args[1])
                return 0
            print(f"changed-since {args[1]}: {len(only)}/{len(qs_all)} "
                  f"queries selected: {sorted(only)}")
        only = set() if only is None else only
    else:
        only = set(args)
    cores = int(os.environ.get("ORACLE_CHECK_CORES", "8"))
    spark = get_spark("oracle-check", cores=cores,
                      shuffle_partitions=cores,
                      extra_conf={"spark.driver.memory": "8g"})
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF_DIR)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception:
            print(f"[SPARK-ERR] {name}")
            traceback.print_exc()
            failures.append(name)
            continue
        if name not in oracles:
            print(f"[ROWS-ONLY] {name}: {len(srows)} rows")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception:
            print(f"[DUCK-ERR] {name}")
            traceback.print_exc()
            failures.append(name)
            continue
        ok_schema = sorted(c.lower() for c in scols) == sorted(
            c.lower() for c in dcols)
        # Typed proxy for the driver's value-hash: a DuckDB HUGEINT /
        # DECIMAL(38,x) sum materializes as a different pandas dtype (or
        # object/Decimal) than Spark's BIGINT/DOUBLE, which renders
        # differently and breaks the hash even when values agree.
        if ok_schema:
            try:
                ddf = con.execute(oracles[name]).df()
                spdf = sdf.toPandas()
                tdiff = []
                for c in scols:
                    sk = spdf[c].dtype.kind
                    dk = ddf[c].dtype.kind
                    if sk != dk:
                        tdiff.append((c, str(spdf[c].dtype), str(ddf[c].dtype)))
                    elif sk == "O" and len(spdf) and len(ddf):
                        st = type(spdf[c].dropna().iloc[0]).__name__ \
                            if spdf[c].notna().any() else None
                        dt = type(ddf[c].dropna().iloc[0]).__name__ \
                            if ddf[c].notna().any() else None
                        if st != dt:
                            tdiff.append((c, f"obj:{st}", f"obj:{dt}"))
                if tdiff:
                    print(f"[TYPE-MISMATCH] {name}: {tdiff}")
                    failures.append(name)
                    continue
            except Exception:
                print(f"[TYPE-CHECK-ERR] {name} (non-fatal)")
                traceback.print_exc()
        s_norm = normalize([r.asDict() for r in srows], scols)
        # reorder duck columns to match spark order by name
        idx = [dcols.index(c) for c in scols] if ok_schema else None
        if idx is not None:
            d_norm = sorted(
                tuple(
                    str(round(r[i], 6) if isinstance(r[i], float) else r[i])
                    for i in idx)
                for r in drows)
        else:
            d_norm = None
        if not ok_schema:
            print(f"[SCHEMA-MISMATCH] {name}: spark={scols} duck={dcols}")
            failures.append(name)
        elif len(s_norm) != len(d_norm):
            print(f"[COUNT-MISMATCH] {name}: spark={len(s_norm)} "
                  f"duck={len(d_norm)}")
            failures.append(name)
        elif s_norm != d_norm:
            diff = [(a, b) for a, b in zip(s_norm, d_norm) if a != b][:3]
            print(f"[VALUE-MISMATCH] {name}: first diffs {diff}")
            failures.append(name)
        else:
            print(f"[OK] {name}: {len(s_norm)} rows")
    print("\nFAILURES:", failures if failures else "none")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
