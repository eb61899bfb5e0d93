#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB differential oracle.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), runs each
oracle SQL in DuckDB against views over <sfDir>/*.parquet, and compares
with the Spark result parquet at <verifyOutDir>/<name>/ — columns sorted
by name, exact value equality (floats bit-exact, NaN==NaN), row order
preserved. Mirrors the driver's row/schema/hash check so mismatches are
caught before the round ends.

Dtype-STRICT (r2 lesson): the driver hashes values, so DuckDB float64
4375.0 vs Spark BIGINT 4375 is a FAIL even though Python `==` calls them
equal. We compare both the declared column types (con.description, sorted
by column name) and the Python runtime type of every value (bool < int <
float < Decimal are all distinct).

Dev tool only — not part of the engine (the engine has zero Python).
"""
import sys, json, glob, math, struct

import duckdb


def floats_eq(a, b):
    """BIT-strict float compare (VERDICT r15 #2): the driver hashes raw
    values, so -0.0 vs 0.0 (numerically == in Python) is a driver FAIL.
    Compare the IEEE byte patterns; NaN==NaN kept (any NaN payload)."""
    if math.isnan(a) and math.isnan(b):
        return True
    return struct.pack('<d', a) == struct.pack('<d', b)


def vals_eq(a, b):
    """Driver-equivalent value compare: floats bit-strict, lists/tuples
    element-wise recursive (array columns hold floats too), type-strict
    scalars otherwise."""
    if a is None or b is None:
        return a is None and b is None
    if type(a) is not type(b):
        return False
    if isinstance(a, float):
        return floats_eq(a, b)
    if isinstance(a, (list, tuple)):
        return len(a) == len(b) and all(vals_eq(x, y) for x, y in zip(a, b))
    return a == b


def selftest():
    """Checker-on-the-checker: the r15 q_knn_graph escape (-0.0 == 0.0
    under Python ==) must FAIL here, and the legitimate equalities must
    pass. Run: python3 tools/check_oracle.py --selftest"""
    assert not vals_eq(-0.0, 0.0), "-0.0 vs 0.0 must FAIL (r15 q_knn_graph)"
    assert not vals_eq([1.0, -0.0], [1.0, 0.0]), "-0.0 inside arrays must FAIL"
    assert vals_eq(float('nan'), float('nan')), "NaN == NaN kept"
    assert vals_eq(-0.0, -0.0) and vals_eq(0.0, 0.0)
    assert vals_eq(0.1 + 0.2, 0.1 + 0.2) and not vals_eq(0.1 + 0.2, 0.3)
    assert not vals_eq(1, 1.0), "int vs float is a dtype FAIL"
    assert not vals_eq(True, 1), "bool vs int is a dtype FAIL"
    assert vals_eq([["a", 1]], [["a", 1]]) and not vals_eq([1], [1, 2])
    assert vals_eq(None, None) and not vals_eq(None, 0.0)
    print("selftest ok")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    if sys.argv[1:] == ["--selftest"]:
        selftest()
        return
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    with open(f"{outdir}/oracle_sql.json") as f:
        oracle = json.load(f)
    try:  # written by Verify since r13; names queries that THREW
        with open(f"{outdir}/failures.json") as f:
            thrown = json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        # absent (pre-r13 dump) or truncated (Verify killed mid-write):
        # fall back to the old no-output-only diagnosis rather than
        # crashing the checker itself
        thrown = {}
    n_ok = n_fail = 0
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        # thrown wins over any files on disk: Verify only overwrites on
        # success, so a query that threw THIS run can leave stale parquet
        # from a previous dump into the same outdir — comparing that
        # would report ok for a broken query
        if name in thrown:
            print(f"FAIL {name}: {thrown[name]}")
            n_fail += 1
            continue
        files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output (not written, no error recorded)")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchall()
            gcols = [d[0] for d in con.description]
            gtypes = {d[0]: str(d[1]) for d in con.description}
            want = con.execute(sql).fetchall()
            wcols = [d[0] for d in con.description]
            wtypes = {d[0]: str(d[1]) for d in con.description}
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        if sorted(gcols) != sorted(wcols):
            print(f"FAIL {name}: cols spark={sorted(gcols)} duck={sorted(wcols)}")
            n_fail += 1
            continue
        dt_bad = [(c, gtypes[c], wtypes[c]) for c in sorted(gcols)
                  if gtypes[c] != wtypes[c]]
        if dt_bad:
            print(f"FAIL {name}: dtype mismatch "
                  + ", ".join(f"{c}: spark={g} duck={w}" for c, g, w in dt_bad))
            n_fail += 1
            continue
        gi = [gcols.index(c) for c in sorted(gcols)]
        wi = [wcols.index(c) for c in sorted(wcols)]
        if len(got) != len(want):
            print(f"FAIL {name}: rows spark={len(got)} duck={len(want)}")
            n_fail += 1
            continue
        bad = None
        for r, (g, w) in enumerate(zip(got, want)):
            for a, b in zip([g[i] for i in gi], [w[i] for i in wi]):
                if vals_eq(a, b):
                    continue
                if type(a) is not type(b):
                    bad = (r, f"{a!r}:{type(a).__name__}",
                           f"{b!r}:{type(b).__name__}", None)
                elif isinstance(a, float) and isinstance(b, float) \
                        and not (math.isnan(a) or math.isnan(b)):
                    bad = (r, a, b, abs(a - b))
                else:
                    bad = (r, a, b, None)
                break
            if bad:
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]}: spark={bad[1]!r} duck={bad[2]!r}"
                  + (f" absdiff={bad[3]:.3g}" if bad[3] is not None else ""))
            n_fail += 1
        else:
            print(f"ok   {name} ({len(got)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
