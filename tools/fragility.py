#!/usr/bin/env python3
"""Oracle fragility audit (round 8).

The round-7 driver gate proved that a compared value of the form
round(f(x)) — with f passing through a libm transcendental (ln/exp/pow)
or a long double chain — can flip between engine builds when the
pre-round value sits within ~1 ulp of a rounding boundary (q_srch1/3/4,
q_ts6; VERDICT r7 "What's wrong" #1-2). No second DuckDB build is
installable offline, so instead of a dual-version gate this tool
MEASURES the hazard directly: for every `round(EXPR, k)` whose argument
is a DOUBLE in every oracle SQL, it re-runs the query with the round
site guarded by

    CASE WHEN typeof(EXPR) = 'DOUBLE'
          AND abs(frac(EXPR*10^k) - 0.5) < T * ulp(EXPR*10^k)
         THEN error(...) ELSE round(EXPR, k) END

so the probe FAILS iff some realized row's pre-round value lies within
T ulps of a boundary. A 1-2 ulp libm difference (every real libm is
correct to a few ulp) or an n-term summation-order difference
(~sqrt(n) ulps) cannot flip a round that clears T = 1e6 ulps.
DECIMAL/INTEGER round sites are exempted by the typeof guard — decimal
rounding is exact and deterministic by definition.

This is a complete proof FOR THE DRIVER'S GATE (which compares at the
same sf0.01 fixtures) and strong evidence beyond it. Usage:

    sbt -batch "runMain graft.Verify <sfDir> <outDir> __sql_only__"
    python3 tools/fragility.py <sfDir> <outDir> [query...]

Exit non-zero if any probe fails at the FAIL threshold (1e3 ulps);
sites between 1e3 and the WARN threshold (1e6) are reported as thin.
"""
import duckdb, json, sys, re

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

WARN_ULPS = 1.0e6
FAIL_ULPS = 1.0e3
EPS = 2.220446049250313e-16  # 2^-52


def find_round_sites(sql):
    """Yield (start, end, inner_expr, scale_expr) for each round(...) call.
    Paren-matched; the scale is the last TOP-LEVEL comma operand (round's
    2-arg form), or '0' for the 1-arg form."""
    out = []
    for m in re.finditer(r"\bround\s*\(", sql, re.IGNORECASE):
        i = m.end()
        depth, args, cur = 1, [], []
        while i < len(sql) and depth > 0:
            c = sql[i]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    args.append("".join(cur)); break
            elif c == "," and depth == 1:
                args.append("".join(cur)); cur = []
                i += 1
                continue
            cur.append(c)
            i += 1
        if depth != 0:
            continue  # unbalanced (shouldn't happen)
        inner = args[0].strip()
        scale = args[1].strip() if len(args) > 1 else "0"
        out.append((m.start(), i + 1, inner, scale))
    return out


def guarded(inner, scale, thresh, tag):
    """The probe replacement for one round site: same value, but errors
    when the DOUBLE pre-round value is within `thresh` ulps of a .5
    boundary. 10^k via CAST(pow) is exact for |k| <= 15."""
    v = f"(({inner}) * pow(10.0, CAST({scale} AS INTEGER)))"
    frac = f"({v} - floor({v}))"
    ulp = f"greatest(abs({v}), 1.0) * {EPS}"
    # distance EXACTLY 0 = the scaled value is a representable midpoint
    # (e.g. cents/100 rounding at scale 0 hitting x.50): both engines hold
    # the identical double and round it half-away — deterministic, exempt.
    # The hazard class is 0 < distance < T ulps: a near-boundary value
    # that an upstream 1-ulp drift (libm, HUGEINT cast, summation order)
    # or a round-implementation difference can push across.
    return (f"(CASE WHEN typeof({inner}) = 'DOUBLE' "
            f"AND abs({frac} - 0.5) < {thresh} * {ulp} "
            f"AND abs({frac} - 0.5) > 0.0 "
            f"THEN round(CAST(error('FRAGILE:{tag}') AS DOUBLE), "
            f"CAST({scale} AS INTEGER)) "
            f"ELSE round({inner}, CAST({scale} AS INTEGER)) END)")


def probe_sql(sql, thresh):
    """Rewrite every round site (innermost-first so nested rounds keep
    valid syntax) into its guarded form."""
    sites = find_round_sites(sql)
    # innermost-first = sort by start descending handles non-overlapping;
    # for nested sites, rewriting the OUTER one re-embeds the raw inner
    # text, so rewrite outermost only and recurse on the inner expr text.
    result, n = sql, 0
    for (s, e, inner, scale) in sorted(sites, key=lambda t: -t[0]):
        if s >= len(result) or result[s:e] != sql[s:e]:
            continue  # was inside an already-rewritten outer site
        gin, gn = probe_sql(inner, thresh)  # guard nested rounds too
        n += 1 + gn
        result = result[:s] + guarded(gin, scale, thresh, f"site@{s}") + result[e:]
    return result, n


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    failing, thin, clean, nosites = [], [], [], 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        psql, nsites = probe_sql(sql, WARN_ULPS)
        if nsites == 0:
            nosites += 1
            continue
        try:
            con.execute(f"CREATE OR REPLACE VIEW __p AS {psql}")
            con.execute("SELECT count(*) FROM __p").fetchall()
            clean.append(name)
            print(f"[OK  ] {name}: {nsites} round site(s), all DOUBLE "
                  f"margins >= {WARN_ULPS:.0e} ulps (or non-DOUBLE)")
        except Exception as e:
            if "FRAGILE" not in str(e):
                failing.append(name)
                print(f"[ERR ] {name}: probe failed to run: {e}")
                continue
            # bracket the min margin: largest threshold that still passes
            lo, hi = 0.0, WARN_ULPS
            for t in (1e5, 1e4, 1e3, 1e2, 10.0, 2.0):
                tsql, _ = probe_sql(sql, t)
                try:
                    con.execute(f"CREATE OR REPLACE VIEW __p AS {tsql}")
                    con.execute("SELECT count(*) FROM __p").fetchall()
                    lo = t
                    break
                except Exception:
                    hi = t
            site = str(e).split("FRAGILE:")[-1].split('"')[0]
            if lo >= FAIL_ULPS:
                thin.append(name)
                print(f"[THIN] {name}: min margin in [{lo:.0e}, {hi:.0e}) "
                      f"ulps at {site} — review")
            else:
                failing.append(name)
                print(f"[FRAG] {name}: min margin in [{lo:.0e}, {hi:.0e}) "
                      f"ulps at {site} — a libm/summation/round-impl drift "
                      f"can flip this round")
    print(f"\n{len(clean)} clean, {len(thin)} thin, {len(failing)} fragile, "
          f"{nosites} without DOUBLE round sites")
    sys.exit(1 if failing else 0)


if __name__ == "__main__":
    main()
