#!/usr/bin/env python3
"""Tractable FULL-SURFACE oracle sweep at the bench SF (sf0.1).

check_oracle.py replays every oracle verbatim — correct, but the
set-similarity family is brute-force all-pairs SQL by design (the
oracle's job is to be obviously-equivalent, not fast), which at sf0.1
(5000 docs -> 12.5M list_intersect pairs) runs for hours. This tool
makes the bench-SF sweep routine:

 1. MECHANICAL CTE MATERIALIZATION: each oracle's WITH-chain is split
    (paren/quote-aware) and materialized CTE-by-CTE as DuckDB temp
    tables, cached across queries by chain-prefix hash — the shared
    shingle/pair/edge tables compute ONCE for the whole graph/dedup
    family instead of once per consumer.
 2. ITERATIVE COMPONENTS FIXPOINT: the recursive transitive-closure
    CTE pair (reach -> comp = least(node, min(reachable))) is replaced
    by min-label propagation over the materialized symmetric edge
    table — same fixpoint (min node id per connected component),
    diameter-many cheap passes instead of materializing the closure.
 3. INVERTED-INDEX ALL-PAIRS REWRITE: the brute-force pattern
    `len(list_intersect(a.S, b.S)) ... FROM sh a, sh b` under a
    strictly-positive threshold rewrites to unnest -> equi-join ->
    group-count (intersection sizes for co-occurring pairs only; a
    zero-intersection pair cannot pass a positive threshold, which the
    tool VERIFIES before applying). Algebraic identity, detected
    structurally — a retuned threshold is picked up, an unrecognized
    shape falls back to verbatim SQL.

Every rewrite is SELF-CHECKED: `--selfcheck` runs each rewritten query
BOTH ways at the given (small) SF and diffs the frames — run it at
sf0.01 before trusting a sweep at sf0.1.

Usage:
  sbt -batch 'runMain graft.Verify /root/testdata/sf0.1 /tmp/v_sf1'
  python3 dev/sweep_oracle.py /root/testdata/sf0.01 /tmp/v_sf01 --selfcheck
  python3 dev/sweep_oracle.py /root/testdata/sf0.1 /tmp/v_sf1 --report /tmp/sweep_sf1.json

Dev-only tooling (the driver's gate still replays verbatim SQL at
sf0.01); not part of the Spark library.
"""
import argparse
import glob
import hashlib
import json
import os
import re
import sys
import threading
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check_oracle import TABLES, canon  # noqa: E402


# --------------------------------------------------------------- splitting

def split_ctes(sql):
    """(ctes:[(name, body)], final_sql, recursive). ([], sql, False) when
    the statement has no leading WITH. Paren- and quote-aware."""
    s = sql.strip()
    m = re.match(r'(?is)^WITH\s+(RECURSIVE\s+)?', s)
    if not m:
        return [], s, False
    rec = bool(m.group(1))
    i = m.end()
    ctes = []
    while True:
        m2 = re.match(r'\s*([A-Za-z_][A-Za-z0-9_]*)\s*(\([^()]*\))?\s+AS\s*\(', s[i:])
        if not m2:
            break
        # a column-alias list (dim(a, b, c) AS ...) rides along on the name
        name = m2.group(1) + (m2.group(2) or '')
        j = i + m2.end()
        depth, k, in_str = 1, i + m2.end(), False
        while k < len(s) and depth > 0:
            c = s[k]
            if in_str:
                if c == "'":
                    if k + 1 < len(s) and s[k + 1] == "'":
                        k += 1
                    else:
                        in_str = False
            elif c == "'":
                in_str = True
            elif c == '(':
                depth += 1
            elif c == ')':
                depth -= 1
            k += 1
        ctes.append((name, s[j:k - 1].strip()))
        m3 = re.match(r'\s*,', s[k:])
        if m3:
            i = k + m3.end()
        else:
            return ctes, s[k:].strip(), rec
    return ctes, s[i:].strip(), rec


# --------------------------------------------------- all-pairs rewrite

NUM = r'[0-9]+(?:\.[0-9]+)?'
# inner brute-force subquery over `sh a, sh b` with a jaccard or
# containment score, immediately filtered by a positive threshold
ALLPAIRS_RE = re.compile(
    r'\(SELECT a\.doc_id(?: AS (?P<xa>\w+))?, b\.doc_id(?: AS (?P<xb>\w+))?, '
    r'len\(list_intersect\(a\.(?P<col>\w+), b\.(?P=col)\)\)::DOUBLE / '
    r'(?P<den>\(len\(a\.(?P=col)\) \+ len\(b\.(?P=col)\) - len\(list_intersect\(a\.(?P=col), b\.(?P=col)\)\)\)|len\(a\.(?P=col)\)) '
    r'AS (?P<j>\w+) FROM sh a, sh b WHERE (?P<cond>[^)]+)\) '
    r'WHERE (?P=j) >= (?P<thr>' + NUM + r')')


# same brute force with the score INLINE in the WHERE clause (the
# curation capstone's dup-marking subquery selects only the b side)
ALLPAIRS_WHERE_RE = re.compile(
    r'\(SELECT b\.doc_id AS (?P<xb>\w+) FROM sh a, sh b '
    r'WHERE a\.doc_id < b\.doc_id AND '
    r'len\(list_intersect\(a\.(?P<col>\w+), b\.(?P=col)\)\)::DOUBLE / '
    r'\(len\(a\.(?P=col)\) \+ len\(b\.(?P=col)\) - len\(list_intersect\(a\.(?P=col), b\.(?P=col)\)\)\) '
    r'>= (?P<thr>' + NUM + r')\)')


def rewrite_allpairs(sql):
    """Inverted-index rewrite of the brute-force all-pairs subquery.
    Applied only under a strictly-positive threshold (verified here):
    a pair with empty intersection scores 0/NULL and cannot pass, so
    restricting to co-occurring pairs is an algebraic identity."""
    mw = ALLPAIRS_WHERE_RE.search(sql)
    if mw and float(mw.group('thr')) > 0:
        col, xb, thr = mw.group('col'), mw.group('xb'), mw.group('thr')
        repl = (
            f"(WITH ex_ap AS (SELECT doc_id, unnest({col}) AS g FROM sh), "
            f"sz_ap AS (SELECT doc_id, len({col}) AS n FROM sh), "
            f"it_ap AS (SELECT x.doc_id AS pa, y.doc_id AS pb, count(*) AS i "
            f"FROM ex_ap x JOIN ex_ap y ON x.g = y.g AND x.doc_id < y.doc_id GROUP BY 1, 2) "
            f"SELECT pb AS {xb} FROM it_ap "
            f"JOIN sz_ap a ON a.doc_id = pa JOIN sz_ap b ON b.doc_id = pb "
            f"WHERE i::DOUBLE / (a.n + b.n - i) >= {thr})")
        return sql[:mw.start()] + repl + sql[mw.end():]
    m = ALLPAIRS_RE.search(sql)
    if not m or float(m.group('thr')) <= 0:
        return None
    # split the pair condition into top-level AND conjuncts: doc_id-only
    # conjuncts stay in the pair-generation join; conjuncts over OTHER sh
    # columns but a single side (ta_winnow_overlap's `a.nw >= 8`) are
    # row-local predicates — an identity to apply after the sz_ap join,
    # whose projection carries those columns along. A conjunct mixing
    # non-id columns from both sides, or containing parens (the naive
    # AND-split can't see nesting), keeps the query verbatim.
    pair_conds, side_conds, extra_cols = [], [], set()
    for c in re.split(r'\s+AND\s+', m.group('cond')):
        refs = set(re.findall(r'\b([ab])\.(\w+)', c))
        non_id = {(s, cc) for s, cc in refs if cc != 'doc_id'}
        if not non_id:
            pair_conds.append(
                c.replace('a.doc_id', 'x.doc_id').replace('b.doc_id', 'y.doc_id'))
        elif '(' not in c and len({s for s, _ in non_id}) == 1:
            side_conds.append(c)
            extra_cols |= {cc for _, cc in non_id}
        else:
            return None
    # alias-less inner selects (the recall counts) only consume count(*)
    # and the score downstream, so synthetic names are safe
    col, jn = m.group('col'), m.group('j')
    if not pair_conds or col in extra_cols or 'n' in extra_cols:
        return None
    xa = m.group('xa') or 'ap_id_a'
    xb = m.group('xb') or 'ap_id_b'
    jaccard = m.group('den').startswith('(')
    extras = ''.join(f", {c}" for c in sorted(extra_cols))
    post = ''.join(f" AND ({c})" for c in side_conds)
    score = ('i::DOUBLE / (a.n + b.n - i)' if jaccard else 'i::DOUBLE / a.n')
    repl = (
        f"(WITH ex_ap AS (SELECT doc_id, unnest({col}) AS g FROM sh), "
        f"sz_ap AS (SELECT doc_id, len({col}) AS n{extras} FROM sh), "
        f"it_ap AS (SELECT x.doc_id AS pa, y.doc_id AS pb, count(*) AS i "
        f"FROM ex_ap x JOIN ex_ap y ON x.g = y.g AND ({' AND '.join(pair_conds)}) GROUP BY 1, 2) "
        f"SELECT pa AS {xa}, pb AS {xb}, {score} AS {jn} "
        f"FROM it_ap JOIN sz_ap a ON a.doc_id = pa JOIN sz_ap b ON b.doc_id = pb"
        f" WHERE TRUE{post}) "
        f"WHERE {jn} >= {m.group('thr')}")
    return sql[:m.start()] + repl + sql[m.end():]


# ------------------------------------------------- components fixpoint

REACH_RE = re.compile(
    r'^SELECT s AS node, d AS r FROM (?P<e>\w+) UNION '
    r'SELECT reach\.node, e\.d FROM reach JOIN (?P=e) e ON reach\.r = e\.s$')
COMP_RE = re.compile(
    r'^SELECT node, least\(node, min\(r\)\) AS comp_id FROM reach GROUP BY node$')


def materialize_comp_fixpoint(con, tbl, edges_view, timed):
    """comp(node, comp_id = min node id of the connected component) via
    min-label propagation over the symmetric edge relation — the
    iterative twin of the recursive closure (identical fixpoint for a
    monotone min over reachability; edges is symmetric, so every node
    appears on the s side)."""
    timed(f"CREATE TEMP TABLE {tbl} AS "
          f"SELECT DISTINCT s AS node, s AS comp_id FROM {edges_view}")
    for _ in range(200):
        timed(f"CREATE TEMP TABLE {tbl}_n AS "
              f"SELECT c.node, least(c.comp_id, coalesce(min(cn.comp_id), c.comp_id)) AS comp_id "
              f"FROM {tbl} c LEFT JOIN {edges_view} e ON e.s = c.node "
              f"LEFT JOIN {tbl} cn ON cn.node = e.d "
              f"GROUP BY c.node, c.comp_id")
        changed = timed(f"SELECT count(*) FROM {tbl} a JOIN {tbl}_n b "
                        f"ON a.node = b.node AND a.comp_id <> b.comp_id").fetchone()[0]
        timed(f"DROP TABLE {tbl}")
        timed(f"ALTER TABLE {tbl}_n RENAME TO {tbl}")
        if changed == 0:
            return
    raise RuntimeError("components fixpoint did not converge in 200 rounds")


# ------------------------------------------------------------ the sweep

class Sweeper:
    def __init__(self, con, sf_dir, fast=True, timeout=600.0):
        self.con = con
        self.fast = fast
        self.ns = 'mf' if fast else 'mv'  # table namespace per sweeper
        self.timeout = timeout
        self.cache = {}       # chain-hash -> temp table name
        self.failed = set()   # chain-hash that timed out / errored
        self.rewrote = set()  # query names where any fast path applied
        for t in TABLES:
            # a table is either a single parquet file (driver testdata) or
            # a Spark-written directory of part files (ScaleCorpus output)
            p = f'{sf_dir}/{t}.parquet'
            if os.path.isdir(p):
                p = f'{p}/*.parquet'
            con.execute(f"CREATE OR REPLACE VIEW {t} AS "
                        f"SELECT * FROM read_parquet('{p}')")

    def _timed(self, sql, budget_box):
        """Execute with the remaining per-query budget; interrupt on
        overrun (DuckDB raises, we re-raise as TimeoutError)."""
        start = time.time()
        if budget_box[0] <= 0:
            raise TimeoutError("query budget exhausted")
        timer = threading.Timer(budget_box[0], self.con.interrupt)
        timer.start()
        try:
            return self.con.execute(sql)
        except (duckdb.InterruptException, RuntimeError) as e:
            if 'INTERRUPT' in str(e).upper() or isinstance(e, duckdb.InterruptException):
                raise TimeoutError(f"interrupted after {time.time() - start:.0f}s")
            raise
        finally:
            timer.cancel()
            budget_box[0] -= time.time() - start

    def run(self, name, sql):
        """Execute one oracle; returns (DataFrame, info dict)."""
        budget = [self.timeout]
        timed = lambda s: self._timed(s, budget)
        ctes, final, rec = split_ctes(sql)
        # a recursive body is not executable outside its WITH RECURSIVE
        # context — only the recognized reach->comp pair has a fast
        # substitute; anything else (or the verbatim sweeper) runs the
        # whole statement untouched
        names = [n for n, _ in ctes]
        reach_ok = ('reach' in names and 'comp' in names and
                    names.index('comp') == names.index('reach') + 1 and
                    REACH_RE.match(dict(ctes)['reach']) and
                    COMP_RE.match(dict(ctes)['comp']))
        if rec and not (self.fast and reach_ok):
            return timed(sql).df(), {'rewritten': False,
                                     'budget_left': round(budget[0], 1)}
        views = []
        try:
            chain = hashlib.sha256()
            skip_next_comp = False
            reach_edges = None  # edge-table name captured from the reach body
            for idx, (cdecl, body) in enumerate(ctes):
                nm = re.match(r'([A-Za-z_]\w*)\s*(\(.*\))?$', cdecl)
                cname, colspec = nm.group(1), nm.group(2) or ''
                chain.update(f"|{cdecl}|{body}".encode())
                key = chain.hexdigest()
                if key in self.failed:
                    raise TimeoutError(f"prerequisite CTE '{cname}' previously failed")
                reach_m = REACH_RE.match(body) if cname == 'reach' else None
                if reach_m and self.fast:
                    # closure never materializes; the next CTE (comp)
                    # runs the iterative fixpoint instead, over the edge
                    # table the reach body actually names
                    skip_next_comp = True
                    reach_edges = reach_m.group('e')
                    self.rewrote.add(name)
                    continue
                tbl = f"{self.ns}_{key[:16]}"
                if key not in self.cache:
                    try:
                        if skip_next_comp and cname == 'comp' and COMP_RE.match(body):
                            materialize_comp_fixpoint(self.con, tbl, reach_edges, timed)
                        else:
                            if skip_next_comp:  # unexpected follower: bail to verbatim
                                raise ValueError(f"unrecognized CTE after reach: {cname}")
                            fast_body = rewrite_allpairs(body) if self.fast else None
                            if fast_body:
                                self.rewrote.add(name)
                            # wrapped so bare-VALUES bodies materialize too
                            timed(f"CREATE TEMP TABLE {tbl} AS "
                                  f"SELECT * FROM ({fast_body or body})")
                    except TimeoutError:
                        self.failed.add(key)
                        self.con.execute(f"DROP TABLE IF EXISTS {tbl}")
                        raise
                    self.cache[key] = tbl
                if cname == 'comp':
                    skip_next_comp = False
                self.con.execute(f"CREATE OR REPLACE TEMP VIEW {cname}{colspec} AS "
                                 f"SELECT * FROM {self.cache[key]}")
                views.append(cname)
            fast_final = rewrite_allpairs(final) if self.fast else None
            if fast_final:
                self.rewrote.add(name)
            return timed(fast_final or final).df(), {
                'rewritten': name in self.rewrote,
                'budget_left': round(budget[0], 1)}
        except ValueError:
            # an unrecognized shape mid-chain is a TOOL limitation, not
            # a query failure — honor the documented contract and run
            # the original statement verbatim
            self.rewrote.discard(name)
            return timed(sql).df(), {'rewritten': False,
                                     'budget_left': round(budget[0], 1)}
        finally:
            for v in views:
                self.con.execute(f"DROP VIEW IF EXISTS {v}")


def compare(got, exp):
    g, e = canon(got), canon(exp)
    if list(g.columns) != list(e.columns):
        return f"SCHEMA_MISMATCH got={list(g.columns)} exp={list(e.columns)}"
    if len(g) != len(e):
        return f"ROWCOUNT got={len(g)} exp={len(e)}"
    if not g.equals(e):
        neq = (g != e) & ~(g.isna() & e.isna())
        bad = [c for c in g.columns if neq[c].any()]
        return f"VALUE_MISMATCH cols={bad} nrows={int(neq.any(axis=1).sum())}"
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('sf_dir')
    ap.add_argument('out_dir', help='graft.Verify output dir at the same SF')
    ap.add_argument('--timeout', type=float, default=600.0,
                    help='per-query budget in seconds')
    ap.add_argument('--threads', type=int, default=None,
                    help='cap DuckDB threads (default: DuckDB default)')
    ap.add_argument('--memory-limit', default=None,
                    help="cap DuckDB memory, e.g. '32GB' (default: DuckDB "
                         'default, 80%% of RAM — a replay that explodes an '
                         'intermediate then stalls the whole host)')
    ap.add_argument('--selfcheck', action='store_true',
                    help='also run every REWRITTEN query verbatim and diff '
                         'fast-vs-verbatim (use at a small SF)')
    ap.add_argument('--report', default=None, help='write a JSON report here')
    args = ap.parse_args()

    oracle = json.load(open(os.path.join(args.out_dir, 'oracle_sql.json')))
    con = duckdb.connect()
    if args.threads:
        con.execute(f"SET threads = {args.threads}")
    if args.memory_limit:
        con.execute(f"SET memory_limit = '{args.memory_limit}'")
    sw = Sweeper(con, args.sf_dir, fast=True, timeout=args.timeout)

    results, t_total = {}, time.time()
    for qname in sorted(oracle):
        d = os.path.join(args.out_dir, qname)
        files = glob.glob(f"{d}/*.parquet")
        if not os.path.isdir(d):
            results[qname] = {'status': 'NO_SPARK_OUTPUT', 'secs': 0.0}
            continue
        got = (con.execute(f"SELECT * FROM read_parquet({files!r})").df()
               if files else pd.DataFrame())
        t0 = time.time()
        try:
            exp, info = sw.run(qname, oracle[qname])
            diff = compare(got, exp)
            status = diff if diff else 'OK'
        except TimeoutError as e:
            status, info = f'TIMEOUT {e}', {}
        except Exception as e:  # noqa: BLE001 — record and continue the sweep
            status, info = f'ERROR {type(e).__name__}: {str(e)[:200]}', {}
        secs = time.time() - t0
        results[qname] = {'status': status, 'secs': round(secs, 2),
                          'rows': len(got), **info}
        flag = '' if status == 'OK' else '  <<<'
        print(f"{qname:<34} {status[:120]:<24} {secs:7.2f}s{flag}", flush=True)

    # self-check: every query a fast path touched, replayed verbatim
    sc_fail = 0
    if args.selfcheck:
        print('\n--- selfcheck: fast vs verbatim on rewritten queries ---')
        slow = Sweeper(con, args.sf_dir, fast=False, timeout=args.timeout * 4)
        for qname in sorted(sw.rewrote):
            t0 = time.time()
            fast_df, _ = sw.run(qname, oracle[qname])
            verb_df, _ = slow.run(qname, oracle[qname])
            diff = compare(fast_df, verb_df)
            secs = time.time() - t0
            results[qname]['selfcheck'] = diff if diff else 'OK'
            if diff:
                sc_fail += 1
            print(f"{qname:<34} {(diff or 'OK'):<24} {secs:7.2f}s", flush=True)

    ok = sum(1 for r in results.values() if r['status'] == 'OK')
    total = time.time() - t_total
    summary = {'sf_dir': args.sf_dir, 'ok': ok, 'total': len(results),
               'rewritten': sorted(sw.rewrote), 'selfcheck_failures': sc_fail,
               'wall_secs': round(total, 1)}
    print(f"\n{ok}/{len(results)} ok in {total:.0f}s "
          f"({len(sw.rewrote)} rewritten, selfcheck failures: {sc_fail})")
    if args.report:
        json.dump({'summary': summary, 'queries': results},
                  open(args.report, 'w'), indent=1)
        print(f"report -> {args.report}")
    sys.exit(0 if ok == len(results) and sc_fail == 0 else 1)


if __name__ == '__main__':
    main()
