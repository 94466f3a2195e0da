"""Randomized oracle for the SPARQL algebra subset: generated
queries (BGP + OPTIONAL + UNION + FILTER) over generated graphs run
through the full text front-end (tokenizer -> parser -> eval_group)
and must produce the same bag of bindings as an independent pure-
Python evaluator implementing the same documented semantics
(three-valued filter logic, error-eliminates-row, left-to-right
algebra) — the style of independent oracle used for G13 rewriting
and BFS traversal."""

from __future__ import annotations

import os
import random
import re as _re

# deep-soak knob: CI/default runs the committed counts; set e.g.
# SPARQL_RANDOM_SCALE=4 for a 4x longer randomized-oracle session
_SCALE = int(os.environ.get("SPARQL_RANDOM_SCALE", "1"))

from argo_spark.ops.graph import TripleGraph
from argo_spark.ops.sparql import sparql_select
from argo_spark.terms import TripleT, iri, literal

XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"


def _gen_graph(rnd: random.Random):
    """50-90 triples; predicates p0-p2 are dense (base patterns match
    broadly), p3-p9 sparse (OPTIONAL/UNION arms frequently miss, so
    null extension is actually exercised)."""
    triples = []
    for _ in range(rnd.randint(50, 90)):
        s = f"http://e/s{rnd.randint(0, 5)}"
        p = (
            f"http://e/p{rnd.randint(0, 2)}"
            if rnd.random() < 0.7
            else f"http://e/p{rnd.randint(3, 9)}"
        )
        kind = rnd.randint(0, 2)
        if kind == 0:
            o = iri(f"http://e/s{rnd.randint(0, 5)}")
        elif kind == 1:
            o = literal(f"w{rnd.randint(0, 4)}")
        else:
            # multi-digit range: numeric order must beat lexical
            # ("100" < "9" lexically) for the ORDER BY cross-check
            o = literal(str(rnd.randint(0, 120)), dt=XSD_INT)
        triples.append(TripleT(iri(s), iri(p), o))
    # NT forms, deduped the way a set-semantics store would hold them
    seen, uniq = set(), []
    for t in triples:
        key = (t.s.value, t.p.value, t.o.kind, t.o.value, t.o.lang, t.o.dt)
        if key not in seen:
            seen.add(key)
            uniq.append(t)
    return uniq


def _nt(term) -> str:
    from argo_spark.terms import format_term

    return format_term(term)


# -- independent evaluator over lists of {var: nt_string} ------------------


def _match_pattern(triples, pat):
    s, p, o = pat
    out = []
    for t in triples:
        row = {}
        ok = True
        for var_or_const, term_nt in (
            (s, _nt(t.s)), (p, _nt(t.p)), (o, _nt(t.o))
        ):
            if isinstance(var_or_const, str) and var_or_const.startswith("?"):
                v = var_or_const[1:]
                if v in row and row[v] != term_nt:
                    ok = False
                    break
                row[v] = term_nt
            else:
                if var_or_const != term_nt:
                    ok = False
                    break
        if ok:
            out.append(row)
    return out


def _join(A, B):
    out = []
    for a in A:
        for b in B:
            shared = set(a) & set(b)
            if all(a[v] == b[v] for v in shared):
                m = dict(a)
                m.update(b)
                out.append(m)
    return out


def _left_join(A, B, shared):
    # §18.5 LeftJoin over row dicts: compatibility is PER ROW — only
    # vars bound in BOTH rows must agree (a var unbound on one side
    # is always compatible; the merge takes the bound side). The
    # global `shared` list is only the anchor guarantee, not the
    # comparison set — stacked OPTIONALs on the same possibly-unbound
    # var rely on this distinction.
    out = []
    for a in A:
        hits = [
            b for b in B
            if all(a[v] == b[v] for v in set(a) & set(b))
        ]
        if hits:
            for b in hits:
                m = dict(a)
                m.update(b)
                out.append(m)
        else:
            out.append(dict(a))
    return out


def _lex(nt):
    if nt is None:
        return None
    if nt.startswith('"'):
        m = _re.match(r'^"((?:[^"\\]|\\.)*)"', nt)
        return m.group(1)
    if nt.startswith("<") and nt.endswith(">"):
        return nt[1:-1]
    return nt


def _num(nt):
    lx = _lex(nt)
    if lx is None:
        return None
    try:
        return float(lx)
    except ValueError:
        return None


def _eval_expr(expr, row):
    """Three-valued: True / False / None (None drops the row)."""
    op = expr[0]
    if op == "and":
        a, b = _eval_expr(expr[1], row), _eval_expr(expr[2], row)
        if a is False or b is False:
            return False
        if a is None or b is None:
            return None
        return True
    if op == "or":
        a, b = _eval_expr(expr[1], row), _eval_expr(expr[2], row)
        if a is True or b is True:
            return True
        if a is None or b is None:
            return None
        return False
    if op == "not":
        a = _eval_expr(expr[1], row)
        return None if a is None else not a
    if op == "bound":
        return row.get(expr[1]) is not None
    if op == "strfn2":
        fn = expr[1]
        a = _lex(row.get(expr[2][1])) if expr[2][0] == "var" else _lex(expr[2][1])
        b = _lex(expr[3][1]) if expr[3][0] == "nt" else _lex(row.get(expr[3][1]))
        if a is None or b is None:
            return None
        if fn == "STRSTARTS":
            return a.startswith(b)
        if fn == "STRENDS":
            return a.endswith(b)
        return b in a
    if op == "arith_cmp":
        # ("arith_cmp", cmp_op, var, arith_op, num_const, rhs_num)
        _, cmp_op, v, aop, k, rhs = expr
        n = _num(row.get(v))
        if n is None:
            return None
        val = {"+": n + k, "-": n - k, "*": n * k}[aop]
        return {"<": val < rhs, "<=": val <= rhs, ">": val > rhs,
                ">=": val >= rhs, "=": val == rhs, "!=": val != rhs}[cmp_op]
    if op == "in_list":
        # ("in_list", var, [nt...], negated) — NT-identity membership
        nt = row.get(expr[1])
        if nt is None:
            return None
        res = nt in expr[2]
        return (not res) if expr[3] else res
    if op == "strba_cmp":
        # ("strba_cmp", STRBEFORE|STRAFTER, var, pat, want)
        lx = _lex(row.get(expr[2]))
        if lx is None:
            return None
        pat = expr[3]
        if expr[1] == "STRBEFORE":
            got = "" if pat == "" else (
                lx.split(pat, 1)[0] if pat in lx else ""
            )
        else:
            got = lx if pat == "" else (
                lx.split(pat, 1)[1] if pat in lx else ""
            )
        return got == expr[4]
    if op == "numfn_cmp":
        # ("numfn_cmp", fn, var, divisor, cmp_op, rhs)
        import math

        n = _num(row.get(expr[2]))
        if n is None:
            return None
        x = n / expr[3]
        val = {
            "ABS": abs(x),
            "CEIL": math.ceil(x),
            "FLOOR": math.floor(x),
            "ROUND": math.floor(x + 0.5),  # fn:round: half toward +inf
        }[expr[1]]
        cmp_op, rhs = expr[4], expr[5]
        return {"<": val < rhs, "<=": val <= rhs, ">": val > rhs,
                ">=": val >= rhs, "=": val == rhs, "!=": val != rhs}[cmp_op]
    if op == "substr_cmp":
        # ("substr_cmp", var, start, length, want)
        lx = _lex(row.get(expr[1]))
        if lx is None:
            return None
        return lx[expr[2] - 1:expr[2] - 1 + expr[3]] == expr[4]
    if op == "regex":
        lx = _lex(row.get(expr[1][1]))
        if lx is None:
            return None
        return bool(_re.search(expr[2], lx))
    # cmp: operands are ("var", name) | ("num", v) | ("nt", nt_string)
    cmp_op, left, right = expr[1], expr[2], expr[3]
    numeric = left[0] == "num" or right[0] == "num"

    def side(o):
        if o[0] == "var":
            nt = row.get(o[1])
            return (_num(nt) if numeric else None), nt, _lex(nt)
        if o[0] == "num":
            return o[1], None, None
        return _num(o[1]) if numeric else None, o[1], _lex(o[1])

    ln, lnt, llex = side(left)
    rn, rnt, rlex = side(right)
    if cmp_op in ("=", "!="):
        if numeric:
            if ln is None or rn is None:
                return None
            eq = ln == rn
        else:
            if lnt is None or rnt is None:
                return None
            eq = lnt == rnt
        return eq if cmp_op == "=" else not eq
    a, b = (ln, rn) if numeric else (llex, rlex)
    if a is None or b is None:
        return None
    return {"<": a < b, "<=": a <= b, ">": a > b, ">=": a >= b}[cmp_op]


def _eval_group_py(triples, group):
    elements, filters = group
    acc = None
    for kind, payload in elements:
        if kind == "bgp":
            frame = None
            for pat in payload:
                rows = _match_pattern(triples, pat)
                frame = rows if frame is None else _join(frame, rows)
        elif kind == "union":
            frame = []
            for g in payload:
                frame.extend(_eval_group_py(triples, g))
        elif kind == "values":
            vnames, vrows = payload
            frame = [
                {v: nt for v, nt in zip(vnames, row) if nt is not None}
                for row in vrows
            ]
        elif kind == "minus":
            # remove rows compatible with some RHS row sharing >= 1 var
            sub = _eval_group_py(triples, payload)
            acc = [
                a for a in acc
                if not any(
                    (set(a) & set(b))
                    and all(a[v] == b[v] for v in set(a) & set(b))
                    for b in sub
                )
            ]
            continue
        else:  # optional
            sub = _eval_group_py(triples, payload)
            sub_vars = set().union(*(set(r) for r in sub)) if sub else set()
            acc_vars = set().union(*(set(r) for r in acc)) if acc else set()
            shared = sorted(sub_vars & acc_vars)
            acc = _left_join(acc, sub, shared)
            continue
        acc = frame if acc is None else _join(acc, frame)
    for f in filters:
        acc = [r for r in acc if _eval_expr(f, r) is True]
    return acc


# -- query text generation -------------------------------------------------


def _gen_pattern(rnd, vars_pool, dense=True):
    s = rnd.choice(["?x", "?x", "?x"] + vars_pool[:2])
    p = (
        f"<http://e/p{rnd.randint(0, 2)}>"
        if dense
        else f"<http://e/p{rnd.randint(0, 9)}>"
    )
    o = rnd.choice(vars_pool)
    return (s, p, o)


def _pat_text(pat):
    return " ".join(pat) + " ."


def _gen_filter(rnd, vars_pool):
    """-> (text, expr-tuple for the python evaluator)."""
    v = rnd.choice(vars_pool)[1:]
    choice = rnd.randint(0, 9)
    if choice == 6:
        # (NOT)? IN over constant plain-literal/IRI members
        members = rnd.sample(
            ['"w0"', '"w2"', '"w4"', "<http://e/s1>", "<http://e/s3>"],
            rnd.randint(1, 3),
        )
        neg = rnd.random() < 0.5
        text_members = ", ".join(
            m if m.startswith("<") else m for m in members
        )
        return (
            f"FILTER(?{v} {'NOT ' if neg else ''}IN ({text_members}))",
            ("in_list", v, members, neg),
        )
    if choice == 7:
        fn = rnd.choice(["STRBEFORE", "STRAFTER"])
        pat = rnd.choice(["w", "1", "http://e/", ""])
        want = rnd.choice(["", "1", "2", "s1", "w3"])
        return (
            f'FILTER({fn}(?{v}, "{pat}") = "{want}")',
            ("strba_cmp", fn, v, pat, want),
        )
    if choice == 8:
        fn = rnd.choice(["ABS", "CEIL", "FLOOR", "ROUND"])
        div = rnd.choice([2, 3, 7])
        cmp_op = rnd.choice(["<", "<=", ">", ">=", "=", "!="])
        rhs = rnd.randint(0, 40)
        return (
            f"FILTER({fn}(?{v} / {div}) {cmp_op} {rhs})",
            ("numfn_cmp", fn, v, float(div), cmp_op, float(rhs)),
        )
    if choice == 9:
        start = rnd.randint(1, 3)
        length = rnd.randint(1, 3)
        want = rnd.choice(["w", "w1", "tt", "1", "ht", "p:"])
        return (
            f'FILTER(SUBSTR(?{v}, {start}, {length}) = "{want}")',
            ("substr_cmp", v, start, length, want),
        )
    if choice == 0:
        n = rnd.randint(0, 9)
        op = rnd.choice(["<", "<=", ">", ">=", "=", "!="])
        return (
            f"FILTER(?{v} {op} {n})",
            ("cmp", op, ("var", v), ("num", float(n))),
        )
    if choice == 1:
        w = f"w{rnd.randint(0, 4)}"
        op = rnd.choice(["=", "!="])
        return (
            f'FILTER(?{v} {op} "{w}")',
            ("cmp", op, ("var", v), ("nt", f'"{w}"')),
        )
    if choice == 2:
        neg = rnd.random() < 0.5
        return (
            f"FILTER({'!' if neg else ''}BOUND(?{v}))",
            ("not", ("bound", v)) if neg else ("bound", v),
        )
    if choice == 3:
        pat = rnd.choice(["[0-4]", "w", "s[12]", "^h"])
        return (
            f'FILTER(REGEX(?{v}, "{pat}", ""))',
            ("regex", ("var", v), pat, ""),
        )
    if choice == 4:
        fn = rnd.choice(["STRSTARTS", "STRENDS", "CONTAINS"])
        w = rnd.choice(["w", "w1", "http", "2"])
        return (
            f'FILTER({fn}(?{v}, "{w}"))',
            ("strfn2", fn, ("var", v), ("nt", f'"{w}"')),
        )
    aop = rnd.choice(["+", "-", "*"])
    k = rnd.randint(1, 5)
    rhs = rnd.randint(0, 200)
    cmp_op = rnd.choice(["<", "<=", ">", ">=", "=", "!="])
    return (
        f"FILTER(?{v} {aop} {k} {cmp_op} {rhs})",
        ("arith_cmp", cmp_op, v, aop, float(k), float(rhs)),
    )


def test_sparql_algebra_matches_python_oracle(spark):
    total_rows = 0
    total_null_ext = 0
    for seed in range(14 * _SCALE):
        rnd = random.Random(1000 + seed)
        triples = _gen_graph(rnd)
        df = TripleGraph.of(spark, triples).df

        vars_pool = ["?x", "?y", "?z"]
        base = [_gen_pattern(rnd, vars_pool)]
        if rnd.random() < 0.6:
            base.append(_gen_pattern(rnd, vars_pool))
        elements = [("bgp", base)]
        body = [_pat_text(p) for p in base]
        if (
            len(base) == 2
            and base[0][0] == base[1][0]
            and rnd.random() < 0.5
        ):
            # same subject: render with the ';' predicate-object list
            # sugar — identical algebra, round-4b surface
            body = [
                f"{base[0][0]} {base[0][1]} {base[0][2]} ; "
                f"{base[1][1]} {base[1][2]} ."
            ]
        filter_pool = list(vars_pool)

        base_vars = sorted(
            {t[1:] for pat in base for t in pat if t.startswith("?")}
        )
        if rnd.random() < 0.4:
            # inline VALUES on a base var (defined terms only — UNDEF
            # on a join var is guarded by design); literals chosen so
            # some rows match and some don't
            words = rnd.sample(["w0", "w1", "w2", "w3", "w4"],
                               rnd.randint(1, 3))
            vvar = rnd.choice(base_vars) if base_vars else "y"
            elements.append(
                ("values", ([vvar], [[f'"{w}"'] for w in words]))
            )
            body.append(
                f"VALUES ?{vvar} {{ " + " ".join(f'"{w}"' for w in words) + " }"
            )
        if rnd.random() < 0.6 and base_vars:
            # engine (correctly) raises on OPTIONAL sharing no vars —
            # anchor the optional subject on a base-bound variable;
            # sparse predicate range so some rows null-extend
            opt = [("?" + rnd.choice(base_vars),
                    f"<http://e/p{rnd.randint(2, 9)}>", "?o")]
            elements.append(("optional", ([("bgp", opt)], [])))
            body.append("OPTIONAL { " + _pat_text(opt[0]) + " }")
            # the optional var is the interesting one for BOUND /
            # null-propagating filters — overweight it in the pool
            filter_pool += ["?o", "?o"]
            if rnd.random() < 0.4:
                # round-4b: a LATER pattern joining the possibly-
                # unbound optional var exercises the engine's full
                # compatibility join; the oracle's dict-merge _join
                # IS that relation
                extra = ("?q", f"<http://e/p{rnd.randint(0, 2)}>", "?o")
                elements.append(("bgp", [extra]))
                body.append(_pat_text(extra))
            if rnd.random() < 0.4:
                # round 5 (VERDICT r4 #5): a SECOND OPTIONAL binding
                # the SAME ?o — the engine's boundness-decomposed
                # compat LeftJoin (rows where ?o is already bound
                # must agree with the second OPTIONAL's ?o; rows
                # where it is unbound take it)
                opt2 = [("?" + rnd.choice(base_vars),
                         f"<http://e/p{rnd.randint(2, 9)}>", "?o")]
                elements.append(("optional", ([("bgp", opt2)], [])))
                body.append("OPTIONAL { " + _pat_text(opt2[0]) + " }")
        if rnd.random() < 0.4:
            b1 = [("?x", f"<http://e/p{rnd.randint(0, 9)}>", "?u")]
            b2 = [("?x", f"<http://e/p{rnd.randint(0, 9)}>", "?w")]
            elements.append(
                ("union", [([("bgp", b1)], []), ([("bgp", b2)], [])])
            )
            body.append(
                "{ " + _pat_text(b1[0]) + " } UNION { " + _pat_text(b2[0]) + " }"
            )
        if rnd.random() < 0.35 and base_vars:
            # MINUS anchored on a base-bound var; the object is
            # sometimes the possibly-unbound OPTIONAL var ?o (round
            # 5: exercises the boundness-decomposed compat MINUS —
            # rows with unbound ?o only drop when compatible on the
            # remaining shared vars, §8.3.3)
            mobj = "?o" if "?o" in filter_pool and rnd.random() < 0.5 \
                else "?m"
            mpat = [("?" + rnd.choice(base_vars),
                     f"<http://e/p{rnd.randint(0, 9)}>", mobj)]
            elements.append(("minus", ([("bgp", mpat)], [])))
            body.append("MINUS { " + _pat_text(mpat[0]) + " }")
        filters = []
        if rnd.random() < 0.8:
            ftext, fexpr = _gen_filter(rnd, filter_pool)
            filters.append(fexpr)
            body.append(ftext)

        query = "SELECT * WHERE { " + " ".join(body) + " }"
        expected = _eval_group_py(triples, (elements, filters))
        got_df = sparql_select(df, query)
        # every engine column AND every oracle-bound var takes part in
        # the compare — a var bound on only one side must surface
        all_vars = sorted(
            set(got_df.columns).union(*(set(r) for r in expected))
            if expected
            else set(got_df.columns)
        )
        nones_last = lambda t: tuple((x is None, x or "") for x in t)  # noqa: E731
        got = sorted(
            (
                tuple(getattr(r, v) if v in got_df.columns else None for v in all_vars)
                for r in got_df.collect()
            ),
            key=nones_last,
        )
        want = sorted(
            (tuple(r.get(v) for v in all_vars) for r in expected),
            key=nones_last,
        )
        assert got == want, (
            f"seed {seed}: query {query!r}\n got {got[:6]}\nwant {want[:6]}"
        )
        total_rows += len(want)

        # ORDER BY cross-check: the documented total term order
        # (unbound < blank < IRI < numeric-by-value < other-by-lexical,
        # NT tiebreak) replayed in Python; comparing the ordered
        # SEQUENCE of the key variable's values (rows tied on the full
        # key carry identical values, so the sequence is deterministic)
        if expected and base_vars and rnd.random() < 0.6:
            ov = rnd.choice(sorted({v for r in expected for v in r}
                                   & set(base_vars + ["o"]) or set(base_vars)))
            desc = rnd.random() < 0.5
            oq = query + f" ORDER BY {'DESC(?' + ov + ')' if desc else '?' + ov}"

            def okey(row):
                nt = row.get(ov)
                if nt is None:
                    return (0, 0.0, "", "")
                rank = 1 if nt.startswith("_:") else 2 if nt.startswith("<") else 3
                num = _num(nt)
                if rank == 3 and num is None:
                    rank = 4
                return (rank, num if num is not None else float("-inf"),
                        _lex(nt) or "", nt)

            py_sorted = sorted(expected, key=okey, reverse=desc)
            want_seq = [r.get(ov) for r in py_sorted]
            odf = sparql_select(df, oq)
            got_seq = [
                getattr(r, ov) if ov in odf.columns else None
                for r in odf.collect()
            ]
            assert got_seq == want_seq, (
                f"seed {seed}: ORDER BY mismatch for {oq!r}\n"
                f" got {got_seq[:8]}\nwant {want_seq[:8]}"
            )
        total_null_ext += sum(1 for t in want if None in t)
    # vacuity guard: the generator must keep producing real matches
    # AND real null extensions, or the oracle proves nothing
    assert total_rows > 50, f"generator vacuous: {total_rows} rows total"
    assert total_null_ext > 5, (
        f"no null-extension coverage: {total_null_ext} rows"
    )


def test_sparql_group_agg_matches_python_oracle(spark):
    """GROUP BY + COUNT/SUM/MIN/MAX/AVG replayed in Python over the
    same generated graphs: group rows by the key var's NT form,
    aggregate the numeric lexicals (non-numeric -> skipped), compare
    values (AVG rounded to 9 dp for float tolerance)."""
    from argo_spark.ops.graph import TripleGraph
    from argo_spark.ops.sparql import sparql_select

    for seed in range(10 * _SCALE):
        rnd = random.Random(7000 + seed)
        triples = _gen_graph(rnd)
        df = TripleGraph.of(spark, triples).df
        p = f"<http://e/p{rnd.randint(0, 2)}>"
        q = (
            "SELECT ?s (COUNT(*) AS ?n) (COUNT(?v) AS ?nv) "
            "(SUM(?v) AS ?sm) (MIN(?v) AS ?lo) (MAX(?v) AS ?hi) "
            "(AVG(?v) AS ?mean) "
            '(GROUP_CONCAT(?v; SEPARATOR="|") AS ?gc) '
            "(SAMPLE(?v) AS ?one) "
            f"WHERE {{ ?s {p} ?v }} GROUP BY ?s"
        )
        rows = _eval_group_py(triples, ([("bgp", [("?s", p, "?v")])], []))
        groups: dict = {}
        for r in rows:
            groups.setdefault(r["s"], []).append(r["v"])
        want = {}
        for s, vals in groups.items():
            nums = [n for n in (_num(v) for v in vals) if n is not None]
            want[s] = (
                len(vals), len(vals),
                sum(nums) if nums else None,
                min(nums) if nums else None,
                max(nums) if nums else None,
                round(sum(nums) / len(nums), 9) if nums else None,
                # GROUP_CONCAT: sorted lexical forms (the documented
                # deterministic order); SAMPLE: min NT form
                "|".join(sorted(_lex(v) or "" for v in vals)),
                min(vals),
            )
        got = {}
        for r in sparql_select(df, q).collect():
            got[r.s] = (
                r.n, r.nv, r.sm, r.lo, r.hi,
                round(r.mean, 9) if r.mean is not None else None,
                r.gc, r.one,
            )
        assert got == want, f"seed {seed}: {p}\n got {got}\nwant {want}"
        assert want, f"seed {seed}: no groups generated (vacuous)"


def test_sparql_closure_matches_python_oracle(spark):
    """p+ and p* replayed in Python (Warshall fixpoint over the
    predicate's edge set; * adds (n, n) for every subject/object term
    of the graph) on seeded random graphs — cycles, self-loops,
    diamond shapes all arise at these densities."""
    total_pairs = 0
    for seed in range(6 * _SCALE):
        rnd = random.Random(4000 + seed)
        triples = _gen_graph(rnd)
        df = TripleGraph.of(spark, triples).df
        pnum = rnd.randint(0, 2)
        p = f"http://e/p{pnum}"
        edges = {
            (_nt(t.s), _nt(t.o)) for t in triples if t.p.value == p
        }
        closure = set(edges)
        while True:
            new = {
                (a, d)
                for a, b in closure
                for c, d in closure
                if b == c and (a, d) not in closure
            }
            if not new:
                break
            closure |= new
        got = {
            (r.a, r.b)
            for r in sparql_select(
                df, f"SELECT ?a ?b WHERE {{ ?a <{p}>+ ?b }}"
            ).collect()
        }
        assert got == closure, f"seed {seed}: p+ mismatch"
        nodes = {_nt(t.s) for t in triples} | {_nt(t.o) for t in triples}
        want_star = closure | {(n, n) for n in nodes}
        got_star = {
            (r.a, r.b)
            for r in sparql_select(
                df, f"SELECT ?a ?b WHERE {{ ?a <{p}>* ?b }}"
            ).collect()
        }
        assert got_star == want_star, f"seed {seed}: p* mismatch"
        total_pairs += len(closure)
    assert total_pairs > 100, f"generator vacuous: {total_pairs} pairs"


def test_sparql_strfns_arith_match_python_oracle(spark):
    """Focused randomized pinning of the round-4 filter surface:
    STRSTARTS/STRENDS/CONTAINS and +-* arithmetic, one filter per
    query over a literal-heavy pattern so the arms discriminate
    (mutation-sensitive: swapping startswith/endswith flips rows on
    'wN' literals)."""
    total = kept = 0
    for seed in range(10 * _SCALE):
        rnd = random.Random(5000 + seed)
        triples = _gen_graph(rnd)
        df = TripleGraph.of(spark, triples).df
        p = f"http://e/p{rnd.randint(0, 2)}"
        rows = _eval_group_py(
            triples, ([("bgp", [("?s", f"<{p}>", "?v")])], [])
        )
        cases = [
            ("strfn2", "STRSTARTS", "w"),
            ("strfn2", "STRENDS", "0"),
            ("strfn2", "CONTAINS", "s"),
            ("arith", "+", 3.0, 60.0, ">"),
            ("arith", "*", 2.0, 100.0, "<="),
            ("arith", "-", 5.0, 50.0, ">="),
        ]
        for case in cases:
            if case[0] == "strfn2":
                _, fn, w = case
                q = (f"SELECT ?s ?v WHERE {{ ?s <{p}> ?v . "
                     f'FILTER({fn}(?v, "{w}")) }}')
                expr = ("strfn2", fn, ("var", "v"), ("nt", f'"{w}"'))
            else:
                _, aop, k, rhs, cmp_op = case
                q = (f"SELECT ?s ?v WHERE {{ ?s <{p}> ?v . "
                     f"FILTER(?v {aop} {int(k)} {cmp_op} {int(rhs)}) }}")
                expr = ("arith_cmp", cmp_op, "v", aop, k, rhs)
            want = sorted(
                (r["s"], r["v"]) for r in rows
                if _eval_expr(expr, r) is True
            )
            got = sorted(
                (r.s, r.v) for r in sparql_select(df, q).collect()
            )
            assert got == want, f"seed {seed}: {q}"
            total += len(rows)
            kept += len(want)
    # vacuity: the filters must actually keep SOME and drop SOME
    assert 0 < kept < total, (kept, total)


def test_sparql_graph_var_matches_python_oracle(spark):
    """Round 5b: GRAPH ?g over the full generated algebra. The
    engine threads ?g as one more join key through every pattern
    scan (plus boundness-decomposed compat joins when OPTIONAL vars
    recur); the independent oracle is the spec §18.6 DEFINITION —
    evaluate the group against each named graph in isolation and
    union the per-graph results extended with ?g — so any cross-
    graph leakage or missed graph shows up as a bag mismatch."""
    from pyspark.sql import functions as F

    total_rows = 0
    graphs_seen = set()
    for seed in range(10 * _SCALE):
        rnd = random.Random(7000 + seed)
        triples = _gen_graph(rnd)
        # assign each triple a named graph g0-g2, plus ~25% default-
        # graph rows that GRAPH ?g must NOT see (mutation-killed:
        # dropping the isNotNull scope filter leaks them as g=None
        # rows through single-pattern bases and fails the compare)
        by_graph: dict = {}
        default_rows = []
        for t in triples:
            if rnd.random() < 0.25:
                default_rows.append(t)
            else:
                g = f"http://g/{rnd.randint(0, 2)}"
                by_graph.setdefault(g, []).append(t)

        legs = []
        for g, ts in by_graph.items():
            legs.append(
                TripleGraph.of(spark, ts).df.withColumn(
                    "g_value", F.lit(g).cast("string"))
            )
        if default_rows:
            legs.append(
                TripleGraph.of(spark, default_rows).df.withColumn(
                    "g_value", F.lit(None).cast("string"))
            )
        df = legs[0]
        for leg in legs[1:]:
            df = df.unionByName(leg)

        # same algebra shapes as the main fuzzer, wrapped in GRAPH ?g
        vars_pool = ["?x", "?y", "?z"]
        base = [_gen_pattern(rnd, vars_pool)]
        if rnd.random() < 0.6:
            base.append(_gen_pattern(rnd, vars_pool))
        elements = [("bgp", base)]
        body = [_pat_text(p) for p in base]
        base_vars = sorted(
            {t[1:] for pat in base for t in pat if t.startswith("?")}
        )
        filter_pool = list(vars_pool)
        if rnd.random() < 0.3:
            words = rnd.sample(["w0", "w1", "w2", "w3", "w4"],
                               rnd.randint(1, 3))
            vvar = rnd.choice(base_vars) if base_vars else "y"
            elements.append(
                ("values", ([vvar], [[f'"{w}"'] for w in words]))
            )
            body.append(
                "VALUES ?" + vvar + " { "
                + " ".join(f'"{w}"' for w in words) + " }"
            )
        if rnd.random() < 0.6 and base_vars:
            opt = [("?" + rnd.choice(base_vars),
                    f"<http://e/p{rnd.randint(2, 9)}>", "?o")]
            elements.append(("optional", ([("bgp", opt)], [])))
            body.append("OPTIONAL { " + _pat_text(opt[0]) + " }")
            filter_pool += ["?o", "?o"]
            if rnd.random() < 0.4:
                # compat join on the possibly-unbound ?o WITH the
                # graph key in play
                extra = ("?q", f"<http://e/p{rnd.randint(0, 2)}>", "?o")
                elements.append(("bgp", [extra]))
                body.append(_pat_text(extra))
        if rnd.random() < 0.4:
            b1 = [("?x", f"<http://e/p{rnd.randint(0, 9)}>", "?u")]
            b2 = [("?x", f"<http://e/p{rnd.randint(0, 9)}>", "?w")]
            elements.append(
                ("union", [([("bgp", b1)], []), ([("bgp", b2)], [])])
            )
            body.append(
                "{ " + _pat_text(b1[0]) + " } UNION { "
                + _pat_text(b2[0]) + " }"
            )
        if rnd.random() < 0.35 and base_vars:
            mpat = [("?" + rnd.choice(base_vars),
                     f"<http://e/p{rnd.randint(0, 9)}>", "?m")]
            elements.append(("minus", ([("bgp", mpat)], [])))
            body.append("MINUS { " + _pat_text(mpat[0]) + " }")
        filters = []
        if rnd.random() < 0.7:
            ftext, fexpr = _gen_filter(rnd, filter_pool)
            filters.append(fexpr)
            body.append(ftext)

        query = ("SELECT * WHERE { GRAPH ?g { "
                 + " ".join(body) + " } }")

        # deterministic scope-leak check, independent of which later
        # elements a seed draws: the BARE base BGP under GRAPH ?g
        # must contain NO default-graph row (kills the dropped-
        # isNotNull mutation on every single-pattern seed)
        bare = ("SELECT * WHERE { GRAPH ?g { "
                + " ".join(_pat_text(p) for p in base) + " } }")
        bare_rows = sparql_select(df, bare).collect()
        assert all(r.g is not None for r in bare_rows), (
            f"seed {seed}: default-graph rows leaked into GRAPH ?g"
        )
        bare_want = sum(
            len(_eval_group_py(ts, ([("bgp", base)], [])))
            for ts in by_graph.values()
        )
        assert len(bare_rows) == bare_want, (
            f"seed {seed}: bare GRAPH ?g row count {len(bare_rows)} "
            f"!= per-graph oracle {bare_want}"
        )

        # §18.6 oracle: per-graph evaluation, ?g extension, union
        expected = []
        for g, ts in by_graph.items():
            for row in _eval_group_py(ts, (elements, filters)):
                expected.append({**row, "g": f"<{g}>"})

        got_df = sparql_select(df, query)
        all_vars = sorted(
            set(got_df.columns).union(*(set(r) for r in expected))
            if expected
            else set(got_df.columns)
        )
        assert "g" in all_vars
        nones_last = lambda t: tuple((x is None, x or "") for x in t)  # noqa: E731
        got = sorted(
            (
                tuple(getattr(r, v) if v in got_df.columns else None
                      for v in all_vars)
                for r in got_df.collect()
            ),
            key=nones_last,
        )
        want = sorted(
            (tuple(r.get(v) for v in all_vars) for r in expected),
            key=nones_last,
        )
        assert got == want, (
            f"seed {seed}: query {query!r}\n got {got[:6]}\nwant {want[:6]}"
        )
        total_rows += len(want)
        graphs_seen |= {r["g"] for r in expected}
    assert total_rows > 20, f"generator vacuous: {total_rows} rows total"
    assert len(graphs_seen) == 3, f"graph coverage thin: {graphs_seen}"


def test_sparql_datetime_fns_match_python_oracle(spark):
    """Randomized pinning of the round-5c dateTime accessors: the
    GENERATOR knows the ground-truth field values (it assembles the
    lexical from random components), so the oracle is independent of
    the engine's regexp extraction — a mutated pattern or off-by-one
    group index flips expected projections. Covers the three timezone
    shapes, fractional seconds, pre-1000 years (leading-zero
    stripping), and structurally-invalid literals (error -> unbound,
    TZ -> "")."""
    XSD_DT = "http://www.w3.org/2001/XMLSchema#dateTime"
    DUR = "^^<http://www.w3.org/2001/XMLSchema#dayTimeDuration>"

    def tz_expect(tzc):
        if tzc == "":
            return '""', None
        if tzc in ("Z", "+00:00", "-00:00"):
            return f'"{tzc}"', '"PT0S"' + DUR
        sign = "-" if tzc[0] == "-" else ""
        hh, mm = int(tzc[1:3]), int(tzc[4:6])
        body = (f"{hh}H" if hh else "") + (f"{mm}M" if mm else "")
        return f'"{tzc}"', f'"{sign}PT{body}"' + DUR

    for seed in range(5 * _SCALE):
        rnd = random.Random(7000 + seed)
        triples, want = [], {}
        for i in range(rnd.randint(4, 12)):
            subj = f"http://e/d{i}"
            if rnd.random() < 0.2:
                lexical = rnd.choice(
                    ["not a date", "2020-1-2T3:4:5", "T12:00:00", ""]
                )
                # every accessor — TZ included — is a §17.4.5.9 type
                # error (unbound) on a non-dateTime operand (round 6:
                # TZ previously returned "" here, a documented
                # divergence now fixed)
                want[f"<{subj}>"] = (None,) * 7
            else:
                y = rnd.randint(1, 2500)
                mo, d = rnd.randint(1, 12), rnd.randint(1, 28)
                h, mi, sec = (rnd.randint(0, 23), rnd.randint(0, 59),
                              rnd.randint(0, 59))
                frac = rnd.choice(["", "", ".5", ".25"])
                tzc = rnd.choice(["Z", "+05:30", "-03:00", "+00:00", ""])
                lexical = (f"{y:04d}-{mo:02d}-{d:02d}"
                           f"T{h:02d}:{mi:02d}:{sec:02d}{frac}{tzc}")
                tz_nt, dur_nt = tz_expect(tzc)
                want[f"<{subj}>"] = (
                    f'"{y}"', f'"{mo}"', f'"{d}"', f'"{h}"',
                    f'"{sec}{frac}"', tz_nt, dur_nt,
                )
            triples.append(TripleT(
                iri(subj), iri("http://e/ts"), literal(lexical, dt=XSD_DT)
            ))
        df = TripleGraph.of(spark, triples).df
        out = sparql_select(
            df,
            """SELECT ?s ?y ?mo ?d ?h ?sec ?tz ?dur WHERE {
                 ?s <http://e/ts> ?t .
                 BIND(YEAR(?t) AS ?y) BIND(MONTH(?t) AS ?mo)
                 BIND(DAY(?t) AS ?d) BIND(HOURS(?t) AS ?h)
                 BIND(SECONDS(?t) AS ?sec)
                 BIND(TZ(?t) AS ?tz) BIND(TIMEZONE(?t) AS ?dur)
               }""",
        )
        got = {r.s: (r.y, r.mo, r.d, r.h, r.sec, r.tz, r.dur)
               for r in out.collect()}
        assert got == want, f"seed {seed}"
        # FILTER path: numeric comparison on an accessor must agree
        # with the ground-truth component values
        kept = sorted(
            s for s, v in want.items()
            if v[3] is not None and int(v[3].strip('"')) >= 12
        )
        out2 = sparql_select(
            df,
            """SELECT ?s WHERE { ?s <http://e/ts> ?t .
                 FILTER(HOURS(?t) >= 12) }""",
        )
        assert sorted(r.s for r in out2.collect()) == kept, f"seed {seed}"
