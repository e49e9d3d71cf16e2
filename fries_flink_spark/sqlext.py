"""Flink-SQL extension surface over Spark SQL (SURVEY §3.1 / VERDICT "What's
missing" #3): the three grammar extensions the reference's parser adds beyond
ANSI — window TVFs, ``FOR SYSTEM_TIME AS OF`` temporal joins, and
``MATCH_RECOGNIZE`` — accepted as SQL strings and lowered onto this repo's
operators.

Reference grammar: flink-table/flink-sql-parser/src/main/codegen/includes/
parserImpls.ftl:518 (MATCH_RECOGNIZE / temporal table syntax),
FlinkSqlOperatorTable.java:1181-1183 (TUMBLE/HOP/CUMULATE window TVFs),
StreamExecMatch.java + MatchCodeGenerator.scala (MATCH_RECOGNIZE lowering),
StreamExecTemporalJoin.java (FOR SYSTEM_TIME AS OF lowering).

Spark-first design: everything that IS ANSI rides ``spark.sql`` untouched —
Catalyst parses, optimizes, and codegens it. Only the three extensions are
recognized (by a light tokenizing pass, not a full SQL grammar), rewritten
into DataFrame plans built from ``operators/`` (cep.match_pattern,
joins.asof_join, window assignment), registered as temp views, and spliced
back into the remaining ANSI query — so projections, aggregations, and ORDER
BY around the extension still execute fully inside Catalyst.

Scale notes:
- Window TVFs: TUMBLE/HOP lower to the native ``window()`` expression
  (codegen; HOP replicates rows size/slide× — for heavy sliding aggs prefer
  ``operators.windows.hop_agg_sliced`` which replicates only per-slice
  partials). CUMULATE lowers to an explode over ≤ max/step window-ends;
  SESSION to the lag/cumsum sessionization (one shuffle on the partition
  keys, fully codegen).
- Temporal join: lowers to ``asof_join``'s union + last_value window — one
  shuffle on the key, no pairwise explosion.
- MATCH_RECOGNIZE: lowers to the vectorized NFA in ``operators/cep.py`` —
  one shuffle on PARTITION BY, per-key linear sweeps, per-stage predicates
  evaluated once per Arrow batch as numpy masks.

Supported subset (documented, enforced with clear errors): single TVF /
single temporal join / single MATCH_RECOGNIZE per query. DEFINE conditions
may reference the current variable, physical predecessors via
``PREV(V.col [, n])`` (vectorized as a batch shift — the price<PREV(price)
idiom stays on the mask hot path), and other pattern variables via
``LAST(X.col [, n])`` / ``FIRST(X.col [, n])`` / bare ``X.col`` (= LAST),
which compile to exact match-state tests threaded through the NFA walk.
Measures: FIRST/LAST/bare column, COUNT/SUM/AVG/MIN/MAX over a column OR
an arithmetic expression of one variable's columns (SUM(A.p * A.q)),
scalar arithmetic over navigation calls (LAST(A.p) - FIRST(A.p)),
CLASSIFIER().
Output modes: ONE ROW PER MATCH (default) and ALL ROWS PER MATCH (running
measure semantics). AFTER MATCH SKIP PAST LAST ROW | TO NEXT ROW | NO SKIP.
Measures also: MATCH_NUMBER() (1-based per-partition match index).
Parity note: the reference's blink planner THROWS on any non-zero physical
offset ("Flink does not support physical offsets within partition",
MatchCodeGenerator.scala:334-343), so this repo's PREV(col, n) with
arbitrary n exceeds the reference; NEXT(x, 0) is the identity there and
needs no special form here.
RUNNING/FINAL measure qualifiers are supported (RUNNING is the all-rows
default; FINAL evaluates over the complete match on every row); SUBSET
union variables resolve in MEASURES and in DEFINE conditions (member rows
merged in row order, running semantics include the candidate row when a
member is the current variable); aggregate calls compose in arithmetic —
``SUM(A.p) + SUM(A.q)`` in MEASURES, ``SUM(A.p) < B.q`` in DEFINE
(reference MatchCodeGenerator aggregate calls).
Still unsupported (raise): PREV over another variable (reference rejects it
too), permute/alternation pattern syntax.
"""

from __future__ import annotations

import re
from datetime import timedelta

import numpy as np

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .operators.cep import (
    NO_SKIP,
    SKIP_PAST_LAST_EVENT,
    SKIP_TO_FIRST,
    SKIP_TO_LAST,
    SKIP_TO_NEXT,
    Pattern,
    match_pattern,
)
from .operators.joins import asof_join

__all__ = ["sql"]

_VIEW_SEQ = [0]


def _fresh_view(prefix: str) -> str:
    _VIEW_SEQ[0] += 1
    return f"__{prefix}_{_VIEW_SEQ[0]}"


# --------------------------------------------------------------------------- #
# Interval literals
# --------------------------------------------------------------------------- #

_UNIT_SECONDS = {
    "SECOND": 1,
    "SECONDS": 1,
    "MINUTE": 60,
    "MINUTES": 60,
    "HOUR": 3600,
    "HOURS": 3600,
    "DAY": 86400,
    "DAYS": 86400,
}

_INTERVAL_RE = re.compile(r"INTERVAL\s+'(\d+)'\s+(\w+)", re.IGNORECASE)


def _interval_seconds(text: str) -> int:
    m = _INTERVAL_RE.search(text)
    if not m:
        raise ValueError(f"unsupported interval literal: {text!r}")
    unit = m.group(2).upper()
    if unit not in _UNIT_SECONDS:
        raise ValueError(f"unsupported interval unit: {unit}")
    return int(m.group(1)) * _UNIT_SECONDS[unit]


# --------------------------------------------------------------------------- #
# Window TVFs: TABLE(TUMBLE|HOP|CUMULATE|SESSION(...))
# --------------------------------------------------------------------------- #

_TVF_RE = re.compile(
    r"TABLE\s*\(\s*(TUMBLE|HOP|CUMULATE|SESSION)\s*\((.*?)\)\s*\)",
    re.IGNORECASE | re.DOTALL,
)


def _split_args(argstr: str) -> list[str]:
    """Split on top-level commas (DESCRIPTOR(...) nests one paren level)."""
    out, depth, cur = [], 0, []
    for ch in argstr:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return out


def _ts_typed(df: DataFrame, ts: str, col):
    """Cast an epoch-seconds column back to the input ts column's type."""
    target = dict(df.dtypes)[ts]
    return F.timestamp_seconds(col).cast(target)


def _window_tvf_df(spark: SparkSession, kind: str, argstr: str) -> DataFrame:
    args = _split_args(argstr)
    m = re.match(
        r"TABLE\s+(\w+)(?:\s+PARTITION\s+BY\s+([\w\s,]+?))?\s*$",
        args[0],
        re.IGNORECASE,
    )
    if not m:
        raise ValueError(f"window TVF: cannot parse table argument {args[0]!r}")
    table, part = m.group(1), m.group(2)
    dm = re.match(r"DESCRIPTOR\s*\(\s*(\w+)\s*\)", args[1], re.IGNORECASE)
    if not dm:
        raise ValueError(f"window TVF: cannot parse descriptor {args[1]!r}")
    ts = dm.group(1)
    df = spark.table(table)
    kind = kind.upper()

    if kind == "TUMBLE":
        size = _interval_seconds(args[2])
        w = F.window(F.col(ts), f"{size} seconds")
    elif kind == "HOP":
        # Flink arg order: slide, then size (FlinkSqlOperatorTable HOP).
        slide = _interval_seconds(args[2])
        size = _interval_seconds(args[3])
        w = F.window(F.col(ts), f"{size} seconds", f"{slide} seconds")
    elif kind == "CUMULATE":
        step = _interval_seconds(args[2])
        max_size = _interval_seconds(args[3])
        if max_size % step:
            raise ValueError("CUMULATE: max_size must be a multiple of step")
        epoch = F.unix_timestamp(F.col(ts))
        w_start = F.floor(epoch / max_size) * max_size
        first_end = w_start + (F.floor((epoch - w_start) / step) + 1) * step
        out = df.withColumn(
            "__we",
            F.explode(F.sequence(first_end, w_start + F.lit(max_size), F.lit(step))),
        )
        return out.select(
            "*",
            _ts_typed(df, ts, w_start).alias("window_start"),
            _ts_typed(df, ts, F.col("__we")).alias("window_end"),
        ).drop("__we")
    elif kind == "SESSION":
        if not part:
            raise ValueError("SESSION TVF requires PARTITION BY (Flink grammar)")
        keys = [k.strip() for k in part.split(",")]
        target = dict(df.dtypes)[ts]
        wk = Window.partitionBy(*keys).orderBy(F.col(ts))
        # Microsecond epoch, not unix_timestamp: second-truncation could merge
        # two sessions whose true gap is fractionally over the threshold.
        # unix_micros requires TIMESTAMP; cast covers TIMESTAMP_NTZ inputs
        # (round-trips through timestamp_micros().cast(target) below).
        us = F.unix_micros(F.col(ts).cast("timestamp"))
        prev = F.lag(us).over(wk)
        if re.match(r"\s*INTERVAL\b", args[2], re.IGNORECASE):
            # constant gap: session extends while distance <= gap
            gap_us = F.lit(_interval_seconds(args[2]) * 1_000_000)
            prev_gap = gap_us
        else:
            # DYNAMIC gap (reference DynamicEventTimeSessionWindows / the
            # Flink gap-extractor form of the SESSION TVF): the third arg is
            # a per-row SECONDS expression over the input columns; the gap
            # set by the PREVIOUS row decides how far its session extends.
            gap_us = (F.expr(args[2]) * 1_000_000).cast("long")
            prev_gap = F.lag(gap_us).over(wk)
        new_s = F.when(prev.isNull() | ((us - prev) > prev_gap), 1).otherwise(0)
        sid = F.sum(new_s).over(wk.rowsBetween(Window.unboundedPreceding, 0))
        ws = Window.partitionBy(*keys, "__sid")
        out = df.withColumn("__gap_us", gap_us).withColumn("__sid", sid)
        # session end = last event's ts + that event's gap (max struct picks
        # the latest row, then its gap rides along)
        last_row = F.max(F.struct(us.alias("u"), F.col("__gap_us").alias("g"))).over(ws)
        return out.select(
            "*",
            F.timestamp_micros(F.min(us).over(ws)).cast(target).alias(
                "window_start"
            ),
            F.timestamp_micros(last_row["u"] + last_row["g"]).cast(target).alias(
                "window_end"
            ),
        ).drop("__sid", "__gap_us")
    else:  # pragma: no cover
        raise ValueError(kind)

    return df.select(
        "*", w.start.alias("window_start"), w.end.alias("window_end")
    )


def _rewrite_window_tvfs(spark: SparkSession, q: str) -> str:
    def sub(m: re.Match) -> str:
        view = _fresh_view("wtvf")
        _window_tvf_df(spark, m.group(1), m.group(2)).createOrReplaceTempView(view)
        return view

    return _TVF_RE.sub(sub, q)


# --------------------------------------------------------------------------- #
# Temporal join: <probe> JOIN <build> FOR SYSTEM_TIME AS OF p.ts AS b ON ...
# --------------------------------------------------------------------------- #

_TEMPORAL_RE = re.compile(
    r"FROM\s+(\w+)\s+(?:AS\s+)?(\w+)\s+(LEFT\s+)?JOIN\s+(\w+)\s+"
    r"FOR\s+SYSTEM_TIME\s+AS\s+OF\s+(\w+)\.(\w+)\s+(?:AS\s+)?(\w+)\s+"
    r"ON\s+(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)",
    re.IGNORECASE,
)


def _rewrite_temporal_join(spark: SparkSession, q: str) -> str:
    m = _TEMPORAL_RE.search(q)
    if not m:
        return q
    (probe_t, probe_a, left_kw, build_t, asof_a, asof_col, build_a,
     l_al, l_col, r_al, r_col) = m.groups()
    if asof_a != probe_a:
        raise ValueError("FOR SYSTEM_TIME AS OF must reference the probe alias")
    if {l_al, r_al} != {probe_a, build_a}:
        raise ValueError("temporal join ON must equate probe and build aliases")
    probe_key = l_col if l_al == probe_a else r_col
    build_key = r_col if r_al == build_a else l_col

    probe = spark.table(probe_t)
    build = spark.table(build_t)
    if asof_col not in build.columns:
        raise ValueError(
            f"versioned table {build_t} needs a {asof_col!r} column (its "
            "event-time attribute must match the AS OF column name)"
        )
    if build_key != probe_key:
        build = build.withColumnRenamed(build_key, probe_key)
    payload = [
        c for c in build.columns if c not in probe.columns and c != probe_key
    ]
    if not payload:
        raise ValueError("temporal join: build side has no non-clashing columns")
    joined = asof_join(
        probe,
        build,
        on=probe_key,
        left_time=asof_col,
        right_time=asof_col,
        right_payload=payload,
        how="left" if left_kw else "inner",
    )
    view = _fresh_view("temporal")
    joined.createOrReplaceTempView(view)
    q = q[: m.start()] + f"FROM {view}" + q[m.end():]
    # un-qualify the two aliases in the rest of the query
    q = re.sub(rf"\b{probe_a}\.", "", q)
    q = re.sub(rf"\b{build_a}\.", "", q)
    return q


# --------------------------------------------------------------------------- #
# MATCH_RECOGNIZE
# --------------------------------------------------------------------------- #

_COMPARE_OPS = [("<=", "le"), (">=", "ge"), ("<>", "ne"), ("!=", "ne"),
                ("=", "eq"), ("<", "lt"), (">", "gt")]

_TOKEN_RE = re.compile(
    r"\s*(?:('(?:[^']|'')*')|(\d+\.\d+|\d+)|([A-Za-z_][\w]*(?:\.[\w]+)?)"
    r"|(<=|>=|<>|!=|[=<>()+\-*/%,]))"
)


def _tokenize(s: str) -> list[str]:
    out, pos = [], 0
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if not m:
            if s[pos:].strip():
                raise ValueError(f"cannot tokenize {s[pos:]!r}")
            break
        out.append(next(g for g in m.groups() if g is not None))
        pos = m.end()
    return out


def _sql_mod(a, b):
    """SQL/Java remainder: sign of the DIVIDEND (Spark %, Flink MOD) —
    Python's % takes the divisor's sign, so the NFA evaluators must not use
    it or they would diverge from the windowed fast path on negatives."""
    import math

    r = math.fmod(a, b)
    if isinstance(a, int) and isinstance(b, int):
        return int(r)
    return r


class _CondParser:
    """Recursive-descent parser for DEFINE conditions → vectorized mask.

    Grammar: or_expr := and_expr (OR and_expr)* ; and_expr := unary (AND
    unary)* ; unary := NOT unary | '(' or_expr ')' | comparison ; comparison
    := operand op operand ; operand := term ((+|-|*|/) term)* ; term :=
    literal | VAR.col | col. Column refs may be qualified with the CURRENT
    pattern variable only (Flink's cross-variable refs raise)."""

    def __init__(self, tokens: list[str], var: str):
        self.toks = tokens
        self.i = 0
        self.var = var

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def take(self):
        t = self.peek()
        self.i += 1
        return t

    def parse(self):
        node = self.or_expr()
        if self.peek() is not None:
            raise ValueError(f"trailing tokens: {self.toks[self.i:]}")
        return node

    def or_expr(self):
        node = self.and_expr()
        while self.peek() and self.peek().upper() == "OR":
            self.take()
            rhs = self.and_expr()
            node = ("or", node, rhs)
        return node

    def and_expr(self):
        node = self.unary()
        while self.peek() and self.peek().upper() == "AND":
            self.take()
            rhs = self.unary()
            node = ("and", node, rhs)
        return node

    def unary(self):
        t = self.peek()
        if t and t.upper() == "NOT":
            self.take()
            return ("not", self.unary())
        if t == "(":
            save = self.i
            self.take()
            try:
                node = self.or_expr()
                if self.take() != ")":
                    raise ValueError("unbalanced parens")
                return node
            except ValueError:
                self.i = save  # arithmetic parens: re-parse as comparison
        return self.comparison()

    def comparison(self):
        lhs = self.operand()
        op = self.take()
        negate = False
        if op is not None and op.upper() == "NOT":
            negate = True
            op = self.take()
        if op is not None and op.upper() == "BETWEEN":
            lo = self.operand()
            if (self.take() or "").upper() != "AND":
                raise ValueError("BETWEEN requires AND")
            hi = self.operand()
            node = ("and", ("cmp", "ge", lhs, lo), ("cmp", "le", lhs, hi))
            return ("not", node) if negate else node
        if op is not None and op.upper() == "IN":
            if self.take() != "(":
                raise ValueError("IN requires a parenthesized list")
            node = None
            while True:
                item = self.operand()
                eq = ("cmp", "eq", lhs, item)
                node = eq if node is None else ("or", node, eq)
                nxt = self.take()
                if nxt == ")":
                    break
                if nxt != ",":
                    raise ValueError(f"IN list: expected ',' or ')', got {nxt!r}")
            return ("not", node) if negate else node
        if negate:
            raise ValueError(f"expected BETWEEN or IN after NOT, got {op!r}")
        names = dict(_COMPARE_OPS)
        if op not in names:
            raise ValueError(f"expected comparison operator, got {op!r}")
        rhs = self.operand()
        return ("cmp", names[op], lhs, rhs)

    def operand(self):
        node = self.term()
        while self.peek() in ("+", "-", "*", "/", "%"):
            op = self.take()
            node = ("arith", op, node, self.term())
        return node

    def term(self):
        t = self.take()
        if t is None:
            raise ValueError("unexpected end of condition")
        if t == "(":
            node = self.operand()
            if self.take() != ")":
                raise ValueError("unbalanced parens in arithmetic")
            return node
        if t.startswith("'"):
            return ("lit", t[1:-1].replace("''", "'"))
        if re.fullmatch(r"\d+\.\d+", t):
            return ("lit", float(t))
        if re.fullmatch(r"\d+", t):
            return ("lit", int(t))
        if t.upper() in ("PREV", "FIRST", "LAST") and self.peek() == "(":
            return self._navigation(t.upper())
        if t.upper() in ("SUM", "AVG", "MIN", "MAX", "COUNT") and self.peek() == "(":
            return self._aggregate(t.upper())
        if "." in t:
            var, col = t.split(".", 1)
            if var.upper() == self.var.upper():
                return ("col", col)
            # cross-variable reference: value of the LAST row mapped to that
            # variable so far (Flink MatchCodeGenerator resolves bare
            # other-variable refs to LAST(var.col, 0))
            return ("nav", "LAST", var, col, 0)
        if t.upper() in ("TRUE", "FALSE"):
            return ("lit", t.upper() == "TRUE")
        return ("col", t)

    def _navigation(self, fname: str):
        """PREV(A.col [, n]) — physical predecessor row (offset n, default 1);
        FIRST/LAST(V.col [, n]) — n-th row mapped to pattern variable V
        (reference MatchCodeGenerator.scala navigation calls)."""
        self.take()  # '('
        ref = self.take()
        if ref is None or ref.startswith("'"):
            raise ValueError(f"{fname}() needs a column reference")
        if "." in ref:
            var, col = ref.split(".", 1)
        else:
            var, col = self.var, ref
        offset = 1 if fname == "PREV" else 0
        if self.peek() == ",":
            self.take()
            off_t = self.take()
            if not re.fullmatch(r"\d+", off_t or ""):
                raise ValueError(f"{fname}() offset must be an integer literal")
            offset = int(off_t)
        if self.take() != ")":
            raise ValueError(f"unbalanced parens in {fname}()")
        if fname == "PREV":
            if var.upper() != self.var.upper():
                raise NotImplementedError(
                    f"PREV over another pattern variable ({var}) is not "
                    "supported (same restriction as the reference)"
                )
            return ("prev", col, offset)
        return ("nav", fname, var, col, offset)

    def _aggregate(self, fname: str):
        """Aggregate call — ``SUM/AVG/MIN/MAX/COUNT(<arith over Var.cols>)``
        — over the rows mapped to Var (or a SUBSET union variable) so far:
        SQL:2016 running-aggregate semantics, reference MatchCodeGenerator
        aggregate calls. Valid both in DEFINE conditions and (via
        _parse_full_operand) inside MEASURES arithmetic, which is what makes
        ``SUM(A.p) + SUM(A.q)`` a plain expression tree."""
        self.take()  # '('
        inner = self.operand()
        if self.take() != ")":
            raise ValueError(f"unbalanced parens in {fname}()")

        vars_: set[str] = set()

        def walk(node):
            if not isinstance(node, tuple):
                return
            kind = node[0]
            if kind == "nav":
                if node[1] != "LAST" or node[4] != 0:
                    raise ValueError(
                        f"{fname}() operand: FIRST()/offset navigation "
                        "inside an aggregate would read the wrong row"
                    )
                vars_.add(node[2].upper())
            elif kind == "col":
                vars_.add(self.var.upper())  # bare ref == current variable
            elif kind == "prev":
                raise ValueError(f"PREV() is not valid inside {fname}()")
            for c in node[1:]:
                if isinstance(c, tuple):
                    walk(c)

        walk(inner)
        if "\0" in vars_:
            raise ValueError(
                f"{fname}() operand must qualify its pattern variable "
                "(e.g. SUM(A.price))"
            )
        if len(vars_) != 1:
            raise ValueError(
                f"{fname}() operand must reference exactly one pattern "
                f"variable, got {sorted(vars_)}"
            )
        return ("agg", fname, next(iter(vars_)), inner)


def _eval_node(node, pdf):
    kind = node[0]
    if kind == "lit":
        return node[1]
    if kind == "col":
        return pdf[node[1]]
    if kind == "col_np":  # pre-bound numpy column (internal)
        return node[1]
    if kind == "prev":  # physical predecessor: vectorized shift
        _, col, off = node
        return pdf[col].shift(off)
    if kind == "arith":
        _, op, a, b = node
        a, b = _eval_node(a, pdf), _eval_node(b, pdf)
        return {"+": lambda: a + b, "-": lambda: a - b,
                "*": lambda: a * b, "/": lambda: a / b,
                "%": lambda: np.fmod(a, b)}[op]()
    if kind == "cmp":
        _, op, a, b = node
        a, b = _eval_node(a, pdf), _eval_node(b, pdf)
        import operator as _op
        res = getattr(_op, op)(a, b)
        # SQL three-valued logic: NULL (NaN/NaT from shift or the data) in
        # either operand makes the comparison unknown -> False (matters for
        # '<>' where pandas would yield True against NaN)
        res = np.asarray(res)
        import pandas as _pd
        for s in (a, b):
            if isinstance(s, _pd.Series):
                res = res & s.notna().to_numpy()
        return res
    if kind == "and":
        return np.asarray(_eval_node(node[1], pdf)) & np.asarray(
            _eval_node(node[2], pdf)
        )
    if kind == "or":
        return np.asarray(_eval_node(node[1], pdf)) | np.asarray(
            _eval_node(node[2], pdf)
        )
    if kind == "not":
        return ~np.asarray(_eval_node(node[1], pdf))
    raise ValueError(kind)


def _has_nav(node) -> bool:
    """Does the AST reference match state (FIRST/LAST/cross-variable or a
    running aggregate)?"""
    if not isinstance(node, tuple):
        return False
    if node[0] in ("nav", "agg"):
        return True
    return any(_has_nav(c) for c in node[1:] if isinstance(c, tuple))


def _running_seq(bound, v, var, i, subsets):
    """Mapped row indices for variable (or SUBSET union) ``v`` under running
    semantics: the candidate row ``i`` is tentatively included when ``v`` is
    the current variable or a subset containing it. Indices are partition
    positions, so sorting restores row order across merged members."""
    members = subsets.get(v.upper()) if subsets else None
    if members is None:
        seq = list(_bound_lookup(bound, v))
        if v.upper() == var.upper():
            seq.append(i)
        return seq
    seq = [j for mv in members for j in _bound_lookup(bound, mv)]
    if any(mv.upper() == var.upper() for mv in members):
        seq.append(i)
    return sorted(seq)


def _eval_rowidx(node, cols, j):
    """Per-row evaluation of an aggregate operand at partition index ``j``:
    every column ref (bare or LAST(V.col, 0)) resolves to that row."""
    kind = node[0]
    if kind == "lit":
        return node[1]
    if kind == "col":
        return cols[node[1]][j]
    if kind == "nav":
        return cols[node[3]][j]
    if kind == "arith":
        _, op, a, b = node
        a = _eval_rowidx(a, cols, j)
        b = _eval_rowidx(b, cols, j)
        if a is None or b is None:
            return None
        return {"+": lambda: a + b, "-": lambda: a - b,
                "*": lambda: a * b, "/": lambda: a / b,
                "%": lambda: _sql_mod(a, b)}[op]()
    raise ValueError(kind)


def _eval_scalar(node, cols, i, bound, var, subsets=None):
    """Scalar evaluation at row ``i`` given match state ``bound`` (stage name
    -> mapped indices so far, candidate row excluded). None = SQL NULL."""
    kind = node[0]
    if kind == "lit":
        return node[1]
    if kind == "col":
        return cols[node[1]][i]
    if kind == "prev":
        _, col, off = node
        return cols[col][i - off] if i - off >= 0 else None
    if kind == "nav":
        _, fname, v, col, off = node
        # running semantics: the candidate row is tentatively mapped to the
        # current variable, so LAST(V.col, 0) == current row; SUBSET unions
        # merge their members' mapped rows in row order
        seq = _running_seq(bound, v, var, i, subsets)
        j = len(seq) - 1 - off if fname == "LAST" else off
        return cols[col][seq[j]] if 0 <= j < len(seq) else None
    if kind == "agg":
        _, func, v, inner = node
        seq = _running_seq(bound, v, var, i, subsets)
        return _agg_over(func, [_eval_rowidx(inner, cols, j) for j in seq])
    if kind == "arith":
        _, op, a, b = node
        a = _eval_scalar(a, cols, i, bound, var, subsets)
        b = _eval_scalar(b, cols, i, bound, var, subsets)
        if a is None or b is None:
            return None
        return {"+": lambda: a + b, "-": lambda: a - b,
                "*": lambda: a * b, "/": lambda: a / b,
                "%": lambda: _sql_mod(a, b)}[op]()
    if kind == "cmp":
        _, op, a, b = node
        a = _eval_scalar(a, cols, i, bound, var, subsets)
        b = _eval_scalar(b, cols, i, bound, var, subsets)
        if a is None or b is None or (isinstance(a, float) and a != a) or (
            isinstance(b, float) and b != b
        ):
            return False
        import operator as _op
        return bool(getattr(_op, op)(a, b))
    if kind == "and":
        return bool(_eval_scalar(node[1], cols, i, bound, var, subsets)) and bool(
            _eval_scalar(node[2], cols, i, bound, var, subsets)
        )
    if kind == "or":
        return bool(_eval_scalar(node[1], cols, i, bound, var, subsets)) or bool(
            _eval_scalar(node[2], cols, i, bound, var, subsets)
        )
    if kind == "not":
        return not bool(_eval_scalar(node[1], cols, i, bound, var, subsets))
    raise ValueError(kind)


def _bound_lookup(bound, v):
    if v in bound:
        return bound[v]
    for k, idxs in bound.items():  # case-insensitive fallback
        if k.upper() == v.upper():
            return idxs
    return ()


def _compile_condition(cond_sql: str, var: str, subsets=None):
    """Compile a DEFINE condition. Returns ('mask', pdf -> bool array) when
    the condition is match-state-free (current-variable cols, PREV shifts) —
    the fully vectorized hot path — or ('ctx', factory) when it references
    other pattern variables (FIRST/LAST/cross-var, SUBSET unions, running
    aggregates), where ``factory(pdf)`` yields the exact per-candidate test
    ``(i, bound) -> bool``."""
    ast = _CondParser(_tokenize(cond_sql), var).parse()
    if _has_nav(ast):
        def factory(pdf, _ast=ast, _var=var, _subsets=subsets):
            cols = {c: pdf[c].to_numpy() for c in pdf.columns}
            return lambda i, bound: bool(
                _eval_scalar(_ast, cols, i, bound, _var, _subsets)
            )
        return ("ctx", factory)
    return ("mask", lambda pdf: np.asarray(_eval_node(ast, pdf)).astype(bool))


_PATTERN_TOKEN_RE = re.compile(r"(\w+)(\+|\*|\?|\{\s*\d+\s*(?:,\s*\d*\s*)?\})?")

_MAX_REPEAT = 64  # bounded Kleene, same guard as Pattern.one_or_more


def _parse_pattern(
    pattern_sql: str, defines: dict[str, str], subsets=None
) -> Pattern:
    toks = [
        (m.group(1), m.group(2))
        for m in _PATTERN_TOKEN_RE.finditer(pattern_sql)
        if m.group(1)
    ]
    if not toks:
        raise ValueError(f"empty PATTERN: {pattern_sql!r}")
    pat: Pattern | None = None
    for var, quant in toks:
        if pat is None:
            pat = Pattern.begin(var)
        else:
            pat = pat.next(var)  # MATCH_RECOGNIZE concatenation is strict
        if var in defines:
            kind, fn = _compile_condition(defines[var], var, subsets)
            pat = pat.where_mask(fn) if kind == "mask" else pat.where_ctx(fn)
        # SQL-standard quantifiers are GREEDY by default (the reference's
        # MatchRecognizeITCase greedy cases); exact {n} needs no preference
        if quant == "+":
            pat = pat.one_or_more(_MAX_REPEAT).greedy()
        elif quant == "*":
            pat = pat.one_or_more(_MAX_REPEAT).optional().greedy()
        elif quant == "?":
            pat = pat.optional()
        elif quant and quant.startswith("{"):
            nums = re.findall(r"\d+", quant)
            if "," in quant:
                hi = int(nums[1]) if len(nums) > 1 else _MAX_REPEAT
                pat = pat.times(int(nums[0]), hi).greedy()
            else:
                pat = pat.times(int(nums[0]))
    return pat


_MEASURE_RE = re.compile(
    r"^(?:(FIRST|LAST|COUNT|SUM|AVG|MIN|MAX)\s*\(\s*)?"
    r"(\w+)\.(\w+|\*)\s*\)?\s+AS\s+(\w+)$",
    re.IGNORECASE,
)


_CLASSIFIER_RE = re.compile(
    r"^CLASSIFIER\s*\(\s*\)\s+AS\s+(\w+)$", re.IGNORECASE
)

_MATCH_NUMBER_RE = re.compile(
    r"^MATCH_NUMBER\s*\(\s*\)\s+AS\s+(\w+)$", re.IGNORECASE
)


_AGG_EXPR_RE = re.compile(
    r"^(COUNT|SUM|AVG|MIN|MAX)\s*\((.*)\)\s+AS\s+(\w+)$",
    re.IGNORECASE | re.DOTALL,
)
_AS_TAIL_RE = re.compile(r"^(.*?)\s+AS\s+(\w+)$", re.IGNORECASE | re.DOTALL)


def _parse_full_operand(text: str, var: str = "\0"):
    """Parse ``text`` as one arithmetic operand and require every token to
    be consumed — otherwise ``SUM(A.p) * 2`` would silently evaluate as
    ``SUM(A.p)`` (operand() stops at the first token it cannot extend)."""
    p = _CondParser(_tokenize(text), var)
    ast = p.operand()
    if p.peek() is not None:
        raise ValueError(
            f"trailing tokens in measure expression: {p.toks[p.i:]}"
        )
    return ast


def _aggexpr_per_row_ok(node) -> bool:
    """An aggregate operand is evaluated per mapped row, so the only legal
    navigation is the implicit current-row ref (bare ``V.col`` == LAST(V.col,
    0)); FIRST()/offset navigation inside an aggregate would silently read
    the wrong row — reject it at parse time."""
    if not isinstance(node, tuple):
        return True
    if node[0] == "nav":
        return node[1] == "LAST" and node[4] == 0
    if node[0] in ("col", "prev"):
        return False
    return all(_aggexpr_per_row_ok(c) for c in node[1:] if isinstance(c, tuple))


def _expr_vars(node, acc: set) -> None:
    if not isinstance(node, tuple):
        return
    if node[0] == "nav":
        acc.add(node[2].upper())
    for c in node[1:]:
        if isinstance(c, tuple):
            _expr_vars(c, acc)


def _parse_measures(measures_sql: str) -> list[tuple]:
    """Each measure → one of:

    - ``(func, var, col, out_name)`` — the simple forms (func '' = first-row
      ref, CLASSIFIER, MATCH_NUMBER)
    - ``("AGGEXPR:<func>", var, ast, out_name)`` — an aggregate over an
      ARITHMETIC expression of the variable's columns, e.g.
      ``SUM(A.price * A.qty)`` (reference MatchCodeGenerator generates
      arbitrary aggregate-call operands)
    - ``("EXPR", "", ast, out_name)`` — a scalar expression over navigation
      calls, e.g. ``LAST(A.price) - FIRST(A.price)``
    """
    out = []
    for item in _split_args(measures_sql):
        item = item.strip()
        final = False
        fm = re.match(r"^(RUNNING|FINAL)\s+(.*)$", item, re.IGNORECASE | re.DOTALL)
        if fm:
            final = fm.group(1).upper() == "FINAL"
            item = fm.group(2).strip()
        def _fin(func: str) -> str:
            if not final:
                return func
            if func in ("CLASSIFIER", "MATCH_NUMBER"):
                raise NotImplementedError(f"FINAL {func}() is not valid")
            return f"FINAL:{func}"

        cm = _CLASSIFIER_RE.match(item)
        if cm:
            _fin("CLASSIFIER")  # raises under FINAL
            out.append(("CLASSIFIER", "", "", cm.group(1)))
            continue
        nm = _MATCH_NUMBER_RE.match(item)
        if nm:
            _fin("MATCH_NUMBER")  # raises under FINAL
            out.append(("MATCH_NUMBER", "", "", nm.group(1)))
            continue
        m = _MEASURE_RE.match(item)
        if m:
            out.append(
                (_fin((m.group(1) or "").upper()), m.group(2), m.group(3), m.group(4))
            )
            continue
        # General forms: FUNC(<arith over Var.cols>) AS name, or
        # <arith over FIRST/LAST navigations> AS name.
        am = _AGG_EXPR_RE.match(item)
        if am:
            func, inner, name = am.group(1).upper(), am.group(2), am.group(3)
            ast = None
            try:
                ast = _parse_full_operand(inner)
            except ValueError:
                pass  # e.g. SUM(A.p) + SUM(A.q): not a single aggregate call
            if ast is not None:
                vars_ = set()
                _expr_vars(ast, vars_)
                if len(vars_) == 1 and not _aggexpr_per_row_ok(ast):
                    raise NotImplementedError(
                        f"unsupported measure {item!r}: FIRST()/offset "
                        "navigation inside an aggregate operand"
                    )
                if len(vars_) == 1:
                    out.append(
                        (_fin(f"AGGEXPR:{func}"), next(iter(vars_)), ast, name)
                    )
                    continue
            # fall through: multi/zero-var aggregate operand → scalar EXPR try
        tm = _AS_TAIL_RE.match(item)
        if tm:
            try:
                ast = _parse_full_operand(tm.group(1))
                if _expr_nav_only(ast):
                    out.append((_fin("EXPR"), "", ast, tm.group(2)))
                    continue
            except (ValueError, NotImplementedError):
                pass
        raise NotImplementedError(
            f"unsupported measure {item!r} (supported: [FIRST|LAST|COUNT|"
            "SUM|AVG|MIN|MAX](Var.col) AS name, FUNC(<arith of Var.cols>) "
            "AS name, <arith of FIRST/LAST(Var.col)> AS name, Var.col AS "
            "name, CLASSIFIER() AS name, MATCH_NUMBER() AS name)"
        )
    return out


def _expr_nav_only(node) -> bool:
    """A scalar-EXPR measure may only combine literals, arithmetic,
    FIRST/LAST navigation and aggregate calls (whose operands were already
    validated per-row by the parser) — bare column refs (ambiguous variable)
    and PREV (physical offsets are meaningless post-match) are rejected at
    parse time."""
    if not isinstance(node, tuple):
        return True
    if node[0] in ("col", "prev"):
        return False
    if node[0] == "agg":
        return True
    return all(_expr_nav_only(c) for c in node[1:] if isinstance(c, tuple))


def _eval_measure_rows(node, rows_of):
    """Evaluate a measure AST against a match given ``rows_of(var) -> [row
    dicts]``. ``nav`` FIRST/LAST index into the variable's mapped rows; a
    bare ``col`` node carrying a dotted ref was already turned into nav by
    the parser (var '\\0' never matches a stage, so current-var shorthand is
    rejected at parse time → every column ref is explicit Var.col)."""
    kind = node[0]
    if kind == "lit":
        return node[1]
    if kind == "nav":
        _, fname, var, col, off = node
        rows = rows_of(var)
        j = off if fname == "FIRST" else len(rows) - 1 - off
        return rows[j][col] if 0 <= j < len(rows) else None
    if kind == "agg":
        _, func, var, inner = node
        return _agg_over(
            func, [_eval_row_expr(inner, r, var) for r in rows_of(var)]
        )
    if kind == "arith":
        _, op, a, b = node
        a = _eval_measure_rows(a, rows_of)
        b = _eval_measure_rows(b, rows_of)
        if a is None or b is None:
            return None
        return {"+": lambda: a + b, "-": lambda: a - b,
                "*": lambda: a * b, "/": lambda: a / b,
                "%": lambda: _sql_mod(a, b)}[op]()
    if kind == "prev":
        raise NotImplementedError("PREV() is not valid in MEASURES")
    raise NotImplementedError(f"measure node {kind!r}")


def _eval_row_expr(node, row: dict, var: str):
    """Per-row evaluation of an AGGEXPR operand: Var.col refs resolve against
    the single mapped row ``row``."""
    kind = node[0]
    if kind == "lit":
        return node[1]
    if kind == "nav":  # LAST(V.col, 0) == the row itself in per-row context
        return row[node[3]]
    if kind == "col":
        return row[node[1]]
    if kind == "arith":
        _, op, a, b = node
        a = _eval_row_expr(a, row, var)
        b = _eval_row_expr(b, row, var)
        if a is None or b is None:
            return None
        return {"+": lambda: a + b, "-": lambda: a - b,
                "*": lambda: a * b, "/": lambda: a / b,
                "%": lambda: _sql_mod(a, b)}[op]()
    raise NotImplementedError(f"aggregate operand node {kind!r}")


def _match_lookup(match: dict, var: str) -> list:
    if var in match:
        return match[var]
    for k, v in match.items():
        if k.upper() == var.upper():
            return v
    return []


def _as_double(func: str, v):
    if v is None or func == "COUNT":
        return v
    return float(v)


def _agg_over(func: str, vals: list):
    vals = [v for v in vals if v is not None]
    if func == "COUNT":
        return len(vals)
    if not vals:
        return None
    if func == "SUM":
        return sum(vals)
    if func == "AVG":
        return sum(vals) / len(vals)
    return {"MIN": min, "MAX": max}[func](vals)


def _measure_type(func: str, col_type: str) -> str:
    if func == "COUNT":
        return "bigint"
    if func == "AVG":
        return "double"
    if func == "SUM":
        return "double" if col_type in ("double", "float") else "bigint"
    return col_type


# --------------------------------------------------------------------------- #
# MATCH_RECOGNIZE vectorized fast path: single-variable contiguous runs.
#
# PATTERN (V+) / (V{n[,m]}) with a DEFINE that references only the current
# row and physical predecessors (PREV) is a gaps-and-islands query — the per-
# row flag is a lag() window expression and the NFA's greedy bounded-repeat +
# SKIP PAST LAST ROW semantics are exact integer chunking of each flag island.
# Lowering it to pure Spark SQL windows removes Python from the plan entirely
# (the ~8 µs/row NFA measure-evaluation ceiling documented in PERF.md);
# everything runs in Catalyst/WholeStageCodegen. The general NFA remains the
# fallback for multi-variable patterns, WITHIN, and match-state predicates.
# --------------------------------------------------------------------------- #


class _NotVectorizable(Exception):
    pass


_CMP_SQL = {"le": "<=", "ge": ">=", "ne": "<>", "eq": "=", "lt": "<", "gt": ">"}


def _ast_to_sql(node, lag_over: str) -> str:
    """DEFINE AST → Spark SQL expression text. Comparisons are wrapped in
    coalesce(…, FALSE) so NULL operands (lag() past the partition edge)
    behave exactly like the NFA's null-rejecting comparison — including
    under NOT. Raises _NotVectorizable on match-state navigation."""
    kind = node[0]
    if kind == "lit":
        v = node[1]
        if isinstance(v, bool):
            return "TRUE" if v else "FALSE"
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        return repr(v)
    if kind == "col":
        return f"`{node[1]}`"
    if kind == "prev":
        _, col, off = node
        return f"lag(`{col}`, {off}) OVER {lag_over}"
    if kind == "arith":
        _, op, a, b = node
        return f"({_ast_to_sql(a, lag_over)} {op} {_ast_to_sql(b, lag_over)})"
    if kind == "cmp":
        _, op, a, b = node
        return (
            f"coalesce({_ast_to_sql(a, lag_over)} {_CMP_SQL[op]} "
            f"{_ast_to_sql(b, lag_over)}, FALSE)"
        )
    if kind == "and":
        return f"({_ast_to_sql(node[1], lag_over)} AND {_ast_to_sql(node[2], lag_over)})"
    if kind == "or":
        return f"({_ast_to_sql(node[1], lag_over)} OR {_ast_to_sql(node[2], lag_over)})"
    if kind == "not":
        return f"(NOT {_ast_to_sql(node[1], lag_over)})"
    raise _NotVectorizable(kind)


def _quant_bounds(quant: str | None) -> tuple[int, int] | None:
    if quant is None:
        return (1, 1)
    if quant == "+":
        return (1, _MAX_REPEAT)
    if quant in ("*", "?"):
        return None  # optional: empty matches — NFA path
    nums = re.findall(r"\d+", quant)
    lo = int(nums[0])
    if lo == 0:
        return None  # zero-minimum: empty matches — NFA path
    if "," in quant:
        hi = int(nums[1]) if len(nums) > 1 else _MAX_REPEAT
        return (lo, hi)
    return (lo, lo)


def _try_single_var_runs(
    spark: SparkSession,
    table: str,
    key_cols: list[str],
    order_cols: list[str],
    pattern_sql: str,
    defines: dict[str, str],
    measures: list[tuple[str, str, str, str]],
    after: str | None,
    rows_mode: str,
    has_within: bool,
) -> DataFrame | None:
    """Build the windowed-SQL plan for the single-variable-run subset, or
    None when the query needs the general NFA."""
    if has_within:
        return None
    if after and "SKIP PAST LAST ROW" not in re.sub(r"\s+", " ", after.upper()):
        return None
    toks = [
        (m.group(1), m.group(2))
        for m in _PATTERN_TOKEN_RE.finditer(pattern_sql)
        if m.group(1)
    ]
    if len(toks) != 1:
        return None
    var, quant = toks[0]
    bounds = _quant_bounds(quant)
    if bounds is None:
        return None
    lo, hi = bounds
    if var not in defines:
        return None
    if rows_mode == "one":
        # ONE ROW PER MATCH: FINAL == default semantics — strip the
        # qualifier so such queries keep the fully vectorized plan
        measures = [
            (f[6:] if f.startswith("FINAL:") else f, v, c, n)
            for f, v, c, n in measures
        ]
    for f, v, _c, _n in measures:
        if f in ("CLASSIFIER", "MATCH_NUMBER"):
            continue
        if f not in ("", "FIRST", "LAST", "COUNT", "SUM", "AVG", "MIN", "MAX"):
            return None  # expression / FINAL-qualified measures: NFA path
        if v.upper() != var.upper():
            return None
    keys = ", ".join(f"`{k}`" for k in key_cols)
    order = ", ".join(f"`{c}`" for c in order_cols)
    lag_over = f"(PARTITION BY {keys} ORDER BY {order})"
    try:
        ast = _CondParser(_tokenize(defines[var]), var).parse()
        flag = _ast_to_sql(ast, lag_over)
    except (_NotVectorizable, ValueError, NotImplementedError):
        return None

    df = spark.table(table)
    types = dict(df.dtypes)
    in_cols = df.columns
    mw = f"(PARTITION BY {keys}, __isl, __chunk)"
    mw_run = (
        f"(PARTITION BY {keys}, __isl, __chunk ORDER BY __rn "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    )
    mw_full = (
        f"(PARTITION BY {keys}, __isl, __chunk ORDER BY __rn "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"
    )

    def measure_sql(func: str, col: str, running: bool) -> str:
        if func == "CLASSIFIER":
            return f"'{var}'"
        if func == "MATCH_NUMBER":
            return f"dense_rank() OVER (PARTITION BY {keys} ORDER BY __isl, __chunk)"
        if func == "COUNT":
            return "__mpos" if running else "__sz"
        frame = mw_run if running else mw_full
        if func == "FIRST":
            return f"first_value(`{col}`) OVER {frame}"
        if func == "LAST" or func == "":
            # running LAST == current row (every row is mapped)
            return f"`{col}`" if running else f"last_value(`{col}`) OVER {frame}"
        agg_frame = mw_run if running else mw
        return f"{func.lower()}(`{col}`) OVER {agg_frame}"

    def measure_cast(func: str, col: str, expr: str) -> str:
        col_t = "bigint" if col in ("", "*") else types[col]
        t = _measure_type(func, col_t) if func not in ("CLASSIFIER", "MATCH_NUMBER") else (
            "string" if func == "CLASSIFIER" else "bigint"
        )
        return f"CAST({expr} AS {t})"

    running = rows_mode == "all"
    meas_sel = ", ".join(
        f"{measure_cast(f, c, measure_sql(f, c, running))} AS `{n}`"
        for f, _v, c, n in measures
    )
    out_names = (
        [f"`{c}`" for c in in_cols] if running else [f"`{k}`" for k in key_cols]
    ) + [f"`{n}`" for _f, _v, _c, n in measures]
    pass_sel = (
        ", ".join(f"`{c}`" for c in in_cols)
        if running
        else keys
    )
    # Measures are window expressions and must be evaluated BEFORE the
    # one-row-per-match filter (a WHERE in the same block would filter the
    # window input down to the final rows).
    final_filter = "" if running else "WHERE __mpos = __sz"
    min_filter = f"WHERE __sz >= {lo}" if lo > 1 else ""
    # Chunk index, in-match position and match size all derive ARITHMETICALLY
    # from one in-island row_number + one island count — no third window
    # partition pass over (key, isl, chunk): pos-in-match = (pos-1) % hi + 1
    # and sz = least(hi, island - chunk*hi), since chunks tile each island.
    sql_text = f"""
WITH __f AS (
  SELECT *, {flag} AS __flag,
         row_number() OVER (PARTITION BY {keys} ORDER BY {order}) AS __rn
  FROM {table}
), __i AS (
  SELECT *, __rn - row_number() OVER (PARTITION BY {keys} ORDER BY __rn)
              AS __isl
  FROM __f WHERE __flag
), __c AS (
  SELECT *, row_number() OVER (PARTITION BY {keys}, __isl ORDER BY __rn)
              AS __pos,
         count(*) OVER (PARTITION BY {keys}, __isl) AS __icnt
  FROM __i
), __m AS (
  SELECT *, CAST((__pos - 1) div {hi} AS BIGINT) AS __chunk,
         CAST((__pos - 1) % {hi} + 1 AS BIGINT) AS __mpos,
         CAST(least({hi}, __icnt - ((__pos - 1) div {hi}) * {hi}) AS BIGINT)
           AS __sz
  FROM __c
), __v AS (SELECT * FROM __m {min_filter}),
__o AS (
  SELECT {pass_sel}, {meas_sel}, __mpos, __sz FROM __v
)
SELECT {', '.join(out_names)} FROM __o {final_filter}
"""
    return spark.sql(sql_text)


_MR_HEAD_RE = re.compile(r"(\w+)\s+MATCH_RECOGNIZE\s*\(", re.IGNORECASE)


def _find_balanced(q: str, open_idx: int) -> int:
    depth = 0
    for i in range(open_idx, len(q)):
        if q[i] == "(":
            depth += 1
        elif q[i] == ")":
            depth -= 1
            if depth == 0:
                return i
    raise ValueError("unbalanced MATCH_RECOGNIZE parentheses")


def _clause(body: str, name: str, stop: str) -> str | None:
    m = re.search(rf"{name}\s+(.*?)\s*(?={stop}|$)", body,
                  re.IGNORECASE | re.DOTALL)
    return m.group(1).strip() if m else None


def _rewrite_match_recognize(spark: SparkSession, q: str) -> str:
    m = _MR_HEAD_RE.search(q)
    if not m:
        return q
    table = m.group(1)
    open_idx = q.index("(", m.end() - 1)
    close_idx = _find_balanced(q, open_idx)
    body = q[open_idx + 1: close_idx]
    # optional trailing alias: ") AS t" / ") t"
    tail = q[close_idx + 1:]
    alias_m = re.match(r"\s*(?:AS\s+)?(\w+)", tail)
    consumed = close_idx + 1
    if alias_m and alias_m.group(1).upper() not in (
        "ORDER", "WHERE", "GROUP", "LIMIT", "UNION", "HAVING", "JOIN",
    ):
        consumed += alias_m.end()

    stops = (r"ORDER\s+BY|MEASURES|ONE\s+ROW|ALL\s+ROWS|AFTER\s+MATCH|"
             r"PATTERN|WITHIN|SUBSET|DEFINE")
    part = _clause(body, r"PARTITION\s+BY", stops)
    order = _clause(body, r"ORDER\s+BY", stops)
    measures_sql = _clause(body, r"MEASURES", stops)
    after = _clause(body, r"AFTER\s+MATCH", stops)
    pattern_m = re.search(r"PATTERN\s*\(([^)]*)\)", body, re.IGNORECASE)
    within_m = re.search(r"\)\s*(WITHIN\s+INTERVAL\s+'\d+'\s+\w+)", body,
                         re.IGNORECASE)
    subset_sql = _clause(body, r"SUBSET", stops)
    define_sql = _clause(body, r"DEFINE", r"$")
    rows_mode = (
        "all"
        if re.search(r"ALL\s+ROWS\s+PER\s+MATCH", body, re.IGNORECASE)
        else "one"
    )
    if not (part and order and measures_sql and pattern_m and define_sql):
        raise ValueError(
            "MATCH_RECOGNIZE requires PARTITION BY, ORDER BY, MEASURES, "
            "PATTERN and DEFINE clauses"
        )

    key_cols = [c.strip() for c in part.split(",")]
    order_cols = [c.strip() for c in order.split(",")]
    # SUBSET u = (A, B): union variables, usable in MEASURES (reference
    # parserImpls.ftl SUBSET grammar / MatchCodeGenerator subset resolution);
    # member rows merge in row order (the ORDER BY key).
    subsets: dict[str, list[str]] = {}
    if subset_sql:
        for item in _split_args(subset_sql):
            sm = re.match(r"(\w+)\s*=\s*\(([^)]*)\)$", item.strip())
            if not sm:
                raise ValueError(f"cannot parse SUBSET item {item!r}")
            subsets[sm.group(1).upper()] = [
                v.strip() for v in sm.group(2).split(",")
            ]

    def rows_of(src_match: dict, vn: str) -> list:
        members = subsets.get(vn.upper())
        if members is None:
            return _match_lookup(src_match, vn)
        merged = [r for mv in members for r in _match_lookup(src_match, mv)]
        # NULLS FIRST, matching the JVM sortWithinPartitions order — a raw
        # tuple key would raise TypeError on None vs value
        merged.sort(
            key=lambda r: tuple(
                (r[c] is not None, r[c]) for c in order_cols
            )
        )
        return merged
    defines = {}
    for item in _split_args(define_sql):
        dm = re.match(r"(\w+)\s+AS\s+(.*)$", item.strip(),
                      re.IGNORECASE | re.DOTALL)
        if not dm:
            raise ValueError(f"cannot parse DEFINE item {item!r}")
        defines[dm.group(1)] = dm.group(2).strip()

    measures = _parse_measures(measures_sql)
    fast = _try_single_var_runs(
        spark,
        table,
        key_cols,
        order_cols,
        pattern_m.group(1),
        defines,
        measures,
        after,
        rows_mode,
        within_m is not None,
    )
    if fast is not None:
        view = _fresh_view("mr")
        fast.createOrReplaceTempView(view)
        return q[: m.start()] + view + q[consumed:]

    pat = _parse_pattern(pattern_m.group(1), defines, subsets)
    if within_m:
        pat = pat.within(timedelta(seconds=_interval_seconds(within_m.group(1))))

    skip = SKIP_PAST_LAST_EVENT  # the SQL-standard default
    skip_var = None
    if after:
        a = re.sub(r"\s+", " ", after.upper()).strip()
        var_m = re.fullmatch(r"SKIP TO (?:(FIRST|LAST) )?(\w+)", a)
        if "SKIP TO NEXT ROW" in a:
            skip = SKIP_TO_NEXT
        elif "SKIP PAST LAST ROW" in a:
            skip = SKIP_PAST_LAST_EVENT
        elif "NO SKIP" in a:
            skip = NO_SKIP
        elif var_m:
            # SKIP TO [FIRST|LAST] var; bare var means LAST (SQL:2016 /
            # reference parserImpls.ftl MATCH_RECOGNIZE grammar)
            skip = SKIP_TO_FIRST if var_m.group(1) == "FIRST" else SKIP_TO_LAST
            skip_var = next(
                (st.name for st in pat.stages if st.name.upper() == var_m.group(2)),
                var_m.group(2),
            )
        else:
            raise NotImplementedError(f"AFTER MATCH strategy {after!r}")

    df = spark.table(table)
    if rows_mode == "one":
        # Project the input to the columns the MR spec can reference (ONE ROW
        # PER MATCH outputs only PARTITION BY keys + MEASURES): any column
        # used by ORDER BY / MEASURES / DEFINE appears as an identifier token
        # in the clause body, so keeping every column whose name tokenizes out
        # of the body is a safe superset. match_pattern is opaque to Catalyst
        # — without this, unreferenced payload columns (props, value, ...)
        # are shuffled by key and shipped through Arrow on every MR query.
        # ALL ROWS PER MATCH passes every input column through, so no pruning.
        toks = {t.lower() for t in re.findall(r"\w+", body)}
        needed = [c for c in df.columns if c.lower() in toks]
        if len(needed) < len(df.columns):
            df = df.select(*needed)
    else:
        # ALL ROWS PER MATCH passes every INPUT column through by contract —
        # but the MR view only exists to serve THIS statement, and the
        # enclosing text is in hand at rewrite time. Any column the outer
        # statement (or the MR clause body) references appears as an
        # identifier token there, so columns whose names tokenize out of
        # neither can be pruned from the opaque per-key Python boundary: the
        # pass-through payload (wide props/value columns) stops being
        # shuffled by key and Arrow-shipped both ways just to be dropped by
        # the outer Project (guide §4.1). A bare '*' anywhere outside the
        # clause body could reference every column, so pruning is skipped
        # then (COUNT(U.*) and friends live inside the body, which is
        # excluded from that check).
        outer = q[: m.start()] + " " + q[consumed:]
        if "*" not in outer:
            toks = {t.lower() for t in re.findall(r"\w+", body + " " + outer)}
            needed = [c for c in df.columns if c.lower() in toks]
            if len(needed) < len(df.columns):
                df = df.select(*needed)
    types = dict(df.dtypes)
    stage_order = [st.name for st in pat.stages]

    def measure_field(func, col, name):
        if func.startswith("FINAL:"):
            func = func[6:]
        if func == "CLASSIFIER":
            return f"{name} string"
        if func == "MATCH_NUMBER":
            return f"{name} bigint"
        if func == "AGGEXPR:COUNT":
            return f"{name} bigint"
        if func.startswith("AGGEXPR:") or func == "EXPR":
            return f"{name} double"
        col_t = "bigint" if col == "*" else types[col]
        return f"{name} {_measure_type(func, col_t)}"

    if rows_mode == "one":
        out_fields = [f"{k} {types[k]}" for k in key_cols]
        out_fields += [measure_field(f, c, n) for f, _v, c, n in measures]
        schema = ", ".join(out_fields)

        def select(key, match, match_no=None):
            row = dict(key)
            for func, var, col, name in measures:
                if func.startswith("FINAL:"):
                    func = func[6:]  # ONE ROW: FINAL == default semantics
                rows = rows_of(match, var) if var else []
                if func == "MATCH_NUMBER":
                    row[name] = match_no
                elif func == "CLASSIFIER":
                    # stages match left-to-right in index order, so the last
                    # mapped row belongs to the last non-empty stage
                    row[name] = next(
                        (s for s in reversed(stage_order) if match.get(s)), None
                    )
                elif func == "COUNT":
                    row[name] = len(rows)
                elif func.startswith("AGGEXPR:"):
                    v = _agg_over(
                        func[8:],
                        [_eval_row_expr(col, r, var) for r in rows],
                    )
                    row[name] = _as_double(func[8:], v)
                elif func == "EXPR":
                    v = _eval_measure_rows(col, lambda vn: rows_of(match, vn))
                    row[name] = None if v is None else float(v)
                elif not rows:
                    row[name] = None
                elif func == "FIRST":
                    row[name] = rows[0][col]
                elif func in ("", "LAST"):
                    # bare V.col == LAST(V.col, 0) (SQL:2016; also what the
                    # all-rows path and the windowed fast path emit)
                    row[name] = rows[-1][col]
                else:
                    vals = [r[col] for r in rows]
                    row[name] = {
                        "SUM": sum,
                        "MIN": min,
                        "MAX": max,
                        "AVG": lambda v: sum(v) / len(v),
                    }[func](vals)
            return row

    else:
        # ALL ROWS PER MATCH: one output row per mapped input row — all input
        # columns pass through, measures use RUNNING semantics (aggregates
        # over the rows mapped up to and including the current row; bare and
        # LAST refs resolve to the latest mapped row so far — SQL-standard
        # running semantics, reference StreamExecMatch allRows path)
        in_cols = df.columns
        for _f, _v, _c, name in measures:
            if name in in_cols:
                raise ValueError(
                    f"ALL ROWS PER MATCH measure {name!r} collides with an "
                    "input column"
                )
        out_fields = [f"{c} {types[c]}" for c in in_cols]
        out_fields += [measure_field(f, c, n) for f, _v, c, n in measures]
        schema = ", ".join(out_fields)

        has_final = any(f.startswith("FINAL:") for f, _v, _c, _n in measures)

        def _sel_impl(key, running, cur_row, cur_var, match_no, full_match):
            row = {c: cur_row[c] for c in in_cols}
            for func, var, col, name in measures:
                src_m = running
                if func.startswith("FINAL:"):
                    # FINAL: the measure sees the COMPLETE match on every row
                    # (SQL:2016 RUNNING/FINAL semantics; reference
                    # MatchCodeGenerator FINAL aggregates)
                    func = func[6:]
                    src_m = full_match if full_match is not None else running
                rows = rows_of(src_m, var) if var else []
                if func == "MATCH_NUMBER":
                    row[name] = match_no
                elif func == "CLASSIFIER":
                    row[name] = cur_var
                elif func == "COUNT":
                    row[name] = len(rows)
                elif func.startswith("AGGEXPR:"):
                    v = _agg_over(
                        func[8:],
                        [_eval_row_expr(col, r, var) for r in rows],
                    )
                    row[name] = _as_double(func[8:], v)
                elif func == "EXPR":
                    v = _eval_measure_rows(
                        col, lambda vn, s=src_m: rows_of(s, vn)
                    )
                    row[name] = None if v is None else float(v)
                elif not rows:
                    row[name] = None
                elif func == "FIRST":
                    row[name] = rows[0][col]
                elif func in ("", "LAST"):
                    row[name] = rows[-1][col]
                else:
                    vals = [r[col] for r in rows]
                    row[name] = {
                        "SUM": sum,
                        "MIN": min,
                        "MAX": max,
                        "AVG": lambda v: sum(v) / len(v),
                    }[func](vals)
            return row

        if has_final:

            def select(key, running, cur_row, cur_var, match_no=None,
                       full_match=None):
                return _sel_impl(key, running, cur_row, cur_var, match_no,
                                 full_match)

        else:
            # no FINAL measure: legacy signature, so the NFA skips building
            # the per-match full dict on this hot path
            def select(key, running, cur_row, cur_var, match_no=None):
                return _sel_impl(key, running, cur_row, cur_var, match_no,
                                 None)

    out = match_pattern(
        df,
        pat,
        key_cols=key_cols,
        time_col=order_cols[0],
        select=select,
        output_schema=schema,
        order_tiebreak=order_cols[1:],
        skip_strategy=skip,
        rows_per_match=rows_mode,
        skip_var=skip_var,
        with_match_number=any(f == "MATCH_NUMBER" for f, _v, _c, _n in measures),
    )
    view = _fresh_view("mr")
    out.createOrReplaceTempView(view)
    return q[: m.start()] + view + q[consumed:]


# --------------------------------------------------------------------------- #
# Entry point
# --------------------------------------------------------------------------- #

# --------------------------------------------------------------------------- #
# Legacy group-window grammar: GROUP BY TUMBLE/HOP/SESSION(ts, ...) with
# TUMBLE_START/TUMBLE_END/... auxiliary functions (the pre-1.13 Flink SQL
# windowing idiom — FlinkSqlOperatorTable TUMBLE/TUMBLE_START/TUMBLE_END,
# exercised throughout the reference's GroupWindowITCase). Lowered textually
# onto Spark's native window()/session_window() expressions, so the whole
# query stays inside Catalyst (codegen, partial aggregation, AQE).
# --------------------------------------------------------------------------- #

_IVL = r"INTERVAL\s+'[^']+'\s+\w+"
_GW_FIELD_RE = re.compile(
    rf"\b(TUMBLE|HOP|SESSION)_(START|END)\s*\(\s*(\w+)\s*,\s*({_IVL})"
    rf"(?:\s*,\s*({_IVL}))?\s*\)",
    re.IGNORECASE,
)
_GW_CALL_RE = re.compile(
    rf"\b(TUMBLE|HOP|SESSION)\s*\(\s*(\w+)\s*,\s*({_IVL})"
    rf"(?:\s*,\s*({_IVL}))?\s*\)",
    re.IGNORECASE,
)


def _rewrite_group_windows(q: str) -> str:
    def field(m: re.Match) -> str:
        kind, edge = m.group(1).upper(), m.group(2).lower()
        fn = "session_window" if kind == "SESSION" else "window"
        return f"{fn}.{edge}"

    q = _GW_FIELD_RE.sub(field, q)

    def call(m: re.Match) -> str:
        kind, ts = m.group(1).upper(), m.group(2)
        i1 = _interval_seconds(m.group(3))
        if kind == "TUMBLE":
            return f"window({ts}, '{i1} seconds')"
        if kind == "HOP":
            if not m.group(4):
                raise ValueError("HOP group window needs (ts, slide, size)")
            # Flink argument order is slide-then-size (FlinkSqlOperatorTable
            # HOP); Spark's window() takes size-then-slide.
            size = _interval_seconds(m.group(4))
            return f"window({ts}, '{size} seconds', '{i1} seconds')"
        return f"session_window({ts}, '{i1} seconds')"

    return _GW_CALL_RE.sub(call, q)


def sql(spark: SparkSession, query: str) -> DataFrame:
    """``TableEnvironment.sqlQuery`` with the Flink grammar extensions.

    ANSI queries pass straight through to ``spark.sql``; window TVFs, legacy
    group windows, ``FOR SYSTEM_TIME AS OF`` and ``MATCH_RECOGNIZE`` are
    lowered onto this repo's operators (or Spark's native window exprs) and
    spliced back as temp views.
    """
    query = _rewrite_window_tvfs(spark, query)
    query = _rewrite_group_windows(query)
    query = _rewrite_temporal_join(spark, query)
    query = _rewrite_match_recognize(spark, query)
    return spark.sql(query)
