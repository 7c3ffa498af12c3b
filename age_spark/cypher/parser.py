"""openCypher lexer + recursive-descent parser.

Covers the surface of the reference grammar ``src/backend/parser/cypher_gram.y``
(clauses: MATCH/OPTIONAL MATCH/WHERE/WITH/RETURN/UNWIND/ORDER BY/SKIP/LIMIT/
UNION [ALL]/CREATE/SET/REMOVE/DELETE/DETACH DELETE/MERGE/CALL...YIELD;
expressions incl. list/map literals, comprehensions, CASE, EXISTS/COUNT
subqueries, predicates, VLE quantifiers). Hand-rolled rather than generated —
the token set is small and error messages stay controllable.

Operator precedence follows cypher_gram.y's %left/%right declarations:
  OR < XOR < AND < NOT < comparison/IN/string-ops/IS NULL < +- < */% < ^ <
  unary-minus < subscript/property access.
"""

from __future__ import annotations

import re
from typing import Optional

from . import ast as A


class CypherSyntaxError(ValueError):
    pass


# ------------------------------------------------------------------- lexer

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+|//[^\n]*|/\*.*?\*/)
  | (?P<float>(\d+\.(?!\.)\d*|\.\d+)([eE][+-]?\d+)?|\d+[eE][+-]?\d+)
  | (?P<hex>0[xX][0-9A-Fa-f]+)
  | (?P<int>\d+)
  | (?P<string>'(?:[^'\\]|\\.|'')*'|"(?:[^"\\]|\\.|"")*")
  | (?P<name>[A-Za-z_][A-Za-z0-9_]*|`[^`]*`)
  | (?P<param>\$[A-Za-z_][A-Za-z0-9_]*)
  | (?P<op><=>|<\#>|<\+>|@>|<@|<>|<=|>=|=~|\+=|\.\.|->>|->|<-|::|\|\||\#>>|\#>|\?\||\?&|\?|[()\[\]{},:;.|=<>+\-*/%^])
    """,
    re.VERBOSE | re.DOTALL,
)

KEYWORDS = {
    "match", "optional", "where", "return", "with", "unwind", "as", "order",
    "by", "asc", "ascending", "desc", "descending", "skip", "limit", "distinct",
    "union", "all", "create", "set", "remove", "delete", "detach", "merge",
    "on", "call", "yield", "case", "when", "then", "else", "end", "and", "or",
    "xor", "not", "in", "starts", "ends", "contains", "is", "null", "true",
    "false", "exists", "count", "any", "none", "single", "reduce",
}

_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", "b": "\b", "f": "\f", "'": "'", '"': '"', "\\": "\\", "/": "/"}

# ::target -> conversion function (sql typecasts, cypher_gram.y:1836-1846).
# ::int is NOT toInteger(): the cast ROUNDS (2.71::int = 3, expr.out) and
# accepts booleans, while toInteger() truncates (toInteger(1.2) = 1) and
# rejects booleans — distinct kernels.
_CAST_FNS = {
    "int": "castint", "integer": "castint",
    "float": "castfloat", "numeric": "tonumeric",
    "bool": "castbool", "boolean": "castbool",
    "string": "tostring",
    "pg_float8": "castpgfloat8", "pg_bigint": "castint",
    "vertex": "castvertex", "edge": "castedge", "path": "castpath",
    # pgvector interop (regress/sql/pgvector.sql): ::vector optionally
    # takes a checked dimension (::vector(3)); ::agtype / ::text are the
    # round-trip casts its fixtures chain after vector expressions
    "vector": "castvector", "agtype": "castagtype", "text": "casttext",
}


def _unquote(s: str) -> str:
    q = s[0]
    body = s[1:-1]
    out, i = [], 0
    while i < len(body):
        c = body[i]
        if c == q and i + 1 < len(body) and body[i + 1] == q:
            # SQL-style doubled quote ('it''s', "say ""hi""") — the
            # reference lexer accepts both escapes (scan.l / regress scan)
            out.append(q)
            i += 2
            continue
        if c == "\\" and i + 1 < len(body):
            nxt = body[i + 1]
            if nxt == "u" and i + 5 < len(body):
                out.append(chr(int(body[i + 2 : i + 6], 16)))
                i += 6
                continue
            if nxt == "U" and i + 9 < len(body):
                out.append(chr(int(body[i + 2 : i + 10], 16)))
                i += 10
                continue
            out.append(_ESCAPES.get(nxt, nxt))
            i += 2
        else:
            out.append(c)
            i += 1
    joined = "".join(out)
    # escape-built surrogate pairs combine into the real code point
    # (scan.out: "\ud835\U0000DEF0" prints one character)
    try:
        return joined.encode("utf-16", "surrogatepass").decode("utf-16")
    except UnicodeDecodeError:
        return joined


class Tok:
    __slots__ = ("kind", "value", "pos", "text")

    def __init__(self, kind: str, value, pos: int, text: str = ""):
        self.kind = kind  # 'int','float','string','name','kw','param','op','eof'
        self.value = value
        self.pos = pos
        self.text = text  # original spelling (keywords keep their case)

    def __repr__(self):
        return f"Tok({self.kind},{self.value!r})"


def tokenize(text: str) -> list[Tok]:
    toks: list[Tok] = []
    i, n = 0, len(text)
    while i < n:
        m = _TOKEN_RE.match(text, i)
        if not m:
            raise CypherSyntaxError(f"unexpected character {text[i]!r} at {i}")
        i = m.end()
        kind = m.lastgroup
        v = m.group()
        if kind == "ws":
            continue
        if kind == "hex":
            # hex integer literals (the reference scanner, scan.l);
            # out-of-range values widen to FLOAT (scan.out:17)
            hv = int(v, 16)
            if hv > 2**63 - 1:
                toks.append(Tok("float", float(hv), m.start(), v))
            else:
                toks.append(Tok("int", hv, m.start(), v))
        elif kind == "int":
            # a leading 0 with octal digits is an OCTAL literal (scan.l:
            # 010 = 8); 0-prefixed literals with 8/9 stay decimal
            if len(v) > 1 and v[0] == "0" and all(c in "01234567" for c in v):
                iv = int(v, 8)
                if iv > 2**63 - 1:
                    toks.append(Tok("float", float(iv), m.start(), v))
                else:
                    toks.append(Tok("int", iv, m.start(), v))
            else:
                toks.append(Tok("int", int(v), m.start(), v))
        elif kind == "float":
            # keep the spelling: ::numeric needs the exact decimal digits
            # the float value has already rounded away
            toks.append(Tok("float", float(v), m.start(), v))
        elif kind == "string":
            toks.append(Tok("string", _unquote(v), m.start()))
        elif kind == "param":
            toks.append(Tok("param", v[1:], m.start()))
        elif kind == "name":
            if v.startswith("`"):
                toks.append(Tok("name", v[1:-1], m.start(), v[1:-1]))
            elif v.lower() in KEYWORDS:
                toks.append(Tok("kw", v.lower(), m.start(), v))
            else:
                toks.append(Tok("name", v, m.start(), v))
        else:
            toks.append(Tok("op", v, m.start()))
    toks.append(Tok("eof", None, n))
    return toks


# ------------------------------------------------------------------ parser


class Parser:
    def __init__(self, text: str):
        self.text = text
        self.toks = tokenize(text)
        self.i = 0

    # --- token helpers
    @property
    def cur(self) -> Tok:
        return self.toks[self.i]

    def peek(self, k: int = 1) -> Tok:
        j = min(self.i + k, len(self.toks) - 1)
        return self.toks[j]

    def advance(self) -> Tok:
        t = self.cur
        self.i += 1
        return t

    def at_kw(self, *kws: str) -> bool:
        return self.cur.kind == "kw" and self.cur.value in kws

    def at_op(self, *ops: str) -> bool:
        return self.cur.kind == "op" and self.cur.value in ops

    def accept_kw(self, *kws: str) -> Optional[str]:
        if self.at_kw(*kws):
            return self.advance().value
        return None

    def accept_op(self, *ops: str) -> Optional[str]:
        if self.at_op(*ops):
            return self.advance().value
        return None

    def expect_kw(self, kw: str) -> None:
        if not self.accept_kw(kw):
            self.err(f"expected {kw.upper()}")

    def expect_op(self, op: str) -> None:
        if not self.accept_op(op):
            self.err(f"expected {op!r}")

    def expect_name(self) -> str:
        if self.cur.kind == "name":
            return self.advance().value
        # keywords double as identifiers in name position (labels, keys,
        # aliases) — original spelling preserved
        if self.cur.kind == "kw":
            return self.advance().text
        self.err("expected identifier")

    def err(self, msg: str):
        t = self.cur
        ctx = self.text[max(0, t.pos - 20) : t.pos + 20]
        raise CypherSyntaxError(f"{msg} at offset {t.pos} near {ctx!r} (got {t.kind}:{t.value!r})")

    # --- entry
    def parse_query(self) -> A.UnionQuery:
        parts = [self.parse_single_query()]
        alls = []
        while self.accept_kw("union"):
            alls.append(bool(self.accept_kw("all")))
            parts.append(self.parse_single_query())
        if self.cur.kind != "eof" and not self.at_op(";"):
            self.err("unexpected trailing input")
        return A.UnionQuery(parts=parts, alls=alls)

    def parse_single_query(self) -> A.SingleQuery:
        clauses: list[A.Clause] = []
        while True:
            c = self.parse_clause()
            if c is None:
                break
            clauses.append(c)
        if not clauses:
            self.err("empty query")
        return A.SingleQuery(clauses)

    def parse_clause(self) -> Optional[A.Clause]:
        if self.at_kw("optional"):
            self.advance()
            self.expect_kw("match")
            return self.parse_match(optional=True)
        if self.accept_kw("match"):
            return self.parse_match(optional=False)
        if self.accept_kw("unwind"):
            e = self.parse_expr()
            self.expect_kw("as")
            return A.Unwind(e, self.expect_name())
        if self.accept_kw("with"):
            return self.parse_with()
        if self.accept_kw("return"):
            return self.parse_return()
        if self.accept_kw("create"):
            pats = [self.parse_path_pattern()]
            while self.accept_op(","):
                pats.append(self.parse_path_pattern())
            return A.Create(pats)
        if self.accept_kw("merge"):
            pat = self.parse_path_pattern()
            on_create, on_match = [], []
            seen_c = seen_m = False
            while self.at_kw("on"):
                self.advance()
                which = self.advance()
                if which.kind == "kw" and which.value == "create":
                    if seen_c:
                        # cypher_merge.out:261 parity
                        self.err("ON CREATE SET specified more than once")
                    seen_c = True
                    self.expect_kw("set")
                    on_create.extend(self.parse_set_items())
                elif which.kind == "kw" and which.value == "match":
                    if seen_m:
                        self.err("ON MATCH SET specified more than once")
                    seen_m = True
                    self.expect_kw("set")
                    on_match.extend(self.parse_set_items())
                else:
                    self.err("expected CREATE or MATCH after ON")
            return A.Merge(pat, on_create, on_match)
        if self.accept_kw("set"):
            return A.SetClause(self.parse_set_items())
        if self.accept_kw("remove"):
            items = []
            while True:
                var = self.expect_name()
                self.expect_op(".")
                items.append(A.RemoveItem(var, self.expect_name()))
                if not self.accept_op(","):
                    break
            return A.RemoveClause(items)
        if self.at_kw("detach") or self.at_kw("delete"):
            detach = bool(self.accept_kw("detach"))
            self.expect_kw("delete")
            exprs = [self.parse_expr()]
            while self.accept_op(","):
                exprs.append(self.parse_expr())
            return A.Delete(exprs, detach)
        if self.accept_kw("call"):
            name = self.expect_name()
            while self.accept_op("."):
                name += "." + self.expect_name()
            args = []
            if self.accept_op("("):
                if not self.at_op(")"):
                    args.append(self.parse_expr())
                    while self.accept_op(","):
                        args.append(self.parse_expr())
                self.expect_op(")")
            yield_items, where = [], None
            if self.accept_kw("yield"):
                yield_items.append(self.parse_return_item())
                while self.accept_op(","):
                    yield_items.append(self.parse_return_item())
                if self.accept_kw("where"):
                    where = self.parse_expr()
            return A.CallProc(name, args, yield_items, where)
        return None

    def parse_match(self, optional: bool) -> A.Match:
        pats = [self.parse_path_pattern()]
        while self.accept_op(","):
            pats.append(self.parse_path_pattern())
        where = self.parse_expr() if self.accept_kw("where") else None
        return A.Match(pats, optional=optional, where=where)

    # --- projections
    def parse_return_item(self) -> A.ReturnItem:
        e = self.parse_expr()
        alias = self.expect_name() if self.accept_kw("as") else None
        return A.ReturnItem(e, alias)

    def _parse_projection_tail(self):
        order_by: list[A.OrderItem] = []
        skip = limit = None
        if self.at_kw("order"):
            self.advance()
            self.expect_kw("by")
            while True:
                e = self.parse_expr()
                asc = True
                if self.accept_kw("desc", "descending"):
                    asc = False
                else:
                    self.accept_kw("asc", "ascending")
                order_by.append(A.OrderItem(e, asc))
                if not self.accept_op(","):
                    break
        if self.accept_kw("skip"):
            skip = self.parse_expr()
        if self.accept_kw("limit"):
            limit = self.parse_expr()
        return order_by, skip, limit

    def parse_with(self) -> A.With:
        distinct = bool(self.accept_kw("distinct"))
        star = False
        items: list[A.ReturnItem] = []
        if self.accept_op("*"):
            star = True
            while self.accept_op(","):
                items.append(self.parse_return_item())
        else:
            items.append(self.parse_return_item())
            while self.accept_op(","):
                items.append(self.parse_return_item())
        order_by, skip, limit = self._parse_projection_tail()
        where = self.parse_expr() if self.accept_kw("where") else None
        return A.With(items, distinct, star, order_by, skip, limit, where)

    def parse_return(self) -> A.Return:
        distinct = bool(self.accept_kw("distinct"))
        star = False
        items: list[A.ReturnItem] = []
        if self.accept_op("*"):
            star = True
            while self.accept_op(","):
                items.append(self.parse_return_item())
        else:
            items.append(self.parse_return_item())
            while self.accept_op(","):
                items.append(self.parse_return_item())
        order_by, skip, limit = self._parse_projection_tail()
        return A.Return(items, distinct, star, order_by, skip, limit)

    def parse_set_items(self) -> list[A.SetItem]:
        items = []
        while True:
            var = self.expect_name()
            if self.accept_op("."):
                key = self.expect_name()
                self.expect_op("=")
                items.append(A.SetItem("prop", var, key, self.parse_expr()))
            elif self.accept_op("+="):
                items.append(A.SetItem("merge", var, None, self.parse_expr()))
            elif self.accept_op("="):
                items.append(A.SetItem("replace", var, None, self.parse_expr()))
            else:
                self.err("expected '.', '=' or '+=' in SET item")
            if not self.accept_op(","):
                break
        return items

    # --- patterns
    def parse_path_pattern(self) -> A.PathPattern:
        var = None
        if self.cur.kind == "name" and self.peek().kind == "op" and self.peek().value == "=" \
                and self.peek(2).kind == "op" and self.peek(2).value == "(":
            var = self.advance().value
            self.advance()  # '='
        elements: list = [self.parse_node_pattern()]
        while self.at_op("-", "<-", "<"):
            rel = self.parse_rel_pattern()
            node = self.parse_node_pattern()
            elements.append(rel)
            elements.append(node)
        return A.PathPattern(var, elements)

    def parse_node_pattern(self) -> A.NodePattern:
        self.expect_op("(")
        var = None
        labels: list[str] = []
        props = None
        if self.cur.kind == "name" and not self.at_op(")"):
            var = self.advance().value
        while self.accept_op(":"):
            labels.append(self.expect_name())
        if self.at_op("{"):
            props = self.parse_map_literal()
        elif self.accept_op("="):
            # ={...} / =$param: exact (equality) constraint overriding
            # containment
            if self.cur.kind == "param":
                props = A.ExactProps(A.Param(self.advance().value))
            else:
                props = A.ExactProps(self.parse_map_literal())
        elif self.cur.kind == "param":
            props = A.Param(self.advance().value)
        self.expect_op(")")
        return A.NodePattern(var, labels, props)

    def parse_rel_pattern(self) -> A.RelPattern:
        # entry arrow:  '-' | '<-'
        direction = "both"
        if self.accept_op("<-"):
            direction = "in"
        elif self.accept_op("<"):
            self.expect_op("-")
            direction = "in"
        else:
            self.expect_op("-")
        var = None
        types: list[str] = []
        props = None
        varlen = None
        if self.accept_op("["):
            if self.cur.kind == "name" and not self.at_op("]"):
                var = self.advance().value
            if self.accept_op(":"):
                types.append(self.expect_name())
                while self.accept_op("|"):
                    self.accept_op(":")  # tolerate [:A|:B]
                    types.append(self.expect_name())
            if self.accept_op("*"):
                lo = hi = None
                if self.cur.kind == "int":
                    lo = self.advance().value
                if self.accept_op(".."):
                    if self.cur.kind == "int":
                        hi = self.advance().value
                else:
                    hi = lo  # [*2] means exactly 2; bare [*] -> (None,None)
                varlen = (lo, hi)
            if self.at_op("{"):
                props = self.parse_map_literal()
            elif self.accept_op("="):
                if self.cur.kind == "param":
                    props = A.ExactProps(A.Param(self.advance().value))
                else:
                    props = A.ExactProps(self.parse_map_literal())
            elif self.cur.kind == "param":
                props = A.Param(self.advance().value)
            self.expect_op("]")
        # exit arrow: '->' | '-'
        if self.accept_op("->"):
            if direction == "in":
                self.err("relationship cannot be both <- and ->")
            direction = "out"
        else:
            self.expect_op("-")
        return A.RelPattern(var, types, props, direction, varlen)

    def parse_map_literal(self) -> A.MapLit:
        self.expect_op("{")
        items: list[tuple[str, A.Expr]] = []
        if not self.at_op("}"):
            while True:
                if self.cur.kind in ("name", "string"):
                    key = self.advance().value
                elif self.cur.kind == "kw":
                    key = self.advance().text
                else:
                    self.err("expected map key")
                self.expect_op(":")
                items.append((key, self.parse_expr()))
                if not self.accept_op(","):
                    break
        self.expect_op("}")
        return A.MapLit(items)

    # --- expressions (precedence climbing)
    def parse_expr(self) -> A.Expr:
        return self.parse_or()

    def parse_or(self) -> A.Expr:
        left = self.parse_xor()
        while self.accept_kw("or"):
            left = A.Binary("or", left, self.parse_xor())
        return left

    def parse_xor(self) -> A.Expr:
        left = self.parse_and()
        while self.accept_kw("xor"):
            left = A.Binary("xor", left, self.parse_and())
        return left

    def parse_and(self) -> A.Expr:
        left = self.parse_not()
        while self.accept_kw("and"):
            left = A.Binary("and", left, self.parse_not())
        return left

    def parse_not(self) -> A.Expr:
        if self.accept_kw("not"):
            return A.Unary("not", self.parse_not())
        return self.parse_comparison()

    _CHAIN_OPS = ("=", "<>", "<", "<=", ">", ">=")

    def parse_comparison(self) -> A.Expr:
        left = self.parse_additive()
        while True:
            if self.at_op(*self._CHAIN_OPS):
                # openCypher chained comparisons are CONJUNCTIVE:
                # `1 = 1 = 1` means (1 = 1) AND (1 = 1) -> true, while the
                # parenthesized `(1 = 1) = 1` compares bool to int -> false
                # (expr.out chained-comparison block)
                links = []
                cur = left
                while self.at_op(*self._CHAIN_OPS):
                    op = self.advance().value
                    rhs = self.parse_additive()
                    links.append(A.Binary(op, cur, rhs))
                    cur = rhs
                left = links[0]
                for link in links[1:]:
                    left = A.Binary("and", left, link)
            elif self.at_op("=~"):
                self.advance()
                left = A.Binary("=~", left, self.parse_additive())
            elif self.at_op("@>", "<@"):
                op = self.advance().value
                left = A.Binary(op, left, self.parse_additive())
            elif self.at_op("?", "?|", "?&"):
                op = self.advance().value
                left = A.Binary(op, left, self.parse_additive())
            elif self.at_kw("in"):
                self.advance()
                left = A.Binary("in", left, self.parse_additive())
            elif self.at_kw("starts"):
                self.advance()
                self.expect_kw("with")
                left = A.Binary("starts with", left, self.parse_additive())
            elif self.at_kw("ends"):
                self.advance()
                self.expect_kw("with")
                left = A.Binary("ends with", left, self.parse_additive())
            elif self.at_kw("contains"):
                self.advance()
                left = A.Binary("contains", left, self.parse_additive())
            elif self.at_kw("is"):
                self.advance()
                negated = bool(self.accept_kw("not"))
                self.expect_kw("null")
                left = A.IsNull(left, negated)
            else:
                return left

    # infix operators reachable through the PG OPERATOR ( op ) syntax the
    # reference needs for `<->` (a bare `<->` is a pattern arrow in both
    # lexers — pgvector.sql's comment block); backticked names lex as name
    # tokens, symbolic ones as op tokens
    _OPERATOR_SYNTAX_OPS = {"+", "-", "*", "||", "<->", "<#>", "<=>", "<+>"}

    def _try_operator_syntax(self) -> Optional[str]:
        """At an infix position, parse `OPERATOR ( [schema.] op )` and
        return the operator symbol, or None if not at that syntax."""
        if not (self.cur.kind == "name" and self.cur.value.upper() == "OPERATOR"):
            return None
        if not (self.peek().kind == "op" and self.peek().value == "("):
            return None
        self.advance()
        self.advance()
        t = self.advance()
        sym = t.value if t.kind in ("name", "op") else t.text
        if t.kind == "name" and self.at_op("."):
            # schema-qualified: public.<op> — the qualifier is PG catalog
            # addressing; only the operator matters here
            self.advance()
            t = self.advance()
            sym = t.value if t.kind in ("name", "op") else t.text
        if sym not in self._OPERATOR_SYNTAX_OPS:
            raise CypherSyntaxError(f"unsupported OPERATOR ({sym}) at offset {t.pos}")
        self.expect_op(")")
        return sym

    def parse_additive(self) -> A.Expr:
        left = self.parse_multiplicative()
        while True:
            if self.at_op("+", "-", "||", "#>", "#>>", "<#>", "<=>", "<+>"):
                op = self.advance().value
                left = A.Binary(op, left, self.parse_multiplicative())
                continue
            op = self._try_operator_syntax()
            if op is not None:
                left = A.Binary(op, left, self.parse_multiplicative())
                continue
            return left

    def parse_multiplicative(self) -> A.Expr:
        left = self.parse_power()
        while self.at_op("*", "/", "%"):
            op = self.advance().value
            left = A.Binary(op, left, self.parse_power())
        return left

    def parse_power(self) -> A.Expr:
        left = self.parse_unary()
        if self.at_op("^"):
            self.advance()
            return A.Binary("^", left, self.parse_power())  # right-assoc
        return left

    def parse_unary(self) -> A.Expr:
        if self.at_op("-"):
            self.advance()
            inner = self.parse_unary()
            if (
                isinstance(inner, A.Lit)
                and isinstance(inner.value, (int, float))
                and not isinstance(inner.value, bool)
            ):
                # fold into the literal so INT64_MIN is representable
                # (-9223372036854775808: the positive magnitude alone
                # overflows, agtype.out int64 bounds block) and ::numeric
                # keeps the signed spelling
                return A.Lit(-inner.value, raw=("-" + inner.raw) if inner.raw else None)
            return A.Unary("-", inner)
        if self.at_op("+"):
            self.advance()
            return self.parse_unary()
        return self.parse_postfix()

    def parse_postfix(self) -> A.Expr:
        e = self.parse_atom()
        while True:
            if self.at_op(".") and self.peek().kind in ("name", "kw"):
                self.advance()
                t = self.advance()
                e = A.Prop(e, t.text if t.kind == "kw" else t.value)
            elif self.at_op("["):
                self.advance()
                lo = None if self.at_op("..") else self.parse_expr()
                if self.accept_op(".."):
                    hi = None if self.at_op("]") else self.parse_expr()
                    e = A.Slice(e, lo, hi)
                else:
                    e = A.Index(e, lo)
                self.expect_op("]")
            elif self.at_op("->", "->>"):
                # jsonb access operators INSIDE Cypher text
                # (regress/sql/jsonb_operators.sql `lst->-1`, `n->'json'`):
                # `->` is unambiguous in expression position — pattern
                # arrows only follow a node/edge group, which the atom
                # parser consumed as a pattern already
                op = self.advance().value
                rhs = self.parse_unary_minus_atom()
                if op == "->":
                    e = A.Index(e, rhs, arrow=True)
                else:
                    e = A.Binary("->>", e, rhs)
            elif self.at_op("{") and isinstance(e, A.Var):
                e = self.parse_map_projection(e.name)
            elif self.at_op("::"):
                # typecast (cypher_gram.y:1836-1846): expr::int etc.
                self.advance()
                t = self.advance()
                target = (t.value if t.kind != "kw" else t.text).lower()
                fn = _CAST_FNS.get(target)
                if fn is None:
                    raise CypherSyntaxError(
                        f"unsupported typecast ::{target} at offset {t.pos}"
                    )
                cast_args = [e]
                if fn == "castvector" and self.at_op("("):
                    # dimension-checked cast: ::vector(3) (pgvector.sql)
                    self.advance()
                    dim = self.advance()
                    if dim.kind != "int":
                        raise CypherSyntaxError(
                            f"::vector(n) needs an integer dimension at offset {dim.pos}"
                        )
                    self.expect_op(")")
                    cast_args.append(A.Lit(dim.value))
                e = A.FuncCall(fn, cast_args)
            else:
                return e

    def parse_unary_minus_atom(self) -> A.Expr:
        if self.at_op("-"):
            self.advance()
            return A.Unary("-", self.parse_atom())
        return self.parse_atom()

    def parse_map_projection(self, var: str) -> A.MapProjection:
        self.expect_op("{")
        items: list[tuple[str, object]] = []
        if not self.at_op("}"):
            while True:
                if self.accept_op("."):
                    if self.accept_op("*"):
                        items.append(("all", None))
                    else:
                        items.append(("prop", self.expect_name()))
                elif (self.cur.kind in ("name", "kw")) and self.peek().kind == "op" and self.peek().value == ":":
                    key = self.advance().value
                    self.advance()
                    items.append(("expr", (key, self.parse_expr())))
                else:
                    items.append(("var", self.expect_name()))
                if not self.accept_op(","):
                    break
        self.expect_op("}")
        return A.MapProjection(var, items)

    def _looks_like_pattern(self) -> bool:
        """At '(' — disambiguate parenthesized expr vs node pattern used as
        a boolean predicate. Two gates: the group must LEX like a node
        pattern (empty, or identifier / ':label' / '{props}' start), and the
        matching ')' must be followed by a relationship continuation
        ('-[', '--', '<-[', '<--'), so arithmetic like (1+2)-(3) or
        (a.x)-(b.y) parses as an expression."""
        first = self.toks[self.i + 1] if self.i + 1 < len(self.toks) else None
        if first is None:
            return False
        if first.kind == "op" and first.value in (")", ":", "{"):
            pass  # () / (:Label...) / ({props})
        elif first.kind in ("name", "kw"):
            second = self.toks[self.i + 2] if self.i + 2 < len(self.toks) else None
            if not (
                second is not None
                and second.kind == "op"
                and second.value in (":", "{", ")")
            ):
                return False  # (a.x ... / (a + ... — expression
        else:
            return False  # (1 + ... — expression
        # a LABELED single node is a pattern even with no relationship
        # continuation — `(a:Person)` in expression position is a
        # node-pattern predicate (regress/sql/pattern_expression.sql
        # `MATCH (a) WHERE (a:Person) ...`); `:` cannot start an
        # expression operator here, so there is no ambiguity
        second = self.toks[self.i + 2] if self.i + 2 < len(self.toks) else None
        labeled = (first.kind == "op" and first.value == ":") or (
            first.kind in ("name", "kw")
            and second is not None
            and second.kind == "op"
            and second.value == ":"
        )
        depth = 0
        j = self.i
        while j < len(self.toks):
            t = self.toks[j]
            if t.kind == "op" and t.value == "(":
                depth += 1
            elif t.kind == "op" and t.value == ")":
                depth -= 1
                if depth == 0:
                    nxt = self.toks[j + 1] if j + 1 < len(self.toks) else None
                    if nxt is None or nxt.kind != "op":
                        return labeled
                    after = self.toks[j + 2] if j + 2 < len(self.toks) else None
                    if nxt.value in ("-", "<-"):
                        # a rel needs '[' (typed) or another '-' (anonymous);
                        # a bare '-' followed by '(' is subtraction
                        return (
                            after is not None
                            and after.kind == "op"
                            and after.value in ("[", "-")
                        )
                    return labeled
            j += 1
        return False

    def parse_atom(self) -> A.Expr:
        t = self.cur
        if t.kind == "int" or t.kind == "float":
            self.advance()
            return A.Lit(t.value, raw=t.text)
        if t.kind == "string":
            self.advance()
            return A.Lit(t.value)
        if t.kind == "param":
            self.advance()
            return A.Param(t.value)
        if t.kind == "kw":
            if t.value in ("true", "false"):
                self.advance()
                return A.Lit(t.value == "true")
            if t.value == "null":
                self.advance()
                return A.Lit(None)
            if t.value == "case":
                return self.parse_case()
            if t.value == "exists":
                return self.parse_exists()
            if t.value == "count":
                return self.parse_count()
            if t.value in ("all", "any", "none", "single"):
                if self.peek().kind == "op" and self.peek().value == "(":
                    kind = self.advance().value
                    self.expect_op("(")
                    var = self.expect_name()
                    self.expect_kw("in")
                    src = self.parse_expr()
                    self.expect_kw("where")
                    where = self.parse_expr()
                    self.expect_op(")")
                    return A.PredFn(kind, var, src, where)
            if t.value == "reduce":
                self.advance()
                self.expect_op("(")
                acc = self.expect_name()
                self.expect_op("=")
                init = self.parse_expr()
                self.expect_op(",")
                var = self.expect_name()
                self.expect_kw("in")
                src = self.parse_expr()
                self.expect_op("|")
                body = self.parse_expr()
                self.expect_op(")")
                return A.Reduce(acc, init, var, src, body)
        if t.kind == "name":
            nxt = self.peek()
            if nxt.kind == "op" and nxt.value == "(":
                name = self.advance().value
                return self.parse_func_call(name.lower())
            # schema-qualified call (`ag_catalog.agtype_build_map(...)`,
            # agtype.out): consume the schema, dispatch on the bare name
            nxt2 = self.toks[self.i + 2] if self.i + 2 < len(self.toks) else None
            nxt3 = self.toks[self.i + 3] if self.i + 3 < len(self.toks) else None
            if (
                nxt.kind == "op" and nxt.value == "."
                and nxt2 is not None and nxt2.kind == "name"
                and nxt3 is not None and nxt3.kind == "op" and nxt3.value == "("
            ):
                schema = self.advance().value.lower()  # schema
                self.advance()  # .
                name = self.advance().value.lower()
                if schema == "pg_catalog" and name == "sqrt":
                    # PG's sqrt is STRICT about negatives (errors) unlike
                    # age_sqrt's null (expr.out:727 vs :718)
                    return self.parse_func_call("pg_sqrt")
                return self.parse_func_call(name)
            self.advance()
            return A.Var(t.value)
        if t.kind == "op" and t.value == "(":
            if self._looks_like_pattern():
                return A.PatternPred(self.parse_path_pattern())
            self.advance()
            e = self.parse_expr()
            self.expect_op(")")
            return e
        if t.kind == "op" and t.value == "[":
            return self.parse_list_or_comprehension()
        if t.kind == "op" and t.value == "{":
            return self.parse_map_literal()
        self.err("unexpected token in expression")

    def parse_func_call(self, name: str) -> A.FuncCall:
        self.expect_op("(")
        distinct = bool(self.accept_kw("distinct"))
        args: list[A.Expr] = []
        if self.accept_op("*"):
            args.append(A.Star())
        elif not self.at_op(")"):
            args.append(self.parse_expr())
            while self.accept_op(","):
                args.append(self.parse_expr())
        self.expect_op(")")
        return A.FuncCall(name, args, distinct)

    def parse_case(self) -> A.CaseExpr:
        self.expect_kw("case")
        operand = None
        if not self.at_kw("when"):
            operand = self.parse_expr()
        whens = []
        while self.accept_kw("when"):
            cond = self.parse_expr()
            self.expect_kw("then")
            whens.append((cond, self.parse_expr()))
        default = self.parse_expr() if self.accept_kw("else") else None
        self.expect_kw("end")
        return A.CaseExpr(operand, whens, default)

    def parse_exists(self) -> A.Expr:
        self.expect_kw("exists")
        if self.accept_op("("):
            # exists(n.prop) or exists((n)-[]->())
            if self._at_pattern_inside_paren():
                pat = self.parse_path_pattern()
                self.expect_op(")")
                return A.ExistsSubquery([pat], None, paren_form=True)
            e = self.parse_expr()
            self.expect_op(")")
            if isinstance(e, (A.Var, A.ListLit)):
                # the reference grammar only admits a pattern or a property
                # reference inside EXISTS( ): a bare variable or a list is
                # a syntax error (cypher_match.out:1214,1354)
                raise CypherSyntaxError(
                    "EXISTS() expects a pattern or a property reference"
                )
            return A.FuncCall("exists", [e])
        self.expect_op("{")
        branches = [self._parse_subquery_branch()]
        # a braced EXISTS body is a full reading query — UNION included
        # (cypher_subquery.sql); existence is the OR of the branches, with
        # the reference's column-arity check
        while self.accept_kw("union"):
            self.accept_kw("all")
            branches.append(self._parse_subquery_branch())
        self.expect_op("}")
        arities = {len(r or []) for _, _, r in branches}
        if len(branches) > 1 and len(arities) > 1:
            raise CypherSyntaxError(
                "each UNION query must have the same number of columns"
            )
        out = None
        for pats, where, rets in branches:
            node = A.ExistsSubquery(pats, where, returns=rets)
            out = node if out is None else A.Binary("or", out, node)
        return out

    def _parse_subquery_branch(self):
        self.accept_kw("match")
        pats = [self.parse_path_pattern()]
        while self.accept_op(","):
            pats.append(self.parse_path_pattern())
        where = self.parse_expr() if self.accept_kw("where") else None
        rets = self._parse_subquery_return()
        return pats, where, rets

    def _parse_subquery_return(self):
        """EXISTS/COUNT subqueries accept a full body with RETURN
        (cypher_match.sql EXISTS { MATCH (x:Person) RETURN x }); only row
        existence matters, but the items are kept so variable references
        validate (cypher_subquery.out 'could not find rte' errors)."""
        if not self.accept_kw("return"):
            return None
        items = []
        while True:
            items.append(self.parse_expr())
            if self.accept_kw("as"):
                self.expect_name()
            if not self.accept_op(","):
                break
        return items

    def _at_pattern_inside_paren(self) -> bool:
        # after consuming 'exists(' — pattern iff '(' follows
        return self.at_op("(")

    def parse_count(self) -> A.Expr:
        self.expect_kw("count")
        if self.at_op("("):
            return self.parse_func_call("count")
        self.expect_op("{")
        pats, where, rets = self._parse_subquery_branch()
        self.expect_op("}")
        return A.CountSubquery(pats, where, returns=rets)

    def parse_list_or_comprehension(self) -> A.Expr:
        self.expect_op("[")
        if self.at_op("]"):
            self.advance()
            return A.ListLit([])
        # lookahead: name IN -> comprehension
        if self.cur.kind == "name" and self.peek().kind == "kw" and self.peek().value == "in":
            var = self.advance().value
            self.advance()  # in
            src = self.parse_expr()
            where = self.parse_expr() if self.accept_kw("where") else None
            proj = self.parse_expr() if self.accept_op("|") else None
            self.expect_op("]")
            return A.ListComp(var, src, where, proj)
        items = [self.parse_expr()]
        while self.accept_op(","):
            items.append(self.parse_expr())
        self.expect_op("]")
        return A.ListLit(items)


def parse_cypher(text: str) -> A.UnionQuery:
    return Parser(text).parse_query()
