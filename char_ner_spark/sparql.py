"""Textual SPARQL-subset front end over :func:`graph.match_pattern`.

The KG's query operators (BGP equijoins, property paths, OPTIONAL, MINUS,
FILTER, projection) are exposed programmatically by ``graph.match_pattern``;
this module adds the standard textual surface a KG consumer expects::

    SELECT ?person ?place WHERE {
      ?person works_for ?org .
      ?org located_in+ ?place .
      OPTIONAL { ?person born_in ?birth . }
      MINUS { ?person born_in 0 . }
      FILTER (person != place)
    }

Supported subset (deliberately small — every construct maps 1:1 onto a
`match_pattern` argument, so the compiled plan is identical to the
programmatic call and inherits its audited scale shape):

* ``SELECT ?a ?b`` / ``SELECT *`` (projection; ``DISTINCT`` accepted and
  ignored — solutions are set-semantics already);
* triple patterns ``term pred term .`` — terms are ``?var`` or integer
  entity ids; predicates are bare names, ``p1|p2`` alternation, and a
  ``+`` suffix for bounded transitive closure (``graph.PredPath``);
* ``OPTIONAL { ... }`` / ``MINUS { ... }`` groups of triple patterns
  (no nesting — same scoping subset match_pattern enforces);
* ``FILTER (expr)`` — ``expr`` is passed to Spark SQL verbatim after
  stripping ``?`` from variable references.

NOT supported (raise ``SparqlError``): IRIs, string literals, nested
groups, UNION, ORDER/LIMIT (call ``.orderBy``/``.limit`` on the returned
DataFrame), aggregates (use DataFrame aggregations on the result).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

from .graph import PredPath, match_pattern


class SparqlError(ValueError):
    """Raised for queries outside the supported subset (with position)."""


_TOKEN = re.compile(r"""
    (?P<var>\?\w+)
  | (?P<num>-?\d+)
  | (?P<kw>SELECT|DISTINCT|WHERE|OPTIONAL|MINUS|FILTER)\b
  | (?P<ident>[A-Za-z_]\w*)
  | (?P<op>!=|<=|>=|&&|[!=<>%,/-])   # FILTER-expression operators
  | (?P<punct>[{}.|+*()])
  | (?P<ws>\s+)
  | (?P<bad>.)
""", re.VERBOSE)


def _tokenize(q: str):
    out = []
    for m in _TOKEN.finditer(q):
        kind = m.lastgroup
        if kind == "ws":
            continue
        if kind == "bad":
            raise SparqlError(
                f"unexpected character {m.group()!r} at offset {m.start()}")
        out.append((kind, m.group(), m.start()))
    return out


class _P:
    def __init__(self, toks, text):
        self.toks, self.text, self.i = toks, text, 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None, len(self.text))

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def expect(self, value):
        kind, val, pos = self.next()
        if val != value:
            raise SparqlError(f"expected {value!r} at offset {pos}, got {val!r}")
        return val


def _parse_term(p: _P):
    kind, val, pos = p.next()
    if kind == "var":
        return val  # "?name" — match_pattern's own syntax
    if kind == "num":
        return int(val)
    raise SparqlError(
        f"expected ?var or integer entity id at offset {pos}, got {val!r}")


def _parse_pred(p: _P):
    kind, val, pos = p.peek()
    if kind == "var":
        p.next()
        return val
    if kind not in ("ident", "kw"):
        raise SparqlError(
            f"expected predicate at offset {pos}, got {val!r}")
    preds = [p.next()[1]]
    while p.peek()[1] == "|":
        p.next()
        kind, val, pos = p.next()
        if kind not in ("ident", "kw"):
            raise SparqlError(
                f"expected predicate after '|' at offset {pos}")
        preds.append(val)
    closure = False
    if p.peek()[1] == "+":
        p.next()
        closure = True
    if len(preds) == 1 and not closure:
        return preds[0]
    return PredPath(preds, closure=closure)


def _parse_triples(p: _P, stop_words):
    """Triple patterns until a stop word / '}' — returns the leg list."""
    legs = []
    while True:
        kind, val, pos = p.peek()
        if val == "}" or (kind == "kw" and val in stop_words) or kind is None:
            return legs
        s = _parse_term(p)
        pred = _parse_pred(p)
        o = _parse_term(p)
        legs.append((s, pred, o))
        if p.peek()[1] == ".":
            p.next()


def _parse_filter_expr(p: _P) -> str:
    p.expect("(")
    depth, start = 1, p.peek()[2]
    end = start
    while depth:
        kind, val, pos = p.next()
        if kind is None:
            raise SparqlError("unterminated FILTER expression")
        if val == "(":
            depth += 1
        elif val == ")":
            depth -= 1
            end = pos
        else:
            end = pos + len(val)
    return re.sub(r"\?(\w+)", r"\1", p.text[start:end]).strip()


def parse(query: str) -> dict:
    """Parse the SPARQL subset → kwargs for :func:`graph.match_pattern`
    plus the projection. Raises :class:`SparqlError` outside the subset."""
    for bad, msg in ((r"\bUNION\b", "UNION is not supported (run two "
                      "queries and .union the results)"),
                     (r"\bORDER\s+BY\b", "ORDER BY is not supported (call "
                      ".orderBy on the returned DataFrame)"),
                     (r"\bLIMIT\s+\d", "LIMIT is not supported (call "
                      ".limit on the returned DataFrame)")):
        if re.search(bad, query):
            raise SparqlError(msg)
    if re.search(r"<[^<>\s]+>", query):  # <http://…>-shaped token; bare
        # '<' comparisons inside FILTER exprs are fine
        raise SparqlError("IRIs are not supported — this engine's "
                          "entities are integer ids")
    if '"' in query or "'" in query:
        raise SparqlError("string literals are not supported")
    p = _P(_tokenize(query), query)
    p.expect("SELECT")
    if p.peek()[1] == "DISTINCT":
        p.next()  # solutions are set-semantics already
    select: list[str] | None = []
    if p.peek()[1] == "*":
        p.next()
        select = None
    else:
        while p.peek()[0] == "var":
            select.append(p.next()[1][1:])
        if not select:
            raise SparqlError("SELECT needs ?vars or *")
    p.expect("WHERE")
    p.expect("{")
    pattern, optional, minus, filters = [], [], [], []
    while True:
        kind, val, pos = p.peek()
        if val == "}":
            p.next()
            break
        if kind is None:
            raise SparqlError("unterminated WHERE group")
        if kind == "kw" and val == "OPTIONAL":
            p.next()
            p.expect("{")
            optional.append(_parse_triples(p, stop_words=()))
            p.expect("}")
        elif kind == "kw" and val == "MINUS":
            p.next()
            p.expect("{")
            minus.append(_parse_triples(p, stop_words=()))
            p.expect("}")
        elif kind == "kw" and val == "FILTER":
            p.next()
            filters.append(_parse_filter_expr(p))
        else:
            legs = _parse_triples(p, stop_words=("OPTIONAL", "MINUS",
                                                 "FILTER"))
            if not legs:
                raise SparqlError(f"unexpected token {val!r} at offset {pos}")
            pattern.extend(legs)
    kind, val, pos = p.peek()
    if kind is not None:
        raise SparqlError(f"trailing input at offset {pos}: {val!r}")
    return {
        "pattern": pattern,
        "optional": optional or None,
        "minus": minus or None,
        "filters": filters or None,
        "select": select,
    }


def sparql(triples: DataFrame, query: str, **kwargs) -> DataFrame:
    """Run a SPARQL-subset query over the triple table. Extra ``kwargs``
    (e.g. ``allow_product=True``) pass through to ``match_pattern``."""
    args = parse(query)
    return match_pattern(triples, args.pop("pattern"), **args, **kwargs)
