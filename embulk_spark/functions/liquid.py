"""Liquid template engine (subset) for ``*.yml.liquid`` configs.

The reference renders config templates through the full Liquid gem
(reference EmbulkRunner.java:369-405: template data = ``{'env': ENV}``,
include filesystem resolves ``_<name>.yml.liquid`` next to the config).
Round 2 shipped only inline ``{{ var }}`` substitution; real-world
configs use conditionals and loops — e.g. switching an output by
``env.STAGE`` or stamping one filter block per column — so this module
implements the block-structured core of the language:

- output: ``{{ expr }}`` with the filters configs actually use:
  ``default``, ``upcase``, ``downcase``, ``append``, ``prepend``,
  ``replace``, ``size``, ``join``, ``split``, ``date`` (strftime over
  epoch numbers, ISO-ish strings, or ``now``/``today`` — the
  date-stamped-path workhorse)
- tags: ``if`` / ``elsif`` / ``else`` / ``endif``, ``unless`` /
  ``endunless``, ``for ... in ...`` (+ ``forloop.index`` /
  ``first`` / ``last`` / ``length``, ``else`` on empty), ``assign``,
  ``case`` / ``when``, ``comment`` / ``endcomment``, ``include``,
  ``capture`` / ``endcapture``, ``cycle`` (with optional group name),
  ``raw`` / ``endraw`` (verbatim passthrough), ``increment`` /
  ``decrement`` (their own counter namespace, Liquid semantics)
- conditions: ``== != > < >= <= contains`` over variables, quoted
  strings, numbers, ``true/false/nil/empty``, combined with
  ``and`` / ``or`` (Liquid's right-to-left evaluation)
- whitespace control ``{{-``/``-}}``/``{%-``/``-%}``

Unknown variables render empty / are falsy (Liquid lax mode), matching
what the reference's default error mode tolerates for ``env.*`` lookups.

This is a clean-room implementation of the public Liquid language
(shopify.github.io/liquid); no gem code consulted.
"""

from __future__ import annotations

import os
import re
from typing import Any

_TOKEN = re.compile(
    r"(\{\{-?.*?-?\}\}|\{%-?.*?-?%\})", re.DOTALL
)
_WS_L = re.compile(r"[ \t]*\Z")  # trailing ws of previous literal
_WS_R = re.compile(r"\A[ \t]*\r?\n?")  # leading ws of next literal


class LiquidError(ValueError):
    pass


# ---------------------------------------------------------------------------
# expression evaluation
# ---------------------------------------------------------------------------

_NUM = re.compile(r"-?\d+(\.\d+)?\Z")


def _lookup(path: str, scope: dict) -> Any:
    cur: Any = scope
    for part in path.split("."):
        if isinstance(cur, dict) and part in cur:
            cur = cur[part]
        elif isinstance(cur, (list, tuple, str)) and part == "size":
            cur = len(cur)
        else:
            return None
    return cur


def _atom(tok: str, scope: dict) -> Any:
    tok = tok.strip()
    if len(tok) >= 2 and tok[0] == tok[-1] and tok[0] in "'\"":
        return tok[1:-1]
    if tok == "true":
        return True
    if tok == "false":
        return False
    if tok in ("nil", "null"):
        return None
    if tok == "empty":
        return _EMPTY
    if _NUM.match(tok):
        return float(tok) if "." in tok else int(tok)
    return _lookup(tok, scope)


class _Empty:
    """Liquid's ``empty`` literal: equals '' / [] / {}."""

    def __eq__(self, other):
        return other is self or other in ("", [], {})

    def __ne__(self, other):
        return not self.__eq__(other)


_EMPTY = _Empty()

_CMP = re.compile(r"(==|!=|>=|<=|>|<|\bcontains\b)")


def _compare(expr: str, scope: dict) -> bool:
    m = _CMP.search(expr)
    if not m:
        v = _atom(expr, scope)
        return bool(v) if not isinstance(v, _Empty) else False
    lhs = _atom(expr[: m.start()], scope)
    rhs = _atom(expr[m.end():], scope)
    op = m.group(1)
    if op == "==":
        return lhs == rhs
    if op == "!=":
        return lhs != rhs
    if op == "contains":
        if isinstance(lhs, str):
            return isinstance(rhs, str) and rhs in lhs
        if isinstance(lhs, (list, tuple)):
            return rhs in lhs
        return False
    try:
        if op == ">":
            return lhs > rhs
        if op == "<":
            return lhs < rhs
        if op == ">=":
            return lhs >= rhs
        if op == "<=":
            return lhs <= rhs
    except TypeError:
        return False
    return False


def _condition(expr: str, scope: dict) -> bool:
    # Liquid evaluates multi-clause conditions RIGHT to LEFT with no
    # parentheses: `a or b and c` == `a or (b and c)`
    parts = re.split(r"\s+\b(and|or)\b\s+", expr.strip())
    result = _compare(parts[-1], scope)
    for i in range(len(parts) - 3, -1, -2):
        clause = _compare(parts[i], scope)
        if parts[i + 1] == "and":
            result = clause and result
        else:
            result = clause or result
    return result


def _apply_filter(value: Any, name: str, args: list[Any]) -> Any:
    if name == "default":
        blank = value is None or value == "" or value == [] or value is False
        return args[0] if blank and args else value
    if name == "upcase":
        return str(value or "").upper()
    if name == "downcase":
        return str(value or "").lower()
    if name == "append":
        return str(value or "") + str(args[0] if args else "")
    if name == "prepend":
        return str(args[0] if args else "") + str(value or "")
    if name == "replace":
        return str(value or "").replace(
            str(args[0] if args else ""), str(args[1] if len(args) > 1 else "")
        )
    if name == "size":
        return len(value) if isinstance(value, (str, list, tuple, dict)) else 0
    if name == "join":
        sep = str(args[0]) if args else " "
        return sep.join(str(x) for x in (value or []))
    if name == "split":
        return str(value or "").split(str(args[0]) if args else " ")
    if name == "date":
        return _date_filter(value, str(args[0]) if args else "%Y-%m-%d")
    raise LiquidError(f"unsupported liquid filter: {name!r}")


def _date_filter(value: Any, fmt: str) -> Any:
    """Liquid's ``date`` filter: strftime over ``now``/``today``, epoch
    numbers (UTC), or common ISO-ish strings. Unparseable input passes
    through unchanged (the gem's behavior)."""
    import datetime

    if value in ("now", "today"):
        # UTC, matching the epoch-number branch below — a naive local
        # now() would let {{ 'now' | date }} and an epoch column
        # disagree by a day near midnight (round-5 review fix)
        dt = datetime.datetime.now(datetime.timezone.utc)
    elif isinstance(value, bool):
        return value
    elif isinstance(value, (int, float)):
        dt = datetime.datetime.fromtimestamp(
            float(value), datetime.timezone.utc
        )
    elif isinstance(value, str):
        dt = None
        for f in (
            "%Y-%m-%d %H:%M:%S",
            "%Y-%m-%dT%H:%M:%S",
            "%Y-%m-%d",
            "%Y/%m/%d",
        ):
            try:
                dt = datetime.datetime.strptime(value, f)
                break
            except ValueError:
                continue
        if dt is None:
            if _NUM.match(value):
                dt = datetime.datetime.fromtimestamp(
                    float(value), datetime.timezone.utc
                )
            else:
                return value
    else:
        return value
    return dt.strftime(fmt)


def _output(expr: str, scope: dict) -> str:
    parts = _split_outside_quotes(expr, "|")
    value = _atom(parts[0], scope)
    for f in parts[1:]:
        f = f.strip()
        if ":" in f:
            name, _, argstr = f.partition(":")
            args = [
                _atom(raw, scope)
                for raw in _split_outside_quotes(argstr, ",")
                if raw.strip()
            ]
        else:
            name, args = f, []
        value = _apply_filter(value, name.strip(), args)
    if value is None or isinstance(value, _Empty):
        return ""
    if value is True:
        return "true"
    if value is False:
        return "false"
    if isinstance(value, float) and value.is_integer():
        return str(int(value))
    return str(value)


def _split_outside_quotes(s: str, sep: str) -> list[str]:
    out, buf, q = [], [], None
    for ch in s:
        if q:
            if ch == q:
                q = None
            buf.append(ch)
        elif ch in "'\"":
            q = ch
            buf.append(ch)
        elif ch == sep:
            out.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    out.append("".join(buf))
    return out


# ---------------------------------------------------------------------------
# parse: token stream → AST
# ---------------------------------------------------------------------------


_RAW_BLOCK = re.compile(
    r"\{%-?\s*raw\s*-?%\}(.*?)\{%-?\s*endraw\s*-?%\}", re.DOTALL
)


def _tokenize(text: str) -> list[tuple[str, str]]:
    """[(kind, payload)]: kind ∈ literal|output|tag. Whitespace-control
    markers trim the adjacent literal. ``{% raw %}…{% endraw %}`` blocks
    are lifted out FIRST — their content is a verbatim literal, never
    scanned for ``{{``/``{%``."""
    segments = _RAW_BLOCK.split(text)
    out: list[tuple[str, str]] = []
    for seg_i, seg in enumerate(segments):
        if seg_i % 2 == 1:  # raw-block payload: verbatim
            out.append(("literal", seg))
            continue
        out.extend(_tokenize_plain(seg))
    return out


def _tokenize_plain(text: str) -> list[tuple[str, str]]:
    out: list[tuple[str, str]] = []
    for piece in _TOKEN.split(text):
        if not piece:
            continue
        if piece.startswith("{{"):
            body = piece[2:-2]
            kind = "output"
        elif piece.startswith("{%"):
            body = piece[2:-2]
            kind = "tag"
        else:
            out.append(("literal", piece))
            continue
        if body.startswith("-"):
            body = body[1:]
            if out and out[-1][0] == "literal":
                out[-1] = ("literal", re.sub(r"\s+\Z", "", out[-1][1]))
        trim_next = body.endswith("-")
        if trim_next:
            body = body[:-1]
        out.append((kind, body.strip()))
        if trim_next:
            out.append(("trim_next", ""))
    # apply trim_next markers
    res: list[tuple[str, str]] = []
    trim = False
    for kind, payload in out:
        if kind == "trim_next":
            trim = True
            continue
        if trim and kind == "literal":
            payload = re.sub(r"\A\s+", "", payload)
        trim = False
        res.append((kind, payload))
    return res


_BLOCK_END = {
    "if": "endif",
    "unless": "endunless",
    "for": "endfor",
    "case": "endcase",
    "comment": "endcomment",
}


def _parse(tokens: list, i: int, until: set[str]) -> tuple[list, int, str]:
    """Parse until one of ``until`` tag keywords; returns (nodes, next
    index, the terminating keyword)."""
    nodes: list = []
    while i < len(tokens):
        kind, payload = tokens[i]
        if kind == "literal":
            nodes.append(("lit", payload))
            i += 1
            continue
        if kind == "output":
            nodes.append(("out", payload))
            i += 1
            continue
        word = payload.split(None, 1)[0] if payload else ""
        rest = payload[len(word):].strip()
        if word in until:
            return nodes, i + 1, word
        if word in ("if", "unless"):
            branches = []  # [(cond or None, body)]
            cond = rest
            while True:
                body, i, term = _parse(
                    tokens, i + 1, {"elsif", "else", _BLOCK_END[word]}
                )
                branches.append((cond, body))
                if term == _BLOCK_END[word]:
                    break
                if term == "else":
                    cond = None
                    # re-parse from the else body; i already past 'else'
                    body, i, term2 = _parse(tokens, i, {_BLOCK_END[word]})
                    branches.append((None, body))
                    break
                # elsif: grab its condition from the token we consumed
                cond = tokens[i - 1][1].split(None, 1)[1].strip()
                i -= 1  # _parse consumed the elsif tag; loop re-enters
            nodes.append((word, branches))
            continue
        if word == "for":
            m = re.match(r"(\w+)\s+in\s+(.+)\Z", rest)
            if not m:
                raise LiquidError(f"malformed for tag: {payload!r}")
            body, i, term = _parse(tokens, i + 1, {"endfor", "else"})
            empty_body: list = []
            if term == "else":
                empty_body, i, _ = _parse(tokens, i, {"endfor"})
            nodes.append(("for", (m.group(1), m.group(2), body, empty_body)))
            continue
        if word == "case":
            subject = rest
            whens = []  # [(values, body)]
            default: list = []
            # skip literal whitespace until first when
            _, i, term = _parse(tokens, i + 1, {"when", "else", "endcase"})
            while term == "when":
                vals = tokens[i - 1][1].split(None, 1)[1]
                body, i, term = _parse(tokens, i, {"when", "else", "endcase"})
                whens.append((vals, body))
            if term == "else":
                default, i, _ = _parse(tokens, i, {"endcase"})
            nodes.append(("case", (subject, whens, default)))
            continue
        if word == "comment":
            _, i, _ = _parse(tokens, i + 1, {"endcomment"})
            continue
        if word == "assign":
            m = re.match(r"(\w+)\s*=\s*(.+)\Z", rest)
            if not m:
                raise LiquidError(f"malformed assign tag: {payload!r}")
            nodes.append(("assign", (m.group(1), m.group(2))))
            i += 1
            continue
        if word == "capture":
            if not re.match(r"\w+\Z", rest):
                raise LiquidError(f"malformed capture tag: {payload!r}")
            body, i, _ = _parse(tokens, i + 1, {"endcapture"})
            nodes.append(("capture", (rest, body)))
            continue
        if word == "cycle":
            nodes.append(("cycle", rest))
            i += 1
            continue
        if word in ("increment", "decrement"):
            if not re.match(r"\w+\Z", rest):
                raise LiquidError(f"malformed {word} tag: {payload!r}")
            nodes.append((word, rest))
            i += 1
            continue
        if word == "include":
            m = re.match(r"(?:'([^']+)'|\"([^\"]+)\")\Z", rest)
            if not m:
                raise LiquidError(f"malformed include tag: {payload!r}")
            nodes.append(("include", m.group(1) or m.group(2)))
            i += 1
            continue
        raise LiquidError(f"unknown liquid tag: {word!r}")
    return nodes, i, ""


# ---------------------------------------------------------------------------
# render
# ---------------------------------------------------------------------------


def _render_nodes(
    nodes: list, scope: dict, include_dir: str | None, depth: int
) -> str:
    out: list[str] = []
    for node in nodes:
        kind, payload = node
        if kind == "lit":
            out.append(payload)
        elif kind == "out":
            out.append(_output(payload, scope))
        elif kind in ("if", "unless"):
            for cond, body in payload:
                hit = True if cond is None else _condition(cond, scope)
                if kind == "unless" and cond is not None:
                    hit = not hit
                if hit:
                    out.append(
                        _render_nodes(body, scope, include_dir, depth)
                    )
                    break
        elif kind == "for":
            var, coll_expr, body, empty_body = payload
            coll = _atom(coll_expr, scope)
            if isinstance(coll, dict):
                coll = list(coll.items())
            if not coll:
                out.append(
                    _render_nodes(empty_body, scope, include_dir, depth)
                )
                continue
            coll = list(coll)
            for idx, item in enumerate(coll):
                inner = dict(scope)
                inner[var] = item
                inner["forloop"] = {
                    "index": idx + 1,
                    "index0": idx,
                    "first": idx == 0,
                    "last": idx == len(coll) - 1,
                    "length": len(coll),
                }
                out.append(_render_nodes(body, inner, include_dir, depth))
        elif kind == "case":
            subject, whens, default = payload
            sval = _atom(subject, scope)
            hit = False
            for vals, body in whens:
                opts = [
                    _atom(v, scope)
                    for v in _split_outside_quotes(vals, ",")
                    if v.strip()
                ]
                if any(sval == o for o in opts):
                    out.append(
                        _render_nodes(body, scope, include_dir, depth)
                    )
                    hit = True
                    break
            if not hit:
                out.append(
                    _render_nodes(default, scope, include_dir, depth)
                )
        elif kind == "assign":
            name, expr = payload
            if len(_split_outside_quotes(expr, "|")) > 1:
                scope[name] = _output(expr, scope)  # filtered → string
            else:
                scope[name] = _atom(expr, scope)
        elif kind == "capture":
            name, body = payload
            scope[name] = _render_nodes(body, scope, include_dir, depth)
        elif kind == "cycle":
            # `cycle ['group':] v1, v2, …` — the counter lives in the
            # render-level state dict (shared by reference through the
            # per-iteration scope copies), keyed by the group name or,
            # absent one, by the value list itself (Liquid semantics).
            head, sep, tail = payload.partition(":")
            if sep and re.match(r"\s*(['\"]?)\w+\1\s*\Z", head):
                group, vals_src = head.strip().strip("'\""), tail
            else:
                group, vals_src = payload, payload
            vals = [
                _atom(v, scope)
                for v in _split_outside_quotes(vals_src, ",")
                if v.strip()
            ]
            if vals:
                counters = scope["__liquid_state__"].setdefault("cycle", {})
                n = counters.get(group, 0)
                counters[group] = n + 1
                v = vals[n % len(vals)]
                out.append("" if v is None else str(v))
        elif kind in ("increment", "decrement"):
            counters = scope["__liquid_state__"].setdefault("counter", {})
            if kind == "increment":  # emits 0,1,2,… then bumps
                v = counters.get(payload, 0)
                counters[payload] = v + 1
            else:  # decrement emits -1,-2,… (Liquid's off-by-one)
                v = counters.get(payload, 0) - 1
                counters[payload] = v
            out.append(str(v))
        elif kind == "include":
            if depth > 5:
                raise LiquidError("liquid include nesting too deep")
            fp = os.path.join(
                include_dir or ".", f"_{payload}.yml.liquid"
            )
            with open(fp) as f:
                out.append(
                    render(f.read(), scope, include_dir, depth=depth + 1)
                )
    return "".join(out)


def render(
    text: str,
    scope: dict,
    include_dir: str | None = None,
    *,
    depth: int = 0,
) -> str:
    """Render ``text`` with ``scope`` as the variable root."""
    tokens = _tokenize(text)
    nodes, i, term = _parse(tokens, 0, set())
    if term:
        raise LiquidError(f"unexpected {term!r} tag")
    root = dict(scope)
    # shared mutable render state (cycle / increment counters): the
    # nested dict rides by reference through every per-iteration scope
    # copy, so counters advance across loop iterations
    root.setdefault("__liquid_state__", {})
    return _render_nodes(nodes, root, include_dir, depth)
