"""JSON-schema -> regex composer (analog of the schema-to-grammar
compilers inside xgrammar/outlines used by the reference's json mode).

Supports: object (properties/required/additionalProperties=False),
string (maxLength/enum/const), integer, number, boolean, null, array
(items/minItems/maxItems), enum/const at any level, $defs/$ref (local),
anyOf. Whitespace is emitted canonically (no freeform gaps) to keep the
automaton small, matching xgrammar's default compact style.
"""

from __future__ import annotations

import json
import re as _re
from typing import Any, Dict

_STR_INNER = r'(?:[^"\\\x00-\x1f]|\\["\\/bfnrt]|\\u[0-9a-fA-F]{4})'
STRING_RE = f'"{_STR_INNER}*"'
INTEGER_RE = r"-?(?:0|[1-9]\d*)"
NUMBER_RE = r"-?(?:0|[1-9]\d*)(?:\.\d+)?(?:[eE][+-]?\d+)?"
BOOL_RE = r"(?:true|false)"
NULL_RE = r"null"


def _lit(value: Any) -> str:
    return _re.escape(json.dumps(value))


def build_regex_from_schema(schema: Any) -> str:
    if isinstance(schema, str):
        schema = json.loads(schema)
    defs = schema.get("$defs", {}) if isinstance(schema, dict) else {}
    return _conv(schema, defs)


def _conv(s: Dict[str, Any], defs: Dict[str, Any]) -> str:
    if s is True or s == {}:
        # any JSON value (bounded nesting depth of 2 keeps the DFA finite)
        return _any_value(depth=2)
    if "$ref" in s:
        name = s["$ref"].split("/")[-1]
        return _conv(defs[name], defs)
    if "const" in s:
        return _lit(s["const"])
    if "enum" in s:
        return "(?:" + "|".join(_lit(v) for v in s["enum"]) + ")"
    if "anyOf" in s or "oneOf" in s:
        opts = s.get("anyOf", s.get("oneOf"))
        return "(?:" + "|".join(_conv(o, defs) for o in opts) + ")"
    t = s.get("type")
    if isinstance(t, list):
        return "(?:" + "|".join(
            _conv({**s, "type": tt}, defs) for tt in t) + ")"
    if t == "object" or (t is None and "properties" in s):
        return _obj(s, defs)
    if t == "array":
        item = _conv(s.get("items", {}), defs)
        lo = s.get("minItems", 0)
        hi = s.get("maxItems")
        if hi is None:
            body = (
                f"(?:{item}(?:,{item})*)?" if lo == 0
                else f"{item}" + f"(?:,{item})*"
            )
            if lo > 1:
                body = f"{item}" + f"(?:,{item})" + "{" + str(lo - 1) + ",}"
        else:
            if lo == 0:
                body = f"(?:{item}(?:,{item})" + "{0," + str(max(hi - 1, 0)) + "})?"
            else:
                body = f"{item}(?:,{item})" + "{" + str(lo - 1) + "," + str(hi - 1) + "}"
        return r"\[" + body + r"\]"
    if t == "string":
        if "pattern" in s:
            return f'"{s["pattern"]}"'
        if "maxLength" in s:
            return f'"{_STR_INNER}' + "{0," + str(s["maxLength"]) + '}"'
        return STRING_RE
    if t == "integer":
        return INTEGER_RE
    if t == "number":
        return NUMBER_RE
    if t == "boolean":
        return BOOL_RE
    if t == "null":
        return NULL_RE
    return _any_value(depth=2)


def _obj(s: Dict[str, Any], defs: Dict[str, Any]) -> str:
    props = s.get("properties", {})
    required = set(s.get("required", list(props.keys())))
    parts = []
    for name, sub in props.items():
        piece = f"{_lit(name)}:{_conv(sub, defs)}"
        parts.append((piece, name in required))
    if not parts:
        return r"\{\}"
    # canonical order, optional props may be skipped
    segs = []
    for i, (piece, req) in enumerate(parts):
        if req:
            segs.append((piece, True))
        else:
            segs.append((piece, False))
    # build: {p1,p2,...} with optional members removable (keep it simple:
    # optional members included iff present in sequence; commas handled by
    # building alternatives of "all subsets" only when few optionals)
    opt_count = sum(1 for _, r in segs if not r)
    if opt_count == 0 or opt_count > 4:
        body = ",".join(p for p, _ in segs)
        return r"\{" + body + r"\}"
    # enumerate subsets of optionals (<= 16 alternatives)
    from itertools import product

    alts = []
    for mask in product([True, False], repeat=opt_count):
        it = iter(mask)
        chosen = [p for p, r in segs if r or next(it)]
        if chosen:
            alts.append(",".join(chosen))
        else:
            alts.append("")
    body = "(?:" + "|".join(dict.fromkeys(alts)) + ")"
    return r"\{" + body + r"\}"


def _any_value(depth: int) -> str:
    scalar = f"(?:{STRING_RE}|{NUMBER_RE}|{BOOL_RE}|{NULL_RE})"
    val = scalar
    for _ in range(depth):
        arr = r"\[" + f"(?:{val}(?:,{val})*)?" + r"\]"
        obj = r"\{" + f"(?:{STRING_RE}:{val}(?:,{STRING_RE}:{val})*)?" + r"\}"
        val = f"(?:{scalar}|{arr}|{obj})"
    return val


# ---------------------------------------------------------------- EBNF path
# Recursive schemas ($ref cycles, unconstrained any-value of unbounded
# depth) cannot become a finite regex; they compile to a GBNF grammar for
# the pushdown engine instead (reference: xgrammar's
# json_schema-to-grammar compiler). Canonical compact whitespace, same as
# the regex path.

_EBNF_BASE = {
    "jstring": '"\\"" jstrchar* "\\""',
    "jstrchar": '[^"\\\\\\x00-\\x1f] | "\\\\" jescape',
    "jescape": '["\\\\/bfnrt] | "u" jhex jhex jhex jhex',
    "jhex": "[0-9a-fA-F]",
    "jint": '"-"? ("0" | [1-9] [0-9]*)',
    "jnumber": '"-"? ("0" | [1-9] [0-9]*) ("." [0-9]+)? '
               '([eE] [+-]? [0-9]+)?',
    "jbool": '"true" | "false"',
    "jnull": '"null"',
    "jvalue": 'jstring | jnumber | jbool | jnull | jobject | jarray',
    "jobject": '"{" (jstring ":" jvalue ("," jstring ":" jvalue)*)? "}"',
    "jarray": '"[" (jvalue ("," jvalue)*)? "]"',
}


def _gbnf_lit(value: Any) -> str:
    text = json.dumps(value)
    return '"' + text.replace("\\", "\\\\").replace('"', '\\"') + '"'


def build_ebnf_from_schema(schema: Any, root: str = "root") -> str:
    """JSON schema -> GBNF rules (handles recursion via named rules)."""
    if isinstance(schema, str):
        schema = json.loads(schema)
    defs = schema.get("$defs", {}) if isinstance(schema, dict) else {}
    rules: Dict[str, str] = {}
    used_base: set = set()
    in_progress: Dict[int, str] = {}
    counter = [0]

    def base(name: str) -> str:
        used_base.add(name)
        return name

    def conv(s: Any) -> str:
        if s is True or s == {} or s is None:
            base("jvalue")
            for dep in _EBNF_BASE:
                used_base.add(dep)
            return "jvalue"
        if "$ref" in s:
            dname = s["$ref"].split("/")[-1]
            rname = f"def-{dname}"
            if rname not in rules and id(defs[dname]) not in in_progress:
                in_progress[id(defs[dname])] = rname
                rules[rname] = "jnull"          # placeholder for recursion
                rules[rname] = conv(defs[dname])
            return rname
        if "const" in s:
            return _gbnf_lit(s["const"])
        if "enum" in s:
            return ("(" + " | ".join(_gbnf_lit(v) for v in s["enum"])
                    + ")")
        if "anyOf" in s or "oneOf" in s:
            opts = s.get("anyOf", s.get("oneOf"))
            return "(" + " | ".join(conv(o) for o in opts) + ")"
        t = s.get("type")
        if isinstance(t, list):
            return ("(" + " | ".join(conv({**s, "type": tt}) for tt in t)
                    + ")")
        if t == "object" or (t is None and "properties" in s):
            props = s.get("properties", {})
            required = set(s.get("required", list(props.keys())))
            if not props:
                if s.get("additionalProperties") is False:
                    return '"{}"'
                return base("jobject")
            parts = []
            for pname, sub in props.items():
                piece = f'{_gbnf_lit(pname)} ":" {conv(sub)}'
                parts.append((piece, pname in required))
            opt_count = sum(1 for _, r in parts if not r)
            if opt_count == 0 or opt_count > 4:
                # all-required (same fallback as the regex path when the
                # optional-subset enumeration would explode)
                body = ' "," '.join(p for p, _ in parts)
                return f'"{{" {body} "}}"'
            from itertools import product

            alts = []
            for mask in product([True, False], repeat=opt_count):
                it = iter(mask)
                chosen = [p for p, r in parts if r or next(it)]
                alts.append(' "," '.join(chosen) if chosen else '""')
            body = "(" + " | ".join(dict.fromkeys(alts)) + ")"
            return f'"{{" {body} "}}"'
        if t == "array":
            item = conv(s.get("items", {}) or True)
            lo = s.get("minItems", 0)
            hi = s.get("maxItems")
            if hi is None:
                inner = (f"({item} (\",\" {item})*)?" if lo == 0
                         else f"{item} (\",\" {item})*" if lo == 1
                         else f"{item}" + f" (\",\" {item})" + "{"
                         + str(lo - 1) + ",}")
            else:
                if lo == 0:
                    inner = (f"({item} (\",\" {item})" + "{0,"
                             + str(max(hi - 1, 0)) + "})?")
                else:
                    inner = (f"{item} (\",\" {item})" + "{" + str(lo - 1)
                             + "," + str(hi - 1) + "}")
            return f'"[" {inner} "]"'
        if t == "string":
            for dep in ("jstring", "jstrchar", "jescape", "jhex"):
                used_base.add(dep)
            return "jstring"
        if t == "integer":
            return base("jint")
        if t == "number":
            return base("jnumber")
        if t == "boolean":
            return base("jbool")
        if t == "null":
            return base("jnull")
        for dep in _EBNF_BASE:
            used_base.add(dep)
        return "jvalue"

    rules[root] = conv(schema)
    if "jvalue" in used_base or "jobject" in used_base \
            or "jarray" in used_base:
        used_base.update(_EBNF_BASE)
    lines = [f"{root} ::= {rules[root]}"]
    for name, body in rules.items():
        if name != root:
            lines.append(f"{name} ::= {body}")
    for name in _EBNF_BASE:
        if name in used_base:
            lines.append(f"{name} ::= {_EBNF_BASE[name]}")
    return "\n".join(lines)
