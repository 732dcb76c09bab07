"""RML mapping-document parser (Turtle subset), pure Python, driver-side.

Clean-room re-implementation of the behaviors of the reference parser
(reference: src/parser.rs) — mapping documents are KBs, so this never needs
distribution; it produces the TriplesMap AST that the Spark compiler turns
into a logical plan.

Behaviors mirrored (each cited):
- comment stripping that protects '#' inside <...> IRIs (src/parser.rs:111-138)
- @prefix / @PREFIX and @base (base stored under the empty prefix)
  (src/parser.rs:178-223)
- map headers <#Name>; `a rr:TriplesMap` declarations skipped
  (src/parser.rs:224-232, 281-283)
- logicalSource keys rml:source / rml:iterator / rml:referenceFormulation,
  with format sniffed from the ql:* token or the file extension; explicit
  referenceFormulation wins over extension (src/parser.rs:313-358,
  src/mappings/others.rs:39-51)
- subjectMap: rr:template (>=1 placeholder required), rr:class, rr:graphMap
  with rr:constant (src/parser.rs:360-407, 436-439)
- predicateObjectMap: rr:predicate + objectMap members rml:reference,
  rr:constant (quoted string vs bare term distinguished by quotes,
  src/parser.rs:502-509), rr:datatype, rr:termType, rr:template,
  rr:parentTriplesMap <#Other>, rr:joinCondition [rr:child; rr:parent]
  (src/parser.rs:444-578)
- prefixes are per-file and shared by that file's maps (src/parser.rs:298-307)
"""

from __future__ import annotations

import os
import re

from .ast import (
    JoinObject,
    LogicalSource,
    ObjectTerm,
    PredicateObjectMap,
    SubjectMap,
    Template,
    TriplesMap,
)


def remove_comments(line: str) -> str:
    """Drop everything after an un-bracketed, un-quoted '#'.

    '#' inside <...> (IRIs like <http://x#y> or <#Name>) or "..." survives.
    (reference: src/parser.rs:111-138. Deliberate divergence, pinned in
    tests: the reference does NOT protect '#' inside quoted strings; we do,
    and we skip backslash-escaped quotes when toggling the in-string state
    so a value like "a\\"b #c" is not truncated at the '#'.)
    """
    in_iri = False
    in_str = False
    for i, ch in enumerate(line):
        if ch == '"' and not in_iri:
            nbs = 0
            j = i - 1
            while j >= 0 and line[j] == "\\":
                nbs += 1
                j -= 1
            if not (in_str and nbs % 2 == 1):
                in_str = not in_str
        elif ch == "<" and not in_str:
            in_iri = True
        elif ch == ">" and not in_str:
            in_iri = False
        elif ch == "#" and not in_iri and not in_str:
            return line[:i]
    return line


_TOKEN = re.compile(
    r"""
      "(?:[^"\\]|\\.)*"      # quoted string (kept with quotes)
    | <[^>]*>                # IRI ref (kept with angle brackets)
    | \[ | \] | ; | \. | ,   # structural
    | [^\s;\[\],]+           # bare word (may contain ':' and trailing-free '.')
    """,
    re.VERBOSE,
)


def tokenize(text: str) -> list[str]:
    toks: list[str] = []
    for raw_line in text.splitlines():
        line = remove_comments(raw_line)
        for m in _TOKEN.finditer(line):
            tok = m.group(0)
            # A bare word ending in '.' is a statement terminator glued on
            # (e.g. `ql:CSV.`): split it.
            while (
                tok
                and tok.endswith(".")
                and not tok.startswith('"')
                and not tok.startswith("<")
                and tok != "."
            ):
                toks.append(tok[:-1]) if len(tok) > 1 else None
                tok = "."
                break
            if tok:
                toks.append(tok)
    return [t for t in toks if t]


class _TokStream:
    def __init__(self, toks: list[str]):
        self.toks = toks
        self.i = 0

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> str:
        t = self.toks[self.i]
        self.i += 1
        return t

    def eof(self) -> bool:
        return self.i >= len(self.toks)


def _unquote(tok: str) -> str:
    if len(tok) >= 2 and tok[0] == '"' and tok[-1] == '"':
        return tok[1:-1].replace('\\"', '"').replace("\\\\", "\\")
    return tok


def _unangle(tok: str) -> str:
    if len(tok) >= 2 and tok[0] == "<" and tok[-1] == ">":
        return tok[1:-1]
    return tok


def _parse_block(ts: _TokStream) -> list[tuple[str, list]]:
    """Parse `[ pred obj(s) ; pred obj(s) ; ... ]` into (pred, values) pairs.

    A value is a token string or a nested block (list of pairs)."""
    assert ts.next() == "["
    pairs: list[tuple[str, list]] = []
    while not ts.eof():
        tok = ts.peek()
        if tok == "]":
            ts.next()
            break
        if tok in (";", ".", ","):
            ts.next()
            continue
        pred = ts.next()
        values: list = []
        while not ts.eof() and ts.peek() not in (";", "]", "."):
            if ts.peek() == "[":
                values.append(_parse_block(ts))
            elif ts.peek() == ",":
                ts.next()
            else:
                values.append(ts.next())
        pairs.append((pred, values))
    return pairs


_FORMATS = (
    ("csv", "csv"),
    ("tsv", "tsv"),
    ("json", "json"),
    ("xpath", "xml"),
    ("xml", "xml"),
    ("parquet", "parquet"),
)


def _sniff_format(ref_formulation: str | None, source: str) -> str:
    # Explicit ql:* token wins; else extension (reference:
    # src/mappings/others.rs:39-51). The reference resolves a CSV source with
    # a TSV formulation in favor of the formulation (src/parser.rs:337-342).
    for key, fmt in _FORMATS:
        if ref_formulation and key in ref_formulation.lower():
            return fmt
    ext = os.path.splitext(source)[1].lower().lstrip(".")
    for key, fmt in _FORMATS:
        if ext == key:
            return fmt
    return "table"  # a registered table / parquet dir


def _first(pairs: list, key_suffix: str):
    for k, v in pairs:
        if k.lower().endswith(key_suffix.lower()):
            return v
    return None


def _parse_logical_source(pairs: list) -> LogicalSource:
    src_v = _first(pairs, ":source")
    it_v = _first(pairs, ":iterator")
    rf_v = _first(pairs, ":referenceFormulation")
    source = _unquote(src_v[0]) if src_v else ""
    iterator = _unquote(it_v[0]) if it_v else None
    rf = rf_v[0] if rf_v else None
    return LogicalSource(source=source, fmt=_sniff_format(rf, source), iterator=iterator)


def _parse_subject_map(pairs: list, map_name: str) -> SubjectMap:
    tmpl_v = _first(pairs, ":template")
    if not tmpl_v:
        raise ValueError(f"subjectMap of {map_name} lacks rr:template")
    template = Template(_unquote(tmpl_v[0]))
    if not template.fields:
        # reference requires >=1 placeholder in subject templates
        # (src/parser.rs:436-439)
        raise ValueError(f"subject template of {map_name} has no {{field}}")
    cls_v = _first(pairs, ":class")
    graph = None
    g_v = _first(pairs, ":graphMap") or _first(pairs, ":graph")
    if g_v and isinstance(g_v[0], list):
        c = _first(g_v[0], ":constant")
        if c:
            graph = _unangle(_unquote(c[0]))
    return SubjectMap(
        template=template,
        rr_class=cls_v[0] if cls_v else None,
        graph=graph,
    )


def _parse_object_map(pairs: list) -> ObjectTerm | JoinObject:
    parent_v = _first(pairs, ":parentTriplesMap")
    if parent_v:
        # Collect EVERY rr:joinCondition pair — repeated
        # `rr:joinCondition [..]; rr:joinCondition [..]` entries are the
        # standard R2RML form for composite join keys; the reference collects
        # them all and ANDs them (src/materialiser.rs:721-735).
        conds: list[tuple[str, str]] = []
        for k, values in pairs:
            if not k.lower().endswith(":joincondition"):
                continue
            for blk in values:
                if isinstance(blk, list):
                    child_v = _first(blk, ":child")
                    par_v = _first(blk, ":parent")
                    if child_v and par_v:
                        conds.append((_unquote(child_v[0]), _unquote(par_v[0])))
        return JoinObject(
            parent_map=_unangle(parent_v[0]).lstrip("#"),
            conditions=tuple(conds),
        )

    ref_v = _first(pairs, ":reference")
    tmpl_v = _first(pairs, ":template")
    const_v = _first(pairs, ":constant")
    dt_v = _first(pairs, ":datatype")
    tt_v = _first(pairs, ":termType")
    constant_string = constant_term = None
    if const_v:
        tok = const_v[0]
        # quoted -> "ConstantString" (IRI-wrapped on output); bare ->
        # "ConstantTerm" (prefix-expanded, emitted as typed literal)
        # (reference: src/parser.rs:502-509; src/materialiser.rs:516-527)
        if tok.startswith('"'):
            constant_string = _unquote(tok)
        else:
            constant_term = _unangle(tok)
    return ObjectTerm(
        reference=_unquote(ref_v[0]) if ref_v else None,
        template=Template(_unquote(tmpl_v[0])) if tmpl_v else None,
        constant_string=constant_string,
        constant_term=constant_term,
        datatype=dt_v[0] if dt_v else None,
        termtype=(_unangle(tt_v[0]) if tt_v else None),
    )


def parse_mapping_text(text: str, base_dir: str | None = None) -> list[TriplesMap]:
    ts = _TokStream(tokenize(text))
    prefixes: dict[str, str] = {}
    maps: list[TriplesMap] = []

    cur_name: str | None = None
    cur_source: LogicalSource | None = None
    cur_subject: SubjectMap | None = None
    cur_poms: list[PredicateObjectMap] = []

    def flush():
        nonlocal cur_name, cur_source, cur_subject, cur_poms
        if cur_name is None:
            return
        if cur_source is None or cur_subject is None:
            # reference requires exactly one logicalSource and one subjectMap
            # (src/mappings/maps.rs:29-56)
            raise ValueError(f"map {cur_name}: missing logicalSource or subjectMap")
        src = cur_source
        if base_dir and src.source and not os.path.isabs(src.source):
            src = LogicalSource(
                source=os.path.normpath(os.path.join(base_dir, src.source)),
                fmt=src.fmt,
                iterator=src.iterator,
            )
        maps.append(
            TriplesMap(
                name=cur_name,
                source=src,
                subject=cur_subject,
                poms=cur_poms,
                prefixes=prefixes,  # shared per-file (src/parser.rs:298-307)
            )
        )
        cur_name, cur_source, cur_subject, cur_poms = None, None, None, []

    while not ts.eof():
        tok = ts.next()
        low = tok.lower()
        if low in ("@prefix",):
            name = ts.next()  # e.g. rr:
            iri = _unangle(ts.next())
            prefixes[name] = iri
        elif low == "@base":
            iri = _unangle(ts.next())
            prefixes[""] = iri  # stored under empty prefix (src/parser.rs:209-223)
        elif tok.startswith("<#"):
            flush()
            cur_name = _unangle(tok).lstrip("#")
        elif low == "a":
            # `a rr:TriplesMap` declaration — skip the class token
            if not ts.eof():
                ts.next()
        elif low.endswith(":logicalsource"):
            if ts.peek() == "[":
                if cur_source is not None:
                    # reference hard-errors on a repeated logicalSource
                    # (src/mappings/maps.rs:29-56) — last-wins would silently
                    # materialise from the wrong table
                    raise ValueError(
                        f"map {cur_name or '?'}: more than one rml:logicalSource"
                    )
                cur_source = _parse_logical_source(_parse_block(ts))
        elif low.endswith(":subjectmap"):
            if ts.peek() == "[":
                if cur_subject is not None:
                    # exactly one subjectMap per map (src/mappings/maps.rs:29-56)
                    raise ValueError(
                        f"map {cur_name or '?'}: more than one rr:subjectMap"
                    )
                cur_subject = _parse_subject_map(_parse_block(ts), cur_name or "?")
        elif low.endswith(":predicateobjectmap"):
            if ts.peek() == "[":
                pairs = _parse_block(ts)
                pred_v = _first(pairs, ":predicate")
                om_v = _first(pairs, ":objectMap")
                if pred_v and om_v and isinstance(om_v[0], list):
                    cur_poms.append(
                        PredicateObjectMap(
                            predicate=pred_v[0],
                            object=_parse_object_map(om_v[0]),
                        )
                    )
        # structural tokens (. ; etc.) fall through

    flush()
    return maps


def parse_mapping_file(path: str, base_dir: str | None = None) -> list[TriplesMap]:
    with open(path, encoding="utf-8") as f:
        return parse_mapping_text(f.read(), base_dir=base_dir)


def parse_mapping_dir(dirpath: str, base_dir: str | None = None) -> list[TriplesMap]:
    """Parse every .ttl/.rml file in a directory (reference parses one file
    per thread, src/main.rs:162-219 — driver-side Python is instant here)."""
    maps: list[TriplesMap] = []
    for fn in sorted(os.listdir(dirpath)):
        if fn.endswith((".ttl", ".rml")):
            maps.extend(parse_mapping_file(os.path.join(dirpath, fn), base_dir=base_dir))
    return maps
