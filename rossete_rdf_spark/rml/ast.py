"""Logical-plan AST for RML mapping documents.

Node kinds mirror the reference's `Parts` enum (reference:
src/mappings/parts.rs:5-45) but as Python dataclasses that compile to Spark
Column expressions / DataFrame transforms instead of per-row string building.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

_PLACEHOLDER = re.compile(r"\{([^{}]*)\}")


@dataclass(frozen=True)
class Template:
    """An IRI/literal template "http://x/{field}" split into literal chunks
    and ordered field names (reference parses templates into a `{}`
    placeholder string + field list, src/parser.rs:409-442)."""

    pattern: str  # original pattern with {field} placeholders

    @property
    def fields(self) -> list[str]:
        return _PLACEHOLDER.findall(self.pattern)

    @property
    def chunks(self) -> list[str]:
        """Literal text between placeholders; len == len(fields) + 1."""
        return _PLACEHOLDER.split(self.pattern)[::2]


@dataclass(frozen=True)
class LogicalSource:
    """rml:logicalSource (reference: src/parser.rs:313-358)."""

    source: str
    fmt: str  # 'csv' | 'tsv' | 'json' | 'xml' | 'parquet' | 'table'
    iterator: str | None = None


@dataclass(frozen=True)
class SubjectMap:
    """rr:subjectMap: template (required), optional rr:class + rr:graphMap.

    The reference parses rr:graphMap but never uses it in materialisation
    (no GraphMap arm in src/materialiser.rs) — we store it and emit it as the
    `graph` column instead of dropping it.
    """

    template: Template
    rr_class: str | None = None
    graph: str | None = None


@dataclass(frozen=True)
class ObjectTerm:
    """A non-join objectMap: exactly one of reference / template /
    constant_string / constant_term set, plus optional datatype/termtype
    (reference: src/parser.rs:483-578, evaluation src/materialiser.rs:479-545).
    """

    reference: str | None = None
    template: Template | None = None
    constant_string: str | None = None  # quoted rr:constant -> IRI-wrapped
    constant_term: str | None = None  # unquoted rr:constant -> typed literal
    datatype: str | None = None  # CURIE or raw token; default xsd:string
    termtype: str | None = None  # 'IRI'/'BlankNode' -> IRI, else literal


@dataclass(frozen=True)
class JoinObject:
    """rr:parentTriplesMap + rr:joinCondition list (child, parent) pairs."""

    parent_map: str
    conditions: tuple[tuple[str, str], ...] = ()


@dataclass(frozen=True)
class PredicateObjectMap:
    predicate: str
    object: ObjectTerm | JoinObject


@dataclass
class TriplesMap:
    """One <#Name> block: exactly one logicalSource + one subjectMap
    (validated like reference src/mappings/maps.rs:29-56)."""

    name: str
    source: LogicalSource
    subject: SubjectMap
    poms: list[PredicateObjectMap] = field(default_factory=list)
    # prefixes are per mapping FILE, shared across that file's maps
    # (reference src/parser.rs:298-307); a prefix declared only in another
    # file is NOT visible -> raw-CURIE passthrough.
    prefixes: dict[str, str] = field(default_factory=dict)

    def referenced_fields(self) -> list[str]:
        """All source columns this map needs: subject-template fields,
        objectMap references/template fields, child-side join fields.
        Mirrors get_all_desired_fields (reference src/mappings/parts.rs:129-164).
        Order-stable, deduplicated."""
        out: list[str] = []

        def add(f: str) -> None:
            if f not in out:
                out.append(f)

        for f in self.subject.template.fields:
            add(f)
        for pom in self.poms:
            o = pom.object
            if isinstance(o, JoinObject):
                for child, _parent in o.conditions:
                    add(child)
            else:
                if o.reference:
                    add(o.reference)
                if o.template:
                    for f in o.template.fields:
                        add(f)
        return out
