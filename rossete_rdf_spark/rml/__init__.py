from .ast import (  # noqa: F401
    JoinObject,
    LogicalSource,
    ObjectTerm,
    PredicateObjectMap,
    SubjectMap,
    Template,
    TriplesMap,
)
from .parser import parse_mapping_file, parse_mapping_text  # noqa: F401
