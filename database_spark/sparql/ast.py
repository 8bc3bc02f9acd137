"""SPARQL AST / algebra nodes.

The reference parses with a JavaCC grammar into ``ASTQueryContainer``,
then builds a ``QueryRoot`` AST (`Bigdata2ASTSPARQLParser.java:326`,
`BigdataExprBuilder.java`).  Ours is a plain-dataclass AST produced by
:mod:`database_spark.sparql.parser`; group-graph-pattern nodes double as
the algebra consumed by the compiler (Join/LeftJoin/Union/Minus/Extend
per SPARQL 1.1 spec §18.2 — the reference's equivalents are the
JoinGroupNode/UnionNode AST + `AST2BOpUtility.java` conversion).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..terms import Term


# --------------------------------------------------------------- expressions
@dataclass(frozen=True)
class Var:
    name: str


@dataclass(frozen=True)
class Const:
    term: Term


@dataclass(frozen=True)
class Op:
    """Operators: || && ! = != < > <= >= + - * / neg"""

    op: str
    args: tuple


@dataclass(frozen=True)
class FuncCall:
    """Builtin or cast; name is the uppercase builtin name or full IRI."""

    name: str
    args: tuple


@dataclass(frozen=True)
class SidExpr:
    """Statement identifier of an (asserted) triple — the value of an
    RDF* embedded pattern << s p o >> (reference: SIDs mode,
    RDF/rdf/spo/SPO.java statement identifiers)."""

    s: object
    p: object
    o: object


@dataclass(frozen=True)
class ExistsExpr:
    group: "GroupPattern"
    negated: bool


@dataclass(frozen=True)
class AggExpr:
    name: str  # COUNT SUM AVG MIN MAX SAMPLE GROUP_CONCAT
    expr: object | None  # None => COUNT(*)
    distinct: bool = False
    separator: str = " "


@dataclass(frozen=True)
class InExpr:
    expr: object
    options: tuple
    negated: bool


# ------------------------------------------------------------ property paths
@dataclass(frozen=True)
class PathIRI:
    iri: Term


@dataclass(frozen=True)
class PathInv:
    path: object


@dataclass(frozen=True)
class PathSeq:
    parts: tuple


@dataclass(frozen=True)
class PathAlt:
    parts: tuple


@dataclass(frozen=True)
class PathMod:
    path: object
    mod: str  # '*', '+', '?'


@dataclass(frozen=True)
class PathNeg:
    # negated property set: forward iris and inverse iris
    forward: tuple
    inverse: tuple


# ----------------------------------------------------------------- patterns
@dataclass
class TriplePattern:
    s: object  # Var | Const
    p: object  # Var | Const | path node
    o: object


@dataclass
class GroupPattern:
    elements: list = field(default_factory=list)


@dataclass
class OptionalPattern:
    group: GroupPattern


@dataclass
class UnionPattern:
    groups: list


@dataclass
class MinusPattern:
    group: GroupPattern


@dataclass
class GraphPattern:
    graph: object  # Var | Const
    group: GroupPattern


@dataclass
class ServicePattern:
    endpoint: object
    group: GroupPattern
    silent: bool = False


@dataclass
class FilterPattern:
    expr: object


@dataclass
class BindPattern:
    expr: object
    var: Var


@dataclass
class ValuesPattern:
    vars: list
    rows: list  # list of tuples of Term|None (None = UNDEF)
    #: True for the query-level (trailing) VALUES / BINDINGS clause.
    #: The reference feeds those in as *exogenous* initial solutions:
    #: joins see them, but FILTER/BIND expressions must not (the
    #: ASTBottomUpOptimizer renames such vars to anonymous ones —
    #: "they are joined in last, so they're not visible in any scope").
    exogenous: bool = False


@dataclass
class SubSelect:
    query: "SelectQuery"


@dataclass
class NamedSubqueryInclude:
    """INCLUDE %name — join a named solution set (blazegraph extension;
    reference: NamedSubqueryInclude.java, HTreeNamedSubqueryOp.java)."""

    name: str


# ------------------------------------------------------------------ queries
@dataclass
class SelectQuery:
    projections: list  # [(Var, expr|None)]; [] = SELECT *
    where: GroupPattern
    distinct: bool = False
    reduced: bool = False
    group_by: list = field(default_factory=list)  # [expr | (expr, Var)]
    having: list = field(default_factory=list)
    order_by: list = field(default_factory=list)  # [(expr, ascending)]
    limit: int | None = None
    offset: int | None = None
    values: ValuesPattern | None = None
    dataset: list = field(default_factory=list)  # FROM / FROM NAMED
    named_subqueries: list = field(default_factory=list)  # [(name, SelectQuery)]


@dataclass
class AskQuery:
    where: GroupPattern
    dataset: list = field(default_factory=list)


@dataclass
class ConstructQuery:
    template: list  # [TriplePattern]
    where: GroupPattern
    limit: int | None = None
    offset: int | None = None
    dataset: list = field(default_factory=list)


@dataclass
class DescribeQuery:
    targets: list  # [Var | Const]
    where: GroupPattern | None


# ------------------------------------------------------------------- update
@dataclass
class InsertData:
    triples: list  # [(Term, Term, Term, Term|None)]


@dataclass
class DeleteData:
    triples: list


@dataclass
class Modify:
    """DELETE/INSERT ... WHERE (AST2BOpUpdate.java:629-903)."""

    delete_templates: list
    insert_templates: list
    where: GroupPattern
    with_graph: Term | None = None
    #: USING / USING NAMED dataset for the WHERE clause:
    #: list of ("default"|"named", Term); None = no USING clause.
    #: When present it REPLACES the WITH graph for pattern matching
    #: (SPARQL 1.1 Update §3.1.3; reference: dataset node handling in
    #: AST2BOpUpdate.convertDeleteInsert).
    using: list | None = None


@dataclass
class LoadUpdate:
    source: Term
    graph: Term | None = None
    silent: bool = False


@dataclass
class ClearUpdate:
    target: object  # 'DEFAULT' | 'NAMED' | 'ALL' | Term
    silent: bool = False


@dataclass
class CreateUpdate:
    graph: Term
    silent: bool = False


@dataclass
class DropUpdate:
    target: object
    silent: bool = False


@dataclass
class CopyMoveAdd:
    op: str  # COPY MOVE ADD
    src: object  # 'DEFAULT' | Term
    dst: object
    silent: bool = False


@dataclass
class EntailmentsUpdate:
    """Blazegraph entailment-management verbs (AST2BOpUpdate.java:400-458
    CreateEntailments/DropEntailments/EnableEntailments/DisableEntailments).

    op: 'CREATE' computes the closure now, 'DROP' strips inferred
    statements, 'ENABLE'/'DISABLE' toggle automatic maintenance on
    subsequent updates."""

    op: str  # CREATE DROP ENABLE DISABLE
