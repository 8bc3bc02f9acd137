"""GOM (Generic Object Model) veneer: object-oriented access to RDF.

Reference surface: ``bigdata-core/bigdata-gom/src/java/com/bigdata/gom/
om/IObjectManager.java`` + ``ObjectManager.java`` (canonical GPO cache,
materialization, named roots, native transactions) and ``gpo/IGPO.java``
+ ``GPO.java`` (per-object property/link access with staged mutations).

Shape: an ``ObjectManager`` wraps a ``SparqlEngine``; ``GPO`` objects
are canonical per resource (one Python object per IRI within an OM,
like the reference's weak-value cache), lazily *materialized* — one
bounded scan collects the object's forward statements (s = id) and
reverse links (o = id), the same per-resource set the reference's
DESCRIBE-based materialization ships.  Mutations stage on the GPO and
flush as ONE engine commit at ``commit_native_transaction`` (or
immediately outside a transaction), so truth maintenance and changeset
listeners see exactly the reference's flush-batch granularity
(``ObjectMgrModel.flushStatementBuffers``).

Driver-materialization contract: only per-object statement sets are
collected (an object's properties + links — protocol-sized, exactly
what the reference materializes per GPO); queries stay DataFrames via
``evaluate``.
"""

from __future__ import annotations

import uuid
import weakref

from pyspark.sql import functions as F

from . import terms as T
from .terms import Term

GPO_NAMESPACE = "gpo:"
#: predicate used by save()/recall() named roots (ObjectMgrModel keys
#: values under a dedicated naming statement)
NAME_PROPERTY = "http://www.bigdata.com/gom#name"


class GenericSkinRegistry:
    """Resolve a GPO to a typed skin (reference ``gom/skin/
    GenericSkinRegistry.java``): applications register skin classes
    (ctor takes the GPO, like the reference's single-``IGenericSkin``
    constructor contract); ``GPO.get_skin(cls)`` returns a cached
    instance, minting through the registry so a registered SUBCLASS can
    serve requests for its base class (``getImplementationClass``)."""

    _classes: list = []

    @classmethod
    def register_class(cls, skin_cls: type) -> None:
        if not callable(skin_cls):
            raise TypeError("skin class must be constructible from a GPO")
        if skin_cls not in cls._classes:
            cls._classes.append(skin_cls)

    @classmethod
    def get_implementation_class(cls, requested: type) -> type:
        """Most recently registered class satisfying the request."""
        for skin_cls in reversed(cls._classes):
            if issubclass(skin_cls, requested):
                return skin_cls
        raise KeyError(f"no skin registered for {requested!r}")


class GPO:
    """Generic physical object (reference ``gpo/GPO.java``)."""

    def __init__(self, om: "ObjectManager", iri: str):
        self.om = om
        self.iri = iri
        self._forward: dict | None = None  # prop iri -> [Term]
        self._reverse: dict | None = None  # prop iri -> [subject iri]
        self._skins: list = []  # minted skin cache (GPO.getSkin)

    # -------------------------------------------------------------- skins
    def get_skin(self, cls: type):
        """Typed view of this object (``GPO.getSkin``): reuse a cached
        skin assignable to ``cls``, else mint one via the registry."""
        for s in self._skins:
            if isinstance(s, cls):
                return s
        impl = GenericSkinRegistry.get_implementation_class(cls)
        s = impl(self)
        self._skins.append(s)
        return s

    # ---------------------------------------------------- materialization
    def materialize(self) -> "GPO":
        if self._forward is None:
            self.om.materialize(self)
        return self

    def _fwd(self) -> dict:
        self.materialize()
        return self._forward

    def _rev(self) -> dict:
        self.materialize()
        return self._reverse

    # ------------------------------------------------------------- reads
    def get_value(self, prop: str) -> Term | None:
        vals = self._fwd().get(prop)
        return vals[0] if vals else None

    def get_values(self, prop: str) -> list:
        return list(self._fwd().get(prop, []))

    def is_bound(self, prop: str) -> bool:
        return bool(self._fwd().get(prop))

    def get_statements(self) -> list:
        """All (s, p, o) Terms asserted about this object."""
        out = []
        for p, vals in self._fwd().items():
            for v in vals:
                out.append((Term.iri(self.iri), Term.iri(p), v))
        return out

    def get_links_out(self, prop: str | None = None) -> set:
        """Objects this object points to (IRI-valued properties)."""
        out = set()
        for p, vals in self._fwd().items():
            if prop is not None and p != prop:
                continue
            for v in vals:
                if v.kind == T.KIND_IRI:
                    out.add(self.om.get_gpo(v.lex))
        return out

    def get_links_in(self, prop: str | None = None) -> set:
        """Objects pointing at this object (reverse links)."""
        out = set()
        for p, subs in self._rev().items():
            if prop is not None and p != prop:
                continue
            for s in subs:
                out.add(self.om.get_gpo(s))
        return out

    def get_reverse_link_properties(self) -> dict:
        """prop iri -> in-degree (IGPO.getReverseLinkProperties)."""
        return {p: len(subs) for p, subs in self._rev().items()}

    # ----------------------------------------------------------- writes
    def set_value(self, prop: str, value: Term) -> None:
        """Replace the property's value(s) (IGPO.setValue)."""
        for old in self._fwd().get(prop, []):
            self.om._stage_remove(self.iri, prop, old)
        self._forward[prop] = [value]
        self.om._stage_add(self.iri, prop, value)

    def add_value(self, prop: str, value: Term) -> None:
        self._fwd().setdefault(prop, []).append(value)
        self.om._stage_add(self.iri, prop, value)

    def remove_value(self, prop: str, value: Term) -> None:
        vals = self._fwd().get(prop, [])
        if value in vals:
            vals.remove(value)
            self.om._stage_remove(self.iri, prop, value)

    def remove_values(self, prop: str) -> None:
        for old in self._fwd().pop(prop, []):
            self.om._stage_remove(self.iri, prop, old)

    def remove(self) -> None:
        """Remove the object: all forward statements and all links in
        (IGPO.remove).  Cached GPOs that linked TO this object drop
        their materialized snapshot — their in-memory view would
        otherwise keep serving the removed link."""
        for p, vals in list(self._fwd().items()):
            for v in vals:
                self.om._stage_remove(self.iri, p, v)
        for p, subs in list(self._rev().items()):
            for s in subs:
                self.om._stage_remove(s, p, Term.iri(self.iri))
                linked = self.om._gpos.get(s)
                if linked is not None and linked is not self:
                    linked._forward = linked._reverse = None
        self._forward, self._reverse = {}, {}

    # ------------------------------------------------------------ dunder
    def __eq__(self, other):
        return isinstance(other, GPO) and other.iri == self.iri

    def __hash__(self):
        return hash(self.iri)

    def __repr__(self):
        return f"GPO({self.iri})"


class BasicSkin:
    """Typed convenience accessors over a GPO (reference
    ``gpo/BasicSkin.java`` / ``IGenericSkin``): python-value get/set so
    application code never touches Terms."""

    def __init__(self, gpo: GPO):
        self.gpo = gpo

    def as_generic(self) -> GPO:
        return self.gpo

    def set(self, prop: str, value) -> None:
        if isinstance(value, GPO):
            t = Term.iri(value.iri)
        elif isinstance(value, Term):
            t = value
        elif isinstance(value, bool):
            t = Term.boolean(value)
        elif isinstance(value, int):
            t = Term.integer(value)
        elif isinstance(value, float):
            t = Term.double(value)
        else:
            t = Term.literal(str(value))
        self.gpo.set_value(prop, t)

    def _lex(self, prop: str) -> str | None:
        t = self.gpo.get_value(prop)
        return None if t is None else t.lex

    def get_string(self, prop: str) -> str | None:
        return self._lex(prop)

    def get_int(self, prop: str, default: int = 0) -> int:
        v = self._lex(prop)
        return default if v is None else int(float(v))

    def get_double(self, prop: str, default: float = 0.0) -> float:
        v = self._lex(prop)
        return default if v is None else float(v)

    def get_boolean(self, prop: str) -> bool:
        return self._lex(prop) == "true"

    def get_gpo(self, prop: str) -> GPO | None:
        t = self.gpo.get_value(prop)
        if t is None or t.kind != T.KIND_IRI:
            return None
        return self.gpo.om.get_gpo(t.lex)


class ObjectManager:
    """Reference ``om/ObjectManager.java`` over a ``SparqlEngine``."""

    def __init__(self, engine):
        self.engine = engine
        #: canonicalizing cache — WEAK values like the reference's
        #: weak-value map (ObjectMgrModel), so a long-lived OM serving
        #: many distinct resources does not pin every GPO (and its
        #: materialized snapshot) in driver memory forever
        self._gpos: "weakref.WeakValueDictionary[str, GPO]" = (
            weakref.WeakValueDictionary()
        )
        self._tx_depth = 0
        self._adds: list = []  # staged (s,p,o) Terms
        self._removes: list = []

    # ------------------------------------------------------------- GPOs
    def get_gpo(self, iri: str) -> GPO:
        """Canonical GPO for a resource — never None, one instance per
        IRI within this OM (reference weak-value canonicalizing map)."""
        g = self._gpos.get(iri)
        if g is None:
            g = GPO(self, iri)
            self._gpos[iri] = g
        return g

    def create_gpo(self) -> GPO:
        return self.get_gpo(GPO_NAMESPACE + str(uuid.uuid4()))

    def materialize(self, gpo: GPO) -> None:
        """One bounded collect of the object's forward + reverse
        statements (s = id OR o = id in the default graph)."""
        tid = T.term_id(T.lit_term(Term.iri(gpo.iri)))
        df = self.engine.store.df.where(F.col("g").isNull())
        rows = (
            df.where((F.col("s") == tid) | (F.col("o") == tid))
            .select("st.lex", "pt.lex", "ot")
            .collect()
        )
        fwd: dict = {}
        rev: dict = {}
        for r in rows:
            if r[0] == gpo.iri:
                o = r["ot"]
                fwd.setdefault(r[1], []).append(
                    Term(o["kind"], o["lex"], o["dt"], o["lang"])
                )
            else:
                rev.setdefault(r[1], []).append(r[0])
        gpo._forward, gpo._reverse = fwd, rev

    # ---------------------------------------------------------- queries
    def evaluate(self, query: str):
        """SPARQL SELECT -> the engine's SelectResult (DataFrame-backed,
        not driver-materialized)."""
        return self.engine.select(query)

    def evaluate_graph(self, query: str):
        """SPARQL CONSTRUCT/DESCRIBE -> statement DataFrame."""
        return self.engine.query(query)

    def execute(self, update: str) -> None:
        self.engine.update(update)
        self._invalidate()

    # ------------------------------------------------------ named roots
    def save(self, key: str, value: Term) -> None:
        """Bind a value under a well-known name (IObjectManager.save):
        (key, gom:name, value), replacing any previous binding."""
        self.engine.replace_pattern(
            s=Term.iri(key),
            p=Term.iri(NAME_PROPERTY),
            inserts=[(Term.iri(key), Term.iri(NAME_PROPERTY), value, None)],
        )
        self._invalidate()

    def recall(self, key: str) -> Term | None:
        rows = (
            self.engine.store.df.where(
                (F.col("g").isNull())
                & (F.col("s") == T.term_id(T.lit_term(Term.iri(key))))
                & (F.col("p") == T.term_id(T.lit_term(Term.iri(NAME_PROPERTY))))
            )
            .select("ot")
            .limit(1)
            .collect()
        )
        if not rows:
            return None
        o = rows[0]["ot"]
        return Term(o["kind"], o["lex"], o["dt"], o["lang"])

    def recall_as_gpo(self, key: str) -> GPO | None:
        t = self.recall(key)
        return self.get_gpo(t.lex) if t is not None and t.kind == T.KIND_IRI else None

    # ----------------------------------------------------- transactions
    def begin_native_transaction(self) -> int:
        self._tx_depth += 1
        return self._tx_depth

    def commit_native_transaction(self, depth: int) -> None:
        if depth != self._tx_depth:
            raise ValueError("unbalanced native transaction")
        self._tx_depth -= 1
        if self._tx_depth == 0:
            self._flush()

    def rollback_native_transaction(self) -> None:
        """Discard staged mutations and forget materialized state (the
        store was never touched)."""
        self._tx_depth = 0
        self._adds, self._removes = [], []
        self._invalidate()

    def _stage_add(self, s: str, p: str, o: Term) -> None:
        self._adds.append((Term.iri(s), Term.iri(p), o, None))
        if self._tx_depth == 0:
            self._flush()

    def _stage_remove(self, s: str, p: str, o: Term) -> None:
        self._removes.append((Term.iri(s), Term.iri(p), o, None))
        if self._tx_depth == 0:
            self._flush()

    def _flush(self) -> None:
        """One engine commit per flush batch — removes first then adds
        (ObjectMgrModel.flushStatementBuffers ordering, so a setValue's
        retract+assert of the same (s,p) nets to the new value)."""
        removes, adds = self._removes, self._adds
        self._adds, self._removes = [], []
        if removes:
            self.engine.remove_statements(removes)
        if adds:
            self.engine.insert_statements(adds)

    def _invalidate(self) -> None:
        """External mutation: drop materialized snapshots (objects
        re-materialize lazily on next access)."""
        for g in self._gpos.values():
            g._forward = g._reverse = None

    def close(self) -> None:
        self._gpos.clear()
        self._adds, self._removes = [], []
