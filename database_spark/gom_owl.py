"""OWL "alchemy" skins: ontology browsing through typed GOM views.

Reference: ``bigdata-core/bigdata-gom/src/java/com/bigdata/gom/alchemy/
owl/`` — ``OWLOntologySkin.java`` (entry point, enumerate classes),
``OWLClassSkin.java`` (name / subclasses / properties-by-domain),
``OWLPropertySkin.java`` (name / isAssociation / range type),
``OWLSkins.java`` (bulk registration).

The skins are pure views over the GPO graph: navigation is
``get_links_in`` over the RDF/RDFS/OWL vocabulary (instances of
``owl:Class`` via ``rdf:type``, subclasses via ``rdfs:subClassOf``,
properties via ``rdfs:domain``), so each step is one bounded
per-object materialization — the same per-GPO set the reference
collects — while the ontology itself stays in the distributed store.
"""

from __future__ import annotations

from .gom import GPO, BasicSkin, GenericSkinRegistry, ObjectManager

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RDFS_SUBCLASSOF = "http://www.w3.org/2000/01/rdf-schema#subClassOf"
RDFS_DOMAIN = "http://www.w3.org/2000/01/rdf-schema#domain"
RDFS_RANGE = "http://www.w3.org/2000/01/rdf-schema#range"
OWL = "http://www.w3.org/2002/07/owl#"
OWL_ONTOLOGY = OWL + "Ontology"
OWL_CLASS = OWL + "Class"
OWL_OBJECT_PROPERTY = OWL + "ObjectProperty"
OWL_DATATYPE_PROPERTY = OWL + "DatatypeProperty"


class OWLOntologySkin(BasicSkin):
    """Entry point over the ``owl:Ontology`` resource
    (``OWLOntologySkin.java``)."""

    @staticmethod
    def get_ontology(om: ObjectManager) -> "OWLOntologySkin":
        """Skin over the (sole) ontology — the reference binds the
        ``owl:Ontology`` class GPO and skins it."""
        return om.get_gpo(OWL_ONTOLOGY).get_skin(OWLOntologySkin)

    def get_classes(self):
        """All defined OWL classes: instances of ``owl:Class``
        (``OWLOntologySkin.getClasses``)."""
        class_class = self.gpo.om.get_gpo(OWL_CLASS)
        for g in sorted(class_class.get_links_in(RDF_TYPE), key=lambda x: x.iri):
            yield g.get_skin(OWLClassSkin)


class OWLClassSkin(BasicSkin):
    """Typed view of an ``owl:Class`` (``OWLClassSkin.java``)."""

    def get_name(self) -> str:
        return self.gpo.iri

    def get_subclasses(self):
        """Classes declaring ``rdfs:subClassOf`` this class."""
        for g in sorted(self.gpo.get_links_in(RDFS_SUBCLASSOF), key=lambda x: x.iri):
            yield g.get_skin(OWLClassSkin)

    def get_properties(self):
        """Properties whose ``rdfs:domain`` is this class."""
        for g in sorted(self.gpo.get_links_in(RDFS_DOMAIN), key=lambda x: x.iri):
            yield g.get_skin(OWLPropertySkin)


class OWLPropertySkin(BasicSkin):
    """Typed view of an OWL property (``OWLPropertySkin.java``)."""

    def get_name(self) -> str:
        return self.gpo.iri

    def is_association(self) -> bool:
        """True for ``owl:ObjectProperty`` (link between objects),
        False for datatype properties."""
        t = self.gpo.get_value(RDF_TYPE)
        return t is not None and t.lex == OWL_OBJECT_PROPERTY

    def get_type(self) -> GPO | None:
        """The ``rdfs:range`` type; None when the ontology leaves
        literal ranges untyped (the reference notes univ-bench.owl
        does)."""
        return self.get_gpo(RDFS_RANGE)


def register() -> None:
    """Register the OWL skins (``OWLSkins.register``)."""
    GenericSkinRegistry.register_class(OWLOntologySkin)
    GenericSkinRegistry.register_class(OWLClassSkin)
    GenericSkinRegistry.register_class(OWLPropertySkin)
