"""Schema-spec loader / expansion tests (``SchemaExpansionService.cs``
analogue, VERDICT r4 "Next round" #9): the reference's safety guards on a
snapshot-element spec, plus the flat-span compile into profile rules."""

import json

import pytest

from tests.helpers import make_docs, rows, validate


def _el(path, type_=None, min_=0, max_="1", binding=None):
    e = {"path": path, "min": min_, "max": max_}
    if type_:
        e["type"] = [{"code": t} for t in type_] \
            if isinstance(type_, list) else [{"code": type_}]
    if binding:
        e["binding"] = binding
    return e


PATIENT_SPEC = {
    "resourceType": "Patient",
    "snapshot": {"element": [
        _el("Patient"),
        _el("Patient.id", "id", 1, "1"),
        _el("Patient.birthDate", "date", 0, "1"),
        _el("Patient.gender", "code", 0, "1",
            binding={"valueSet": "https://example.org/cs/gender",
                     "strength": "required"}),
        _el("Patient.name", "HumanName", 1, "*"),
        _el("Patient.name.family", "string", 0, "1"),
        _el("Patient.name.given", "string", 0, "*"),
        _el("Patient.contact", "BackboneElement", 0, "*"),
        _el("Patient.contact.relationship", "CodeableConcept", 0, "*"),
        _el("Patient.contact.relationship.coding", "Coding", 0, "*"),
        _el("Patient.deceased[x]", ["boolean", "dateTime"], 0, "1"),
        _el("Patient.link", "Patient", 0, "*"),  # self-referential type
        _el("Patient.link.other", "Reference", 1, "1"),
    ]},
}


def _tree():
    from fhir_data_validation_ray.schemaspec import (
        expand_structure_definition,
    )

    return expand_structure_definition(PATIENT_SPEC)


def _child(node, name):
    hit = [c for c in node.children if c.element_name == name]
    assert hit, f"{name} not under {node.path}"
    return hit[0]


def test_expansion_shape_and_primitive_stop():
    root = _tree()
    assert root.path == "Patient" and len(root.children) == 7
    bd = _child(root, "birthDate")
    assert bd.type == "date" and bd.children == []  # primitives never expand
    nm = _child(root, "name")
    assert nm.is_array and nm.is_required
    assert {c.element_name for c in nm.children} == {"family", "given"}
    assert _child(nm, "given").is_array


def test_choice_recorded_not_expanded():
    d = _child(_tree(), "deceased[x]")
    assert d.is_choice and d.choice_types == ["boolean", "dateTime"]
    assert d.children == []  # Phase-1 contract: no auto-expansion


def test_backbone_expands_and_cycle_guard():
    root = _tree()
    contact = _child(root, "contact")
    assert contact.is_backbone
    rel = _child(contact, "relationship")
    assert {c.element_name for c in rel.children} == {"coding"}
    # self-referential complex type: recorded but NOT re-expanded (the
    # branch-visited guard keys complex types by type name; 'Patient' is
    # the root's own type only after one expansion level... the guard
    # stops the second 'Patient' expansion)
    link = _child(root, "link")
    assert link.type == "Patient"
    # link DID expand once (Patient not yet visited on that branch), but
    # its nested Patient.link child must not recurse further
    inner_link = [c for c in link.children if c.element_name == "link"]
    if inner_link:  # snapshot paths are flat, so inner expansion re-reads
        assert all(c2.children == [] or c2.type != "Patient"
                   for c2 in inner_link)


def test_max_depth_guard():
    from fhir_data_validation_ray.schemaspec import (
        expand_structure_definition,
    )

    root = expand_structure_definition(PATIENT_SPEC, max_depth=1)
    contact = _child(root, "contact")
    assert contact.children == []  # depth budget spent at level 1


def test_errors_on_missing_snapshot_or_root():
    from fhir_data_validation_ray.schemaspec import (
        SchemaSpecError,
        expand_structure_definition,
    )

    with pytest.raises(SchemaSpecError):
        expand_structure_definition({"resourceType": "X", "snapshot": {}})
    with pytest.raises(SchemaSpecError):
        expand_structure_definition(
            {"resourceType": "X",
             "snapshot": {"element": [_el("Y")]}})


def test_loader_roundtrip(tmp_path):
    from fhir_data_validation_ray.schemaspec import (
        expand_structure_definition,
        load_schema_spec,
    )

    p = tmp_path / "patient.json"
    p.write_text(json.dumps(PATIENT_SPEC))
    assert expand_structure_definition(load_schema_spec(str(p))).path == \
        "Patient"


def test_profile_from_schema_compiles_and_validates():
    """The compiled profile drives the ordinary validator: primitive
    grammar on declared primitive kinds, CodeSystem on required bindings,
    RequiredSpans composition from cardinalities — per-kind nested
    constraints with no engine code changes."""
    from fhir_data_validation_ray.schemaspec import profile_from_schema

    base = {"version": "1.0", "settings": {},
            "codeSystems": [{"url": "https://example.org/cs/gender",
                             "concept": [{"code": "F"}, {"code": "M"}]}],
            "rules": []}
    prof = profile_from_schema(PATIENT_SPEC, base)
    ids = {r["id"] for r in prof["rules"]}
    assert {"SS_prim_id", "SS_prim_birthDate", "SS_prim_gender",
            "SS_bind_gender", "SS_composition"} <= ids
    assert set(prof["allowedKinds"]) == {
        "id", "birthDate", "gender", "name", "contact", "deceased[x]",
        "link"}
    comp = next(r for r in prof["rules"] if r["id"] == "SS_composition")
    reqs = {r["kind"]: r for r in comp["params"]["requirements"]}
    assert reqs["id"] == {"kind": "id", "min": 1, "max": 1}
    assert reqs["name"] == {"kind": "name", "min": 1}
    assert "birthDate" in reqs and reqs["birthDate"]["min"] == 0

    docs = make_docs([
        # ok doc: id + valid date + bound gender + name
        ("d1", [("id", "p1", "", 0), ("birthDate", "2020-01-02", "", 1),
                ("gender", "https://example.org/cs/gender|F", "", 2),
                ("name", "Ada", "", 3)]),
        # bad doc: calendar-invalid date, unbound gender code, no name span
        ("d2", [("id", "p2", "", 0), ("birthDate", "2021-02-30", "", 1),
                ("gender", "https://example.org/cs/gender|X", "", 2)]),
    ])
    got = rows(validate(docs, prof), "doc_id", "error_code")
    assert ("d2", "FHIR_INVALID_PRIMITIVE") in got
    assert ("d2", "CODE_NOT_IN_VALUESET") in got
    assert ("d2", "RESOURCE_REQUIREMENT_VIOLATION") in got  # name missing
    assert not any(d == "d1" for d, _ in got)
