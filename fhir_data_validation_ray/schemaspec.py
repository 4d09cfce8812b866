"""Schema-spec loader + expansion — the analogue of the reference's
``Services/SchemaExpansionService.cs:1-262`` / ``FhirSchemaService.cs:30-61``
(StructureDefinition snapshots -> recursive, guarded schema trees) mapped
onto this engine's flat span model (SURVEY §1.3): a spec JSON declares
per-kind nested element constraints, expansion applies the reference's
safety guards, and ``profile_from_schema`` compiles the tree into ordinary
profile rules/settings — per-kind constraints with NO code changes.

Expansion guards, mirrored 1:1 (``SchemaExpansionService.cs``):

- max depth (default 8, ``:15,78-82``);
- FHIR primitive types never expand (``:17-23,94-99``);
- choice elements (``[x]`` path or multiple types) are recorded but not
  auto-expanded (``:101-107``, Phase-1 contract);
- visited-type cycle guard, BRANCH-scoped (``:109-132``): a complex type
  expands once per root-to-leaf path; BackboneElements key by path since
  they are structure-specific (``:222-231``);
- backbone elements always expand, complex (uppercase) types expand,
  primitives/choices never (``ShouldExpand``, ``:236-261``).

Spec shape (``snapshot.element`` list, the StructureDefinition subset the
reference reads): ``{"resourceType": K, "snapshot": {"element": [{"path",
"type": [{"code"}], "min", "max", "binding": {"valueSet", "strength"},
"short", "definition"}]}}``.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any

DEFAULT_MAX_DEPTH = 8

# FHIR R4 primitives (SchemaExpansionService.cs:17-23)
PRIMITIVE_TYPES = frozenset({
    "boolean", "integer", "string", "decimal", "uri", "url", "canonical",
    "base64Binary", "instant", "date", "dateTime", "time", "code", "oid",
    "id", "markdown", "unsignedInt", "positiveInt", "uuid", "xhtml",
})


@dataclass
class SchemaNode:
    """``Models/FhirSchemaNode`` analogue."""

    path: str
    element_name: str
    type: str
    choice_types: list[str] = field(default_factory=list)
    is_array: bool = False
    is_choice: bool = False
    min: int = 0
    max: str = "1"
    is_backbone: bool = False
    is_required: bool = False
    value_set_url: str | None = None
    binding_strength: str | None = None
    children: list["SchemaNode"] = field(default_factory=list)


class SchemaSpecError(ValueError):
    pass


def load_schema_spec(path: str) -> dict[str, Any]:
    with open(path) as f:
        return json.load(f)


def _is_direct_child(child_path: str, parent_path: str) -> bool:
    """``IsDirectChild`` (:139-147): one dotted level deeper, exactly."""
    if not child_path.startswith(parent_path + "."):
        return False
    return "." not in child_path[len(parent_path) + 1:]


def _node_from_element(el: dict[str, Any], parent_path: str) -> SchemaNode:
    """``CreateNodeFromElement`` (:152-196)."""
    path = str(el.get("path", ""))
    types = [str(t.get("code", "")) for t in el.get("type", []) or []
             if t.get("code")]
    is_choice = "[x]" in path or len(types) > 1
    is_backbone = "BackboneElement" in types or any(
        t.get("code") is None for t in el.get("type", []) or [])
    if is_choice and types:
        primary = path.split(".")[-1] if "[x]" in path else types[0]
    elif types:
        primary = types[0]
    elif is_backbone:
        primary = "BackboneElement"
    else:
        primary = "Element"
    mn = int(el.get("min", 0) or 0)
    mx = str(el.get("max", "1") or "1")
    binding = el.get("binding") or {}
    return SchemaNode(
        path=path,
        element_name=path if path == parent_path else path.split(".")[-1],
        type=primary,
        choice_types=types if is_choice else [],
        is_array=mx == "*",
        is_choice=is_choice,
        min=mn,
        max=mx,
        is_backbone=is_backbone,
        is_required=mn >= 1,
        value_set_url=binding.get("valueSet"),
        binding_strength=binding.get("strength"),
    )


def _type_key(node: SchemaNode) -> str:
    """``GetTypeKey`` (:222-231): backbones are structure-specific."""
    return f"BackboneElement:{node.path}" if node.is_backbone else node.type


def _should_expand(node: SchemaNode) -> bool:
    """``ShouldExpand`` (:236-261)."""
    if node.is_backbone:
        return True
    if node.type in PRIMITIVE_TYPES or node.is_choice:
        return False
    return bool(node.type) and node.type[0].isupper()


def expand_structure_definition(spec: dict[str, Any],
                                resource_type: str | None = None,
                                max_depth: int = DEFAULT_MAX_DEPTH
                                ) -> SchemaNode:
    """``ExpandStructureDefinition`` (:33-64): snapshot elements -> a safe,
    finite schema tree."""
    resource_type = resource_type or str(spec.get("resourceType", ""))
    elements = (spec.get("snapshot") or {}).get("element") or []
    if not elements:
        raise SchemaSpecError(
            f"StructureDefinition for {resource_type} has no snapshot "
            f"elements")
    root_el = next((e for e in elements
                    if str(e.get("path", "")) == resource_type), None)
    if root_el is None:
        raise SchemaSpecError(f"Root element not found for {resource_type}")
    root = _node_from_element(root_el, resource_type)

    def expand(parent: SchemaNode, parent_path: str,
               visited: frozenset[str], depth: int) -> None:
        if depth >= max_depth:
            return
        for el in elements:
            if not _is_direct_child(str(el.get("path", "")), parent_path):
                continue
            child = _node_from_element(el, parent_path)
            parent.children.append(child)
            if child.type in PRIMITIVE_TYPES or child.is_choice:
                continue
            key = _type_key(child)
            if key in visited:
                continue  # cycle guard (branch-scoped, :109-122)
            if _should_expand(child):
                expand(child, child.path, visited | {key}, depth + 1)

    expand(root, resource_type, frozenset(), 0)
    return root


def iter_nodes(node: SchemaNode):
    yield node
    for c in node.children:
        yield from iter_nodes(c)


def profile_from_schema(spec: dict[str, Any],
                        base_profile: dict[str, Any] | None = None,
                        *, max_depth: int = DEFAULT_MAX_DEPTH
                        ) -> dict[str, Any]:
    """Compile an expanded schema tree into this engine's profile shapes —
    the flat-span mapping of the reference's schema-driven validation
    (SURVEY §1.3): element names become span kinds, cardinalities become a
    RequiredSpans composition rule, primitive element types become
    Primitive grammar rules, and required bindings become CodeSystem
    rules. Purely additive over ``base_profile`` (rule ids are prefixed
    ``SS_``); no engine code changes needed to enforce a new spec."""
    import copy

    root = expand_structure_definition(spec, max_depth=max_depth)
    p: dict[str, Any] = copy.deepcopy(base_profile) if base_profile else {
        "version": "1.0", "settings": {}, "rules": []}
    p.setdefault("rules", [])
    p.setdefault("settings", {})

    requirements = []
    for child in root.children:
        kind = child.element_name
        if child.min >= 1 or child.max not in ("*", ""):
            req: dict[str, Any] = {"kind": kind, "min": max(child.min, 0)}
            if child.max not in ("*", ""):
                req["max"] = int(child.max)
            requirements.append(req)
        if child.type in PRIMITIVE_TYPES:
            p["rules"].append({
                "id": f"SS_prim_{kind}", "type": "Primitive", "kind": kind,
                "fieldPath": "text", "params": {"primitive": child.type}})
        if child.value_set_url and child.binding_strength == "required":
            p["rules"].append({
                "id": f"SS_bind_{kind}", "type": "CodeSystem", "kind": kind,
                "fieldPath": "text",
                "params": {"system": child.value_set_url}})
    if requirements:
        p["rules"].append({
            "id": "SS_composition", "type": "RequiredSpans", "kind": "*",
            "params": {"requirements": requirements,
                       "rejectUndeclared": False}})
    # enum-bind spans.kind to the declared element names (open when the
    # spec declares none) — the engine's allowedKinds structural setting
    declared = sorted({c.element_name for c in root.children})
    if declared and not p.get("allowedKinds"):
        p["allowedKinds"] = declared
    return p
