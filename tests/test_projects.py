"""ProjectStore tests — the playground project/sample persistence
analogue (``Playground.Api/ProjectStorage``, ``IProjectRepository.cs``
published-only read boundary)."""

import pytest

from tests.helpers import make_docs


def _store(tmp_path, t=[0.0]):
    from fhir_data_validation_ray.pipelines.projects import ProjectStore

    def clock():
        t[0] += 1.0
        return t[0]

    return ProjectStore(str(tmp_path / "projects"), clock=clock)


def _profile():
    return {"version": "1.0", "rules": [
        {"id": "R1", "type": "Required", "kind": "Patient",
         "fieldPath": "text"}]}


def test_crud_roundtrip(tmp_path):
    s = _store(tmp_path)
    p = s.create("demo", description="d1", profile=_profile())
    assert s.get(p["id"])["name"] == "demo"
    s.update(p["id"], name="demo2", description="d2")
    got = s.get(p["id"])
    assert got["name"] == "demo2" and got["updatedAt"] > got["createdAt"]
    assert [e["name"] for e in s.list_all()] == ["demo2"]
    assert s.delete(p["id"]) is True
    assert s.get(p["id"]) is None and s.list_all() == []
    assert s.delete("nope") is False  # missing: False, never throws


def test_samples_roundtrip_and_ray_read(ray_session, tmp_path):
    s = _store(tmp_path)
    p = s.create("demo")
    docs = make_docs([("d1", [("Patient", "x", "", 0)]),
                      ("d2", [("Observation", "y", "", 0)])])
    s.save_sample(p["id"], "smoke", docs)
    assert s.get(p["id"])["samples"] == ["smoke"]
    ds = s.load_sample(p["id"], "smoke")
    assert sorted(r["doc_id"] for r in ds.take_all()) == ["d1", "d2"]
    with pytest.raises(KeyError):
        s.load_sample(p["id"], "absent")
    with pytest.raises(ValueError):
        s.save_sample(p["id"], "Bad Name!", docs)


def test_publish_boundary_and_immutability(tmp_path):
    s = _store(tmp_path)
    a = s.create("alpha", profile=_profile())
    b = s.create("beta", profile=_profile())
    assert s.list_published() == []          # empty list, never null
    assert s.get_published_by_slug("alpha") is None

    s.publish(a["id"], "alpha-core")
    s.publish(b["id"], "beta-core")
    pub = s.list_published()
    # newest publication first
    assert [e["slug"] for e in pub] == ["beta-core", "alpha-core"]
    got = s.get_published_by_slug("alpha-core")
    assert got["id"] == a["id"] and got["profileSnapshot"]["hash"]

    # published projects are immutable: no update / delete / re-publish
    with pytest.raises(ValueError):
        s.update(a["id"], name="x")
    with pytest.raises(ValueError):
        s.delete(a["id"])
    with pytest.raises(ValueError):
        s.publish(a["id"], "alpha-again")
    # slugs are unique
    c = s.create("gamma", profile=_profile())
    with pytest.raises(ValueError):
        s.publish(c["id"], "alpha-core")
    # drafts never leak through the published surface
    assert s.get_published_by_slug("gamma") is None


def test_publish_runs_compile_and_governance_gates(tmp_path):
    s = _store(tmp_path)
    # compile failure: unknown rule type
    bad = s.create("bad", profile={"version": "1.0", "rules": [
        {"id": "X", "type": "NoSuchRule", "fieldPath": "text"}]})
    with pytest.raises(Exception):
        s.publish(bad["id"], "bad-core")
    assert s.get(bad["id"])["published"] is False
    # governance BLOCKED but compile-clean: two composition rules violate
    # the single-bundle-rule invariant (review-only, the kernel runs both)
    blocked = s.create("blocked", profile={"version": "1.0", "rules": [
        {"id": "X1", "type": "RequiredSpans", "kind": "*",
         "params": {"requirements": [{"kind": "Patient", "min": 1}]}},
        {"id": "X2", "type": "RequiredSpans", "kind": "*",
         "params": {"requirements": [{"kind": "Observation", "min": 1}]}},
    ]})
    with pytest.raises(ValueError):
        s.publish(blocked["id"], "blocked-core")
    # review=False skips the governance gate but not the compile gate
    s.publish(blocked["id"], "blocked-core", review=False)
    assert s.get_published_by_slug("blocked-core") is not None


def test_published_projects_reject_sample_mutation(tmp_path):
    """Review r5: save_sample honors the immutability boundary too."""
    s = _store(tmp_path)
    p = s.create("frozen", profile=_profile())
    docs = make_docs([("d1", [("Patient", "x", "", 0)])])
    s.save_sample(p["id"], "before", docs)
    s.publish(p["id"], "frozen-core")
    with pytest.raises(ValueError):
        s.save_sample(p["id"], "after", docs)
    assert s.get(p["id"])["samples"] == ["before"]
    with pytest.raises(KeyError):
        s.save_sample("missing", "x", docs)
