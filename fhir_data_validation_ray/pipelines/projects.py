"""Project / sample storage — the analogue of the reference's playground
project persistence (``Playground.Api/ProjectStorage`` JSON-file store;
``Persistence/Repositories/IProjectRepository.cs`` published-only
read-boundary contract; ``PostgresProjectRepository.cs`` is the deployed
variant of the same interface).

A *project* bundles an authoring profile (rules + codeSystems +
questions), metadata, and named sample corpora (parquet in the driver
input shape ``doc_id, spans``). Draft projects are mutable; ``publish``
runs the compile + governance gates (via ``ProfileStore``) and freezes a
content-addressed snapshot. The READ side enforces the reference's
repository boundary: ``list_published`` / ``get_published_by_slug`` see
ONLY published projects, newest publication first, and never throw for
missing data (``IProjectRepository.cs:10-31``).

File layout (all index mutations flock-serialized, the ProfileStore
convention): ``<root>/index.json``; per project
``<root>/<project_id>/project.json``, ``samples/<name>.parquet``,
``profiles/`` (its ProfileStore root).

Driver-side by design — project catalogs are KBs of metadata; the
corpora they point at are what runs through Ray.
"""

from __future__ import annotations

import fcntl
import hashlib
import json
import os
import re
import time
from typing import Any

from .profiles import ProfileStore

_SLUG_RE = re.compile(r"^[a-z0-9][a-z0-9-]*$")


class ProjectStore:
    def __init__(self, root: str, *, clock=time.time):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._index = os.path.join(root, "index.json")
        self._lock_path = os.path.join(root, ".index.lock")
        self._clock = clock

    # ------------------------------------------------------------ internals
    def _read_index(self) -> list[dict]:
        if not os.path.exists(self._index):
            return []
        with open(self._index) as f:
            return json.load(f)

    def _with_lock(self, fn):
        with open(self._lock_path, "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            try:
                return fn()
            finally:
                fcntl.flock(lock, fcntl.LOCK_UN)

    def _write_index(self, entries: list[dict]) -> None:
        tmp = self._index + f".tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(entries, f, indent=1)
        os.rename(tmp, self._index)

    def _pdir(self, project_id: str) -> str:
        return os.path.join(self.root, project_id)

    def _pjson(self, project_id: str) -> str:
        return os.path.join(self._pdir(project_id), "project.json")

    def _write_project(self, obj: dict) -> None:
        tmp = self._pjson(obj["id"]) + f".tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(obj, f, sort_keys=True, indent=1)
        os.rename(tmp, self._pjson(obj["id"]))

    # ----------------------------------------------------------------- CRUD
    def create(self, name: str, *, description: str | None = None,
               profile: dict[str, Any] | None = None,
               fhir_version: str = "R4") -> dict:
        """New draft project; id is content-addressed from name + creation
        time (stable, URL-safe)."""
        now = float(self._clock())
        pid = hashlib.sha256(
            f"{name}\x1f{now}".encode()).hexdigest()[:16]
        obj = {"id": pid, "name": name, "description": description,
               "fhirVersion": fhir_version,
               "createdAt": now, "updatedAt": now,
               "published": False, "slug": None, "publishedAt": None,
               "profile": profile or {"version": "1.0", "rules": []},
               "samples": []}

        def put():
            entries = self._read_index()
            os.makedirs(os.path.join(self._pdir(pid), "samples"),
                        exist_ok=True)
            self._write_project(obj)
            entries.append({"id": pid, "name": name, "published": False,
                            "slug": None, "publishedAt": None})
            self._write_index(entries)
            return obj

        return self._with_lock(put)

    def get(self, project_id: str) -> dict | None:
        """Draft-or-published fetch by id; None when missing (the
        repository contract: never throw for missing data)."""
        path = self._pjson(project_id)
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    def update(self, project_id: str, *, name: str | None = None,
               description: str | None = None,
               profile: dict[str, Any] | None = None) -> dict:
        """Mutate a DRAFT project (published projects are immutable —
        the publishing boundary, ``IProjectRepository.cs:5-9``)."""

        def mut():
            obj = self.get(project_id)
            if obj is None:
                raise KeyError(f"project {project_id!r} not found")
            if obj["published"]:
                raise ValueError(
                    f"project {project_id!r} is published and immutable")
            if name is not None:
                obj["name"] = name
            if description is not None:
                obj["description"] = description
            if profile is not None:
                obj["profile"] = profile
            obj["updatedAt"] = float(self._clock())
            self._write_project(obj)
            entries = self._read_index()
            for e in entries:
                if e["id"] == project_id:
                    e["name"] = obj["name"]
            self._write_index(entries)
            return obj

        return self._with_lock(mut)

    def delete(self, project_id: str) -> bool:
        """Delete a DRAFT project (published ones are immutable history).
        Returns False when missing."""

        def rm():
            obj = self.get(project_id)
            if obj is None:
                return False
            if obj["published"]:
                raise ValueError(
                    f"project {project_id!r} is published and immutable")
            import shutil

            shutil.rmtree(self._pdir(project_id))
            self._write_index(
                [e for e in self._read_index() if e["id"] != project_id])
            return True

        return self._with_lock(rm)

    def list_all(self) -> list[dict]:
        """Drafts + published, index order (authoring surface)."""
        return list(self._read_index())

    # -------------------------------------------------------------- samples
    def save_sample(self, project_id: str, name: str, table) -> str:
        """Attach a named sample corpus (pyarrow Table in the driver input
        shape) as parquet; returns its path. Overwrites by name. DRAFT
        projects only — the published-immutability boundary covers samples
        too (review r5 finding)."""
        import pyarrow.parquet as pq

        if not _SLUG_RE.match(name):
            raise ValueError(f"sample name {name!r} must be a slug")
        path = os.path.join(self._pdir(project_id), "samples",
                            f"{name}.parquet")

        def record():
            obj = self.get(project_id)
            if obj is None:
                raise KeyError(f"project {project_id!r} not found")
            if obj["published"]:
                raise ValueError(
                    f"project {project_id!r} is published and immutable")
            pq.write_table(table, path + ".tmp")
            os.replace(path + ".tmp", path)
            if name not in obj["samples"]:
                obj["samples"].append(name)
                obj["samples"].sort()
            obj["updatedAt"] = float(self._clock())
            self._write_project(obj)

        self._with_lock(record)
        return path

    def load_sample(self, project_id: str, name: str):
        """Sample corpus as a Ray Dataset (column-pruned parquet read —
        the piece that actually scales)."""
        import ray.data as rd

        path = os.path.join(self._pdir(project_id), "samples",
                            f"{name}.parquet")
        if not os.path.exists(path):
            raise KeyError(f"sample {name!r} not found in {project_id!r}")
        return rd.read_parquet(path)

    # ------------------------------------------------------------ publishing
    def publish(self, project_id: str, slug: str, *,
                review: bool = True) -> dict:
        """Freeze the project: compile + governance-gate its profile
        through ``ProfileStore.publish`` (content-addressed snapshot),
        mark published with a unique slug. Published projects become
        immutable and visible to the read-only repository surface."""
        if not _SLUG_RE.match(slug):
            raise ValueError(f"slug {slug!r} must be url-friendly "
                             f"(lowercase letters/digits/dashes)")

        def pub():
            obj = self.get(project_id)
            if obj is None:
                raise KeyError(f"project {project_id!r} not found")
            if obj["published"]:
                raise ValueError(f"project {project_id!r} already published")
            entries = self._read_index()
            if any(e.get("slug") == slug for e in entries):
                raise ValueError(f"slug {slug!r} already taken")
            store = ProfileStore(
                os.path.join(self._pdir(project_id), "profiles"))
            snap = store.publish(obj["profile"], review=review)
            obj.update({"published": True, "slug": slug,
                        "publishedAt": float(self._clock()),
                        "profileSnapshot": snap})
            self._write_project(obj)
            for e in entries:
                if e["id"] == project_id:
                    e.update({"published": True, "slug": slug,
                              "publishedAt": obj["publishedAt"]})
            self._write_index(entries)
            return obj

        return self._with_lock(pub)

    # ------------------------------ read-only repository surface (published)
    def list_published(self) -> list[dict]:
        """Published projects only, newest publication first; [] when none
        (``IProjectRepository.ListPublishedAsync`` contract)."""
        pub = [e for e in self._read_index() if e.get("published")]
        return sorted(pub, key=lambda e: -e["publishedAt"])

    def get_published_by_slug(self, slug: str) -> dict | None:
        """Published project by slug; None for missing OR unpublished
        (``GetPublishedBySlugAsync``: the boundary never leaks drafts)."""
        for e in self._read_index():
            if e.get("slug") == slug and e.get("published"):
                return self.get(e["id"])
        return None
