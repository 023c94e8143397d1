"""Document store tests: schema, batch ops, blob round-trips, resume queries."""

import json

import numpy as np
import pytest

from lean_explore_tpu.models import (
    Declaration,
    DeclarationStore,
    pack_embedding,
    unpack_embedding,
)
from tests.conftest import make_declaration


class TestEmbeddingBlob:
    def test_round_trip(self):
        vec = [0.1, -2.5, 3.25, 0.0]
        out = unpack_embedding(pack_embedding(vec))
        assert out == pytest.approx(vec, abs=1e-7)

    def test_none(self):
        assert pack_embedding(None) is None
        assert unpack_embedding(None) is None

    def test_reference_struct_compat(self):
        """Blob layout matches the reference's struct.pack(f'{n}f') exactly
        (search_db.py:24-35)."""
        import struct

        vec = [1.5, -0.25, 1e-3]
        assert pack_embedding(vec) == struct.pack(f"{len(vec)}f", *vec)

    def test_numpy_input(self):
        vec = np.array([1.0, 2.0], dtype=np.float64)
        assert unpack_embedding(pack_embedding(vec)) == [1.0, 2.0]


class TestStore:
    def test_missing_file_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            DeclarationStore(tmp_path / "nope.db")

    def test_insert_and_get(self, memory_store):
        memory_store.insert_many([make_declaration("Nat.add")])
        decl = memory_store.get_by_name("Nat.add")
        assert decl is not None
        assert decl.module == "Init.Nat"
        assert memory_store.get_by_id(decl.id).name == "Nat.add"

    def test_get_missing(self, populated_store):
        assert populated_store.get_by_id(99999) is None
        assert populated_store.get_by_name("Does.Not.Exist") is None

    def test_numpy_ids_match_rows(self, memory_store):
        """numpy integer ids bind as BLOBs under sqlite3 and silently match
        nothing; the store coerces so retrieval's numpy arrays just work."""
        import numpy as np

        memory_store.insert_many([make_declaration("Nat.add")])
        decl_id = memory_store.get_by_name("Nat.add").id
        assert memory_store.get_by_id(np.int64(decl_id)) is not None
        hydrated = memory_store.get_by_ids(np.asarray([decl_id], dtype=np.int64))
        assert decl_id in hydrated

    def test_explicit_ids_preserved_on_rebuild(self, memory_store):
        """Dump-and-rebuild must keep ids: artifacts (dense index, BM25
        maps) are keyed on them, and silent renumbering would point every
        result at the wrong declaration."""
        from lean_explore_tpu.models import Declaration

        memory_store.insert_many(
            [
                Declaration(
                    id=7,
                    name="Keep.id",
                    module="M",
                    docstring=None,
                    source_text="def x",
                    source_link="https://x",
                    dependencies=None,
                    informalization=None,
                )
            ]
        )
        assert memory_store.get_by_id(7).name == "Keep.id"

    def test_conflict_ignored(self, memory_store):
        memory_store.insert_many([make_declaration("X", module="M")])
        memory_store.insert_many([make_declaration("X", module="Other")])
        assert memory_store.count() == 1
        assert memory_store.get_by_name("X").module == "M"

    def test_get_by_ids_batched(self, memory_store):
        decls = [make_declaration(f"D{i}") for i in range(1200)]
        memory_store.insert_many(decls)
        all_ids = [d.id for d in memory_store.iter_all()]
        hydrated = memory_store.get_by_ids(all_ids)
        assert len(hydrated) == 1200
        assert hydrated[all_ids[0]].name.startswith("D")

    def test_dependency_names(self):
        d = make_declaration("A", dependencies=["B", "C"])
        assert d.dependency_names() == ["B", "C"]
        d.dependencies = "not json"
        assert d.dependency_names() == []
        d.dependencies = None
        assert d.dependency_names() == []
        d.dependencies = json.dumps({"a": 1})
        assert d.dependency_names() == []

    def test_resume_queries(self, memory_store):
        memory_store.insert_many(
            [
                make_declaration("A", informalization=None),
                make_declaration("B", informalization="**B.** described"),
                make_declaration(
                    "C", informalization="**C.** described", embedding=[1.0, 0.0]
                ),
            ]
        )
        missing_inf = [d.name for d in memory_store.iter_missing_informalization()]
        assert missing_inf == ["A"]
        missing_emb = [d.name for d in memory_store.iter_missing_embedding()]
        assert missing_emb == ["B"]
        embedded = [d.name for d in memory_store.iter_embedded()]
        assert embedded == ["C"]

    def test_set_informalizations_and_embeddings(self, memory_store):
        memory_store.insert_many([make_declaration("A", informalization=None)])
        decl = memory_store.get_by_name("A")
        memory_store.set_informalizations([(decl.id, "**A.** text")])
        memory_store.set_embeddings([(decl.id, np.array([0.5, 0.5]))])
        refreshed = memory_store.get_by_id(decl.id, with_embedding=True)
        assert refreshed.informalization == "**A.** text"
        assert refreshed.informalization_embedding == [0.5, 0.5]

    def test_iter_all_order_and_persistence(self, tmp_path):
        path = tmp_path / "d.db"
        store = DeclarationStore(path, create=True)
        store.insert_many([make_declaration(f"N{i}") for i in range(5)])
        store.close()
        reopened = DeclarationStore(path)
        names = [d.name for d in reopened.iter_all(batch_size=2)]
        assert names == [f"N{i}" for i in range(5)]
        reopened.close()
