"""Golden end-to-end ranking regression.

Deterministic corpus + deterministic fake clients: the exact result
ordering below is a snapshot of the fusion pipeline (RRF + dependency
boost + rerank fusion with fuzzy bonus). Any refactor that silently changes
the ranking arithmetic fails here, even if every unit invariant still
holds. Regenerate the expectations deliberately if the ranking math is
intentionally changed.
"""

import asyncio
import hashlib
import json

import numpy as np
import pytest

from lean_explore_tpu.index import build_index_artifacts, load_index_artifacts
from lean_explore_tpu.models import Declaration, DeclarationStore
from lean_explore_tpu.search.engine import SearchEngine

DIM = 32

NAMES = [
    ("Nat.add", ["Nat"]),
    ("Nat.mul", ["Nat", "Nat.add"]),
    ("Nat.add_comm", ["Nat.add"]),
    ("List.map", ["List"]),
    ("List.filter", ["List", "List.map"]),
    ("Real.sqrt", []),
    ("Topology.Continuous", []),
    ("Group.hom", ["Group"]),
    ("Ring.unit", ["Group.hom"]),
    ("Field.inv", ["Ring.unit"]),
]

GOLDEN = {
    ("nat add numbers", 0): ["Nat.add", "Group.hom", "Ring.unit", "Nat.add_comm", "List.map"],
    ("nat add numbers", 6): ["Nat.add", "Nat.add_comm", "Nat.mul", "List.map", "Ring.unit"],
    ("List.map", 0): ["List.map", "Nat.add", "Group.hom", "List.filter", "Ring.unit"],
    ("List.map", 6): ["List.map", "List.filter", "Nat.add_comm", "Ring.unit", "Nat.add"],
    ("group homomorphism", 0): ["Ring.unit", "Nat.add", "Group.hom", "List.filter", "List.map"],
    ("group homomorphism", 6): ["Group.hom", "Ring.unit", "List.filter", "Nat.mul", "Nat.add"],
}


def det_vec(text: str, dim: int = DIM) -> list[float]:
    digest = hashlib.sha256(text.encode()).digest()
    rng = np.random.default_rng(int.from_bytes(digest[:8], "little"))
    v = rng.standard_normal(dim).astype(np.float32)
    return (v / np.linalg.norm(v)).tolist()


class DetEmbedder:
    async def embed(self, texts, is_query=False):
        from lean_explore_tpu.util.embedding_client import EmbeddingResponse

        prefix = "q:" if is_query else "d:"
        return EmbeddingResponse(
            texts=list(texts),
            embeddings=[det_vec(prefix + t) for t in texts],
            model="det",
        )


class DetReranker:
    async def rerank_pairs(self, queries, docs):
        return [
            int(hashlib.sha256((q + "|" + d).encode()).hexdigest()[:4], 16) / 65535
            for q, d in zip(queries, docs)
        ]


@pytest.fixture(scope="module")
def golden_engine(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("golden")
    store = DeclarationStore(tmp / "declarations.db", create=True)
    store.insert_many(
        [
            Declaration(
                name=n,
                module=f"Pkg{i % 3}.Mod",
                source_text=f"def {n}",
                source_link="u",
                dependencies=json.dumps(deps),
                informalization=(
                    f"**{n} concept.** informal text about "
                    f"{n.lower().replace('.', ' ')}"
                ),
                informalization_embedding=det_vec(f"doc:{n}"),
            )
            for i, (n, deps) in enumerate(NAMES)
        ]
    )
    build_index_artifacts(store, tmp)
    return SearchEngine(
        tmp,
        store=store,
        artifacts=load_index_artifacts(tmp),
        embedding_client=DetEmbedder(),
        reranker_client=DetReranker(),
    )


class TestGoldenRanking:
    @pytest.mark.parametrize("query,rerank_top", sorted(GOLDEN))
    def test_exact_ordering(self, golden_engine, query, rerank_top):
        results = asyncio.run(
            golden_engine.search(query, limit=5, rerank_top=rerank_top)
        )
        assert [r.name for r in results] == GOLDEN[(query, rerank_top)]

    def test_batch_matches_golden(self, golden_engine):
        queries = [q for q, rt in sorted(GOLDEN) if rt == 6]
        batches = asyncio.run(
            golden_engine.search_batch(queries, limit=5, rerank_top=6)
        )
        for q, results in zip(queries, batches):
            assert [r.name for r in results] == GOLDEN[(q, 6)]
