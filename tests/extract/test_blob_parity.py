"""leansqlite RenderedCode blob-decoder parity vs the REFERENCE decoder.

Round-1 VERDICT (Missing #3): the blob tests used an encoder this repo also
wrote, so a shared misunderstanding of the wire format would be invisible.
Here the oracle is the reference implementation itself — `_BlobReader` +
`_extract_names_from_rendered_code` from
/root/reference/src/lean_explore/extract/doc_parser.py:53-173, extracted via
AST (the module's own imports need sqlalchemy, which is not installed) and
executed verbatim. Randomized RenderedCode trees and a malformed-blob
taxonomy must decode identically through both implementations.
"""

import ast
import logging
import pathlib
import random

import pytest

from lean_explore_tpu.extract import doc_parser as dp

from tests.extract.test_doc_parser import (
    append,
    enc_name,
    enc_nat,
    enc_string,
    tag_const,
    tag_simple,
    text,
)

_REF = pathlib.Path("/root/reference/src/lean_explore/extract/doc_parser.py")


def _load_reference_decoder():
    """Exec only the blob-decoder definitions from the reference module."""
    tree = ast.parse(_REF.read_text())
    wanted = {"_BlobReader", "_extract_names_from_rendered_code"}
    nodes = [
        node
        for node in tree.body
        if isinstance(node, (ast.ClassDef, ast.FunctionDef)) and node.name in wanted
    ]
    assert {n.name for n in nodes} == wanted, "reference decoder moved"
    namespace = {"logger": logging.getLogger("ref_blob")}
    exec(  # noqa: S102 - executing the mounted reference as a test oracle
        compile(ast.Module(body=nodes, type_ignores=[]), str(_REF), "exec"),
        namespace,
    )
    return namespace["_extract_names_from_rendered_code"]


ref_extract = _load_reference_decoder() if _REF.exists() else None
needs_ref = pytest.mark.skipif(
    ref_extract is None, reason="reference repo not mounted"
)


def random_name(rng: random.Random) -> str:
    parts = []
    for _ in range(rng.randint(1, 4)):
        if rng.random() < 0.2:
            parts.append(str(rng.randint(0, 10**9)))  # Name.num component
        else:
            parts.append(
                "".join(rng.choice("abcXYZ_₁₂∀αβ") for _ in range(rng.randint(1, 8)))
            )
    return ".".join(parts)


def random_tagged_text(rng: random.Random, depth: int = 0) -> bytes:
    """Random well-formed RenderedCode tree exercising every node kind."""
    roll = rng.random()
    if depth > 6 or roll < 0.35:
        return text("".join(rng.choice(" abc:→() ") for _ in range(rng.randint(0, 12))))
    if roll < 0.55:
        return tag_const(random_name(rng), random_tagged_text(rng, depth + 1))
    if roll < 0.75:
        # keyword/string/sort-*/otherExpr tags: no payload
        return tag_simple(
            rng.choice([0, 1, 3, 4, 5, 6, 7]), random_tagged_text(rng, depth + 1)
        )
    return append(
        [random_tagged_text(rng, depth + 1) for _ in range(rng.randint(0, 4))]
    )


@needs_ref
class TestRandomizedParity:
    def test_500_random_trees(self):
        rng = random.Random(42)
        for i in range(500):
            blob = random_tagged_text(rng)
            ours = dp.extract_type_dependencies(blob)
            theirs = ref_extract(blob)
            assert ours == theirs, f"tree {i}: {ours} != {theirs}"

    def test_dedup_and_order_preserved(self):
        blob = append(
            [
                tag_const("Nat.add", text("+")),
                tag_const("Nat", text("Nat")),
                tag_const("Nat.add", text("+")),  # duplicate
                tag_const("List.map", text("map")),
            ]
        )
        assert dp.extract_type_dependencies(blob) == ref_extract(blob)
        assert ref_extract(blob) == ["Nat.add", "Nat", "List.map"]

    def test_anonymous_name_skipped_identically(self):
        blob = tag_const("", text("?"))  # anonymous Name (tag 0)
        assert dp.extract_type_dependencies(blob) == ref_extract(blob) == []

    def test_num_name_components(self):
        blob = tag_const("Foo.123.bar", text("x"))
        assert (
            dp.extract_type_dependencies(blob)
            == ref_extract(blob)
            == ["Foo.123.bar"]
        )

    def test_multibyte_varint_name(self):
        deep = ".".join(["x" * 40] * 5)  # forces multi-chunk nat lengths
        blob = tag_const(deep, text(""))
        assert dp.extract_type_dependencies(blob) == ref_extract(blob) == [deep]


@needs_ref
class TestMalformedBlobTaxonomy:
    """Both decoders must agree (return []) on every malformed-blob class."""

    CASES = {
        "empty": b"",
        "bad_tagged_text_tag": b"\x09",
        "bad_rendered_tag": b"\x01\x08" + b"\x00" + enc_string("x"),
        "bad_name_tag": b"\x01\x02\x07",
        "truncated_string": b"\x00" + enc_nat(100) + b"ab",
        "truncated_append": append([text("a")])[:-1],
        "truncated_name": (b"\x01\x02" + enc_name("Nat.add"))[:-2],
        "unterminated_varint": b"\x00" + bytes([0x80, 0x80, 0x80]),
        "tag_without_child": b"\x01\x00",
    }

    @pytest.mark.parametrize("kind", sorted(CASES))
    def test_case(self, kind):
        blob = self.CASES[kind]
        assert dp.extract_type_dependencies(blob) == ref_extract(blob) == []

    def test_random_truncations(self):
        rng = random.Random(7)
        for _ in range(200):
            blob = random_tagged_text(rng)
            cut = rng.randint(0, max(len(blob) - 1, 0))
            truncated = blob[:cut]
            assert dp.extract_type_dependencies(truncated) == ref_extract(
                truncated
            )

    def test_random_bitflips(self):
        rng = random.Random(11)
        for _ in range(200):
            blob = bytearray(random_tagged_text(rng))
            if not blob:
                continue
            pos = rng.randrange(len(blob))
            blob[pos] ^= 1 << rng.randrange(8)
            corrupted = bytes(blob)
            try:
                theirs = ref_extract(corrupted)
            except RecursionError:  # ours is iterative by design
                continue
            assert dp.extract_type_dependencies(corrupted) == theirs
