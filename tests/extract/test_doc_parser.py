"""doc_parser tests: blob decoding (with a local encoder as oracle), comment
stripping, projection filtering, source resolution, and both format parsers."""

import json
import sqlite3

import pytest

from lean_explore_tpu.extract import doc_parser as dp
from lean_explore_tpu.extract.types import ParsedDeclaration
from lean_explore_tpu.models import DeclarationStore


# ----------------------------------------------------------------------
# leansqlite ToBinary encoder (test oracle for the decoder)
# ----------------------------------------------------------------------


def enc_nat(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def enc_string(s: str) -> bytes:
    raw = s.encode("utf-8")
    return enc_nat(len(raw)) + raw


def enc_name(dotted: str) -> bytes:
    """Encode 'A.B.c' as nested Name.str nodes."""
    if not dotted:
        return b"\x00"
    parts = dotted.split(".")
    tags = bytearray()
    payloads = bytearray()
    for part in parts:
        if part.isdigit() and part.isascii():  # Name.num is ASCII numerals
            tags.append(2)
            payloads.extend(enc_nat(int(part)))
        else:
            tags.append(1)
            payloads.extend(enc_string(part))
    # tags outermost-first == reversed component order; payloads in
    # component order (innermost/root first).
    return bytes(tags[::-1]) + b"\x00" + bytes(payloads)


def text(s: str) -> bytes:
    return b"\x00" + enc_string(s)


def tag_const(name: str, child: bytes) -> bytes:
    return b"\x01" + b"\x02" + enc_name(name) + child


def tag_simple(tag_id: int, child: bytes) -> bytes:
    return b"\x01" + bytes([tag_id]) + child


def append(children: list[bytes]) -> bytes:
    return b"\x02" + enc_nat(len(children)) + b"".join(children)


class TestBlobDecoding:
    def test_name_round_trip(self):
        for name in ["Nat", "Nat.add", "CategoryTheory.Functor.map", "Fin.2", ""]:
            cursor = dp.BlobCursor(enc_name(name))
            assert cursor.name() == name

    def test_varint_boundaries(self):
        for n in [0, 1, 127, 128, 255, 16384, 10**9]:
            cursor = dp.BlobCursor(enc_nat(n))
            assert cursor.nat() == n

    def test_extract_dependencies(self):
        blob = append(
            [
                text("theorem foo : "),
                tag_const("Nat.add", text("Nat.add")),
                tag_simple(0, text(" = ")),  # keyword
                tag_const("List.map", text("List.map")),
                tag_const("Nat.add", text("again")),  # duplicate
                tag_simple(4, text("Type")),  # sort-type
            ]
        )
        assert dp.extract_type_dependencies(blob) == ["Nat.add", "List.map"]

    def test_nested_structure(self):
        blob = tag_const(
            "Outer.thing",
            append([text("x"), tag_const("Inner.dep", append([text("y")]))]),
        )
        assert dp.extract_type_dependencies(blob) == ["Outer.thing", "Inner.dep"]

    def test_malformed_blob_returns_empty(self):
        assert dp.extract_type_dependencies(b"\xff\x01\x02") == []
        assert dp.extract_type_dependencies(b"") == []
        assert dp.extract_type_dependencies(b"\x01\x02\x01") == []  # truncated

    def test_deep_nesting_no_recursion_error(self):
        blob = text("leaf")
        for _ in range(5000):
            blob = tag_simple(0, blob)
        assert dp.extract_type_dependencies(blob) == []


class TestStripComments:
    def test_line_comment(self):
        assert dp.strip_lean_comments("def x -- comment\n:= 1") == "def x := 1"

    def test_block_comment(self):
        assert dp.strip_lean_comments("def /- b -/ x := 1") == "def x := 1"

    def test_nested_block(self):
        assert dp.strip_lean_comments("a /- x /- y -/ z -/ b") == "a b"

    def test_doc_comment(self):
        assert dp.strip_lean_comments("/-- doc -/\ndef x := 1") == "def x := 1"

    def test_whitespace_collapsed(self):
        assert dp.strip_lean_comments("def  x\n\n  := 1") == "def x := 1"


def make_parsed(name, source):
    return ParsedDeclaration(
        name=name, module="M", source_text=source, source_link="https://x"
    )


class TestProjectionFilter:
    def test_shared_source_projection_removed(self):
        decls = [
            make_parsed("Scheme", "structure Scheme extends LRS"),
            make_parsed("Scheme.toLocallyRingedSpace", "structure Scheme extends LRS"),
        ]
        kept, removed = dp.filter_projections(decls)
        assert removed == 1
        assert [d.name for d in kept] == ["Scheme"]

    def test_unique_source_to_def_kept(self):
        decls = [
            make_parsed("IsOpenImmersion.toScheme", "def toScheme := unique"),
            make_parsed("Other", "def other := thing"),
        ]
        kept, removed = dp.filter_projections(decls)
        assert removed == 0
        assert len(kept) == 2

    def test_comment_differences_ignored(self):
        decls = [
            make_parsed("A", "structure A extends B -- note"),
            make_parsed("A.toB", "structure A extends B /- other -/"),
        ]
        kept, removed = dp.filter_projections(decls)
        assert removed == 1

    def test_lowercase_to_not_projection(self):
        decls = [
            make_parsed("x.total", "shared src"),
            make_parsed("y", "shared src"),
        ]
        kept, removed = dp.filter_projections(decls)
        assert removed == 0


class TestSourceResolution:
    def test_read_lines(self, tmp_path):
        f = tmp_path / "a.lean"
        f.write_text("line1\nline2\nline3\nline4\n")
        assert dp.read_source_lines(f, 2, 3) == "line2\nline3\n"

    def test_attribute_extension(self, tmp_path):
        f = tmp_path / "a.lean"
        f.write_text("@[simp]\nmore attrs\ntheorem foo : True := by\n  trivial\n")
        out = dp.read_source_lines(f, 1, 1)
        assert " theorem " in f" {out} " or "theorem" in out

    def test_out_of_bounds(self, tmp_path):
        f = tmp_path / "a.lean"
        f.write_text("one line\n")
        with pytest.raises(ValueError):
            dp.read_source_lines(f, 1, 5)

    def test_construct_source_link(self):
        assert (
            dp.construct_source_link("Mathlib.Foo", "https://g/blob/x/Foo.lean", 3, 7)
            == "https://g/blob/x/Foo.lean#L3-L7"
        )
        core = dp.construct_source_link("Init.Core", None, 1, 2, "v4.24.0")
        assert core == (
            "https://github.com/leanprover/lean4/blob/v4.24.0/src/lean/"
            "Init/Core.lean#L1-L2"
        )
        lake = dp.construct_source_link("Lake.Build", None, 1, 2)
        assert "src/lake/Lake/Build.lean" in lake
        assert dp.construct_source_link("Unknown.Mod", None, 1, 2) is None

    def test_extract_source_text(self, tmp_path):
        pkg = tmp_path / "mathlib4"
        (pkg / "Mathlib").mkdir(parents=True)
        (pkg / "Mathlib" / "Basic.lean").write_text("a\ntheorem t := 1\nb\n")
        cache = {"mathlib4": pkg}
        link = "https://github.com/leanprover-community/mathlib4/blob/abc/Mathlib/Basic.lean#L2-L2"
        assert dp.extract_source_text(link, tmp_path, cache) == "theorem t := 1\n"

    def test_extract_source_text_missing(self, tmp_path):
        link = "https://github.com/o/r/blob/x/Nope.lean#L1-L1"
        with pytest.raises(FileNotFoundError):
            dp.extract_source_text(link, tmp_path, {})

    def test_bad_link(self, tmp_path):
        with pytest.raises(ValueError):
            dp.extract_source_text("https://not-a-link", tmp_path, {})


def _make_docgen_db(path, rows):
    """Create a doc-gen4-style api-docs.db with the given name_info rows."""
    conn = sqlite3.connect(str(path))
    conn.executescript(
        """
        CREATE TABLE name_info (
            module_name TEXT, position INT, kind TEXT, name TEXT,
            type BLOB, render INT);
        CREATE TABLE declaration_ranges (
            module_name TEXT, position INT, start_line INT, end_line INT);
        CREATE TABLE declaration_markdown_docstrings (
            module_name TEXT, position INT, text TEXT);
        CREATE TABLE modules (name TEXT, source_url TEXT);
        """
    )
    modules = {}
    for i, row in enumerate(rows):
        conn.execute(
            "INSERT INTO name_info VALUES (?,?,?,?,?,1)",
            (row["module"], i, "theorem", row["name"], row.get("type_blob")),
        )
        conn.execute(
            "INSERT INTO declaration_ranges VALUES (?,?,?,?)",
            (row["module"], i, row["start"], row["end"]),
        )
        if row.get("docstring"):
            conn.execute(
                "INSERT INTO declaration_markdown_docstrings VALUES (?,?,?)",
                (row["module"], i, row["docstring"]),
            )
        modules[row["module"]] = row.get("source_url")
    for mod, url in modules.items():
        conn.execute("INSERT INTO modules VALUES (?,?)", (mod, url))
    conn.commit()
    conn.close()


class TestSqliteFormat:
    @pytest.fixture
    def workspace(self, tmp_path):
        """Fake lean root with one workspace + one package checkout."""
        lean_root = tmp_path / "lean"
        ws = lean_root / "mathlib"
        build = ws / ".lake" / "build"
        build.mkdir(parents=True)
        pkg = ws / ".lake" / "packages" / "mathlib4"
        (pkg / "Mathlib").mkdir(parents=True)
        (pkg / "Mathlib" / "Basic.lean").write_text(
            "import X\ntheorem Nat.mine : True := trivial\ndef Other.mk := 1\n"
        )
        url = "https://github.com/leanprover-community/mathlib4/blob/abc/Mathlib/Basic.lean"
        _make_docgen_db(
            build / "api-docs.db",
            [
                {
                    "module": "Mathlib.Basic",
                    "name": "Nat.mine",
                    "start": 2,
                    "end": 2,
                    "docstring": "my theorem",
                    "source_url": url,
                    "type_blob": tag_const("True", text("True")),
                },
                {   # .mk constructor: skipped
                    "module": "Mathlib.Basic",
                    "name": "Other.mk",
                    "start": 3,
                    "end": 3,
                    "source_url": url,
                },
                {   # outside prefix: skipped
                    "module": "LeanSearchClient.Thing",
                    "name": "LSC.x",
                    "start": 1,
                    "end": 1,
                    "source_url": url,
                },
            ],
        )
        return lean_root

    def test_detect_and_parse(self, workspace):
        ws = workspace / "mathlib"
        assert dp.detect_docgen_format(ws) == "sqlite"
        cache = dp.build_package_cache(workspace, "mathlib")
        decls = dp.parse_sqlite_docs(
            ws / ".lake" / "build" / "api-docs.db",
            workspace,
            cache,
            ["Mathlib"],
        )
        assert len(decls) == 1
        d = decls[0]
        assert d.name == "Nat.mine"
        assert d.docstring == "my theorem"
        assert d.dependencies == ["True"]
        assert "theorem Nat.mine" in d.source_text
        assert d.source_link.endswith("#L2-L2")

    def test_extract_declarations_into_store(self, workspace, monkeypatch):
        from lean_explore_tpu.extract import packages

        monkeypatch.setattr(
            packages, "get_extraction_order", lambda: ["mathlib"]
        )
        monkeypatch.setattr(
            dp, "get_extraction_order", lambda: ["mathlib"]
        )
        store = DeclarationStore(":memory:", create=True)
        inserted = dp.extract_declarations(store, workspace)
        assert inserted == 1
        decl = store.get_by_name("Nat.mine")
        assert decl is not None
        assert json.loads(decl.dependencies) == ["True"]
        # idempotent rerun
        assert dp.extract_declarations(store, workspace) == 0

    def test_invalid_db_detected(self, tmp_path):
        ws = tmp_path / "ws"
        build = ws / ".lake" / "build"
        build.mkdir(parents=True)
        (build / "api-docs.db").write_bytes(b"")  # empty
        assert dp.detect_docgen_format(ws) == "none"
        (build / "api-docs.db").write_bytes(b"not sqlite at all" * 10)
        assert dp.detect_docgen_format(ws) == "none"


class TestBmpFormat:
    def test_parse_bmp(self, tmp_path):
        pkg = tmp_path / "pkg"
        (pkg / "Std").mkdir(parents=True)
        (pkg / "Std" / "A.lean").write_text("def std.a := 1\n")
        link = "https://github.com/x/pkg/blob/main/Std/A.lean#L1-L1"
        bmp = tmp_path / "Std.A.bmp"
        bmp.write_text(
            json.dumps(
                {
                    "name": "Std.A",
                    "declarations": [
                        {
                            "info": {
                                "name": "std.a",
                                "doc": "doc",
                                "sourceLink": link,
                            },
                            "header": '<a href="x#Nat.add">Nat.add</a>'
                            '<a href="y#std.a">self</a>',
                        },
                        {
                            "info": {"name": "Bad.mk", "sourceLink": link},
                            "header": "",
                        },
                    ],
                }
            )
        )
        decls = dp.parse_bmp_docs([bmp], tmp_path, {"pkg": pkg}, ["Std"])
        assert len(decls) == 1
        assert decls[0].name == "std.a"
        assert decls[0].dependencies == ["Nat.add"]  # self-ref removed

    def test_html_dependency_extraction(self):
        html = '<a href="a#X">x</a><a href="b#Y">y</a><a href="c#X">dup</a>'
        assert dp.extract_html_dependencies(html) == ["X", "Y"]
