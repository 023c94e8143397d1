"""Deep doc-parser coverage: the scenario set of the reference's 1472-line
doc_parser_test.py (source-range edge cases, verso docstrings, format
detection fallbacks, package-cache resolution, projection-filter corners,
BMP corners), exercised against this parser.
"""

import json
import sqlite3

import pytest

from lean_explore_tpu.extract import doc_parser as dp
from lean_explore_tpu.extract.types import ParsedDeclaration
from lean_explore_tpu.models import DeclarationStore

from tests.extract.test_doc_parser import enc_string, tag_const, text


def make_db(path, rows, *, verso_rows=(), markdown_table=True, verso_table=False):
    """doc-gen4-style api-docs.db with optional docstring-table layouts."""
    conn = sqlite3.connect(str(path))
    conn.executescript(
        """
        CREATE TABLE name_info (
            module_name TEXT, position INT, kind TEXT, name TEXT,
            type BLOB, render INT);
        CREATE TABLE declaration_ranges (
            module_name TEXT, position INT, start_line INT, end_line INT);
        CREATE TABLE modules (name TEXT, source_url TEXT);
        """
    )
    if markdown_table:
        conn.execute(
            "CREATE TABLE declaration_markdown_docstrings ("
            "module_name TEXT, position INT, text TEXT)"
        )
    if verso_table:
        conn.execute(
            "CREATE TABLE declaration_verso_docstrings ("
            "module_name TEXT, position INT, content BLOB)"
        )
    modules = {}
    for i, row in enumerate(rows):
        conn.execute(
            "INSERT INTO name_info VALUES (?,?,?,?,?,?)",
            (
                row["module"],
                i,
                row.get("kind", "theorem"),
                row["name"],
                row.get("type_blob"),
                row.get("render", 1),
            ),
        )
        conn.execute(
            "INSERT INTO declaration_ranges VALUES (?,?,?,?)",
            (row["module"], i, row["start"], row["end"]),
        )
        if row.get("docstring") and markdown_table:
            conn.execute(
                "INSERT INTO declaration_markdown_docstrings VALUES (?,?,?)",
                (row["module"], i, row["docstring"]),
            )
        modules[row["module"]] = row.get("source_url")
    for module, position, content in verso_rows:
        conn.execute(
            "INSERT INTO declaration_verso_docstrings VALUES (?,?,?)",
            (module, position, content),
        )
    for mod, url in modules.items():
        conn.execute("INSERT INTO modules VALUES (?,?)", (mod, url))
    conn.commit()
    conn.close()


@pytest.fixture
def src_tree(tmp_path):
    """A package checkout with a multi-feature source file."""
    pkg = tmp_path / "mathlib4"
    d = pkg / "Mathlib"
    d.mkdir(parents=True)
    (d / "Basic.lean").write_text(
        "import Mathlib.Init\n"                      # 1
        "@[simp, norm_cast]\n"                        # 2 (attr-only range)
        "theorem Nat.cast_add : True := trivial\n"    # 3
        "def pair₁ := (1, 2)\n"                       # 4 (unicode)
        "theorem a_one : True := trivial; theorem a_two : True := trivial\n"  # 5
        "@[inline]\n"                                 # 6
        "-- interleaved comment\n"                    # 7
        "def late := 3\n"                             # 8
        "@[dangling_attr_no_decl_after]\n"            # 9 (extends to EOF)
    )
    return tmp_path, {"mathlib4": pkg}


LINK = (
    "https://github.com/leanprover-community/mathlib4/blob/abc/"
    "Mathlib/Basic.lean#L{s}-L{e}"
)


class TestSourceRangeEdges:
    def test_attribute_only_range_extends_to_declaration(self, src_tree):
        root, cache = src_tree
        out = dp.extract_source_text(LINK.format(s=2, e=2), root, cache)
        assert out.startswith("@[simp, norm_cast]")
        assert "theorem Nat.cast_add" in out

    def test_attribute_extension_stops_at_first_keyword(self, src_tree):
        root, cache = src_tree
        out = dp.extract_source_text(LINK.format(s=2, e=2), root, cache)
        assert "pair₁" not in out  # must not run past the decl line

    def test_attribute_with_interleaved_comment(self, src_tree):
        root, cache = src_tree
        out = dp.extract_source_text(LINK.format(s=6, e=6), root, cache)
        assert "def late" in out and "interleaved comment" in out

    def test_dangling_attribute_extends_to_eof(self, src_tree):
        root, cache = src_tree
        out = dp.extract_source_text(LINK.format(s=9, e=9), root, cache)
        assert out.startswith("@[dangling_attr_no_decl_after]")

    def test_attr_start_with_complete_range_extends_one_line(self, src_tree):
        # Reference quirk kept for parity (doc_parser.py:364-385): a range
        # starting with @[ always enters the extension loop, so even a range
        # that already contains the declaration gains exactly one line (the
        # first extension already satisfies the keyword check).
        root, cache = src_tree
        out = dp.extract_source_text(LINK.format(s=2, e=3), root, cache)
        assert out.startswith(
            "@[simp, norm_cast]\ntheorem Nat.cast_add : True := trivial"
        )
        assert out.count("\n") <= 3  # at most one extra line, never more

    def test_multi_decl_line_returned_whole(self, src_tree):
        root, cache = src_tree
        out = dp.extract_source_text(LINK.format(s=5, e=5), root, cache)
        assert "a_one" in out and "a_two" in out

    def test_unicode_identifiers_roundtrip(self, src_tree):
        root, cache = src_tree
        out = dp.extract_source_text(LINK.format(s=4, e=4), root, cache)
        assert "pair₁" in out

    def test_range_at_file_end(self, src_tree):
        root, cache = src_tree
        out = dp.extract_source_text(LINK.format(s=8, e=9), root, cache)
        assert "def late" in out

    def test_start_beyond_eof_raises(self, src_tree):
        root, cache = src_tree
        with pytest.raises(ValueError):
            dp.extract_source_text(LINK.format(s=50, e=60), root, cache)


class TestSourceLinkResolution:
    def test_version_suffix_variant(self, tmp_path):
        # mathlib4 checkout dir resolves links naming 'mathlib4' exactly and
        # the digit-stripped 'mathlib' fallback covers renamed checkouts.
        pkg = tmp_path / "mathlib"
        (pkg / "Mathlib").mkdir(parents=True)
        (pkg / "Mathlib" / "A.lean").write_text("def a := 1\n")
        link = (
            "https://github.com/leanprover-community/mathlib4/blob/x/"
            "Mathlib/A.lean#L1-L1"
        )
        out = dp.extract_source_text(link, tmp_path, {"mathlib": pkg})
        assert out == "def a := 1\n"

    def test_dash_stripped_variant(self, tmp_path):
        pkg = tmp_path / "fc"
        (pkg / "FormalConjectures").mkdir(parents=True)
        (pkg / "FormalConjectures" / "A.lean").write_text("def c := 1\n")
        link = (
            "https://github.com/google-deepmind/formal-conjectures/blob/x/"
            "FormalConjectures/A.lean#L1-L1"
        )
        out = dp.extract_source_text(link, tmp_path, {"formalconjectures": pkg})
        assert out == "def c := 1\n"

    def test_lean4_src_lean_remap(self, tmp_path):
        toolchain_src = tmp_path / "toolchain" / "src" / "lean"
        (toolchain_src / "Init").mkdir(parents=True)
        (toolchain_src / "Init" / "Core.lean").write_text("core line\n")
        link = (
            "https://github.com/leanprover/lean4/blob/v4.30.0/src/lean/"
            "Init/Core.lean#L1-L1"
        )
        out = dp.extract_source_text(link, tmp_path, {"lean4": toolchain_src})
        assert out == "core line\n"

    def test_lean4_src_lake_remap(self, tmp_path):
        base = tmp_path / "toolchain" / "src"
        (base / "lake" / "Lake").mkdir(parents=True)
        (base / "lean").mkdir(parents=True)
        (base / "lake" / "Lake" / "Build.lean").write_text("lake line\n")
        link = (
            "https://github.com/leanprover/lean4/blob/v4.30.0/src/lake/"
            "Lake/Build.lean#L1-L1"
        )
        out = dp.extract_source_text(link, tmp_path, {"lean4": base / "lean"})
        assert out == "lake line\n"

    def test_lean_root_fallback(self, tmp_path):
        (tmp_path / "Sub").mkdir()
        (tmp_path / "Sub" / "F.lean").write_text("root fallback\n")
        link = "https://github.com/o/unknownpkg/blob/x/Sub/F.lean#L1-L1"
        out = dp.extract_source_text(link, tmp_path, {})
        assert out == "root fallback\n"

    def test_any_cache_entry_fallback(self, tmp_path):
        pkg = tmp_path / "whatever"
        (pkg / "Std").mkdir(parents=True)
        (pkg / "Std" / "A.lean").write_text("std a\n")
        link = "https://github.com/o/differentname/blob/x/Std/A.lean#L1-L1"
        out = dp.extract_source_text(link, tmp_path, {"somepkg": pkg})
        assert out == "std a\n"


class TestPackageCache:
    def test_restricted_to_workspace(self, tmp_path):
        for ws, pkg in (("mathlib", "mathlib4"), ("flt", "FLT")):
            p = tmp_path / ws / ".lake" / "packages" / pkg
            p.mkdir(parents=True)
        cache = dp.build_package_cache(tmp_path, "mathlib")
        assert "mathlib4" in cache and "flt" not in cache

    def test_all_workspaces_when_unrestricted(self, tmp_path, monkeypatch):
        from lean_explore_tpu.extract import packages

        monkeypatch.setattr(
            dp, "get_extraction_order", lambda: ["mathlib", "flt"]
        )
        for ws, pkg in (("mathlib", "mathlib4"), ("flt", "FLT")):
            p = tmp_path / ws / ".lake" / "packages" / pkg
            p.mkdir(parents=True)
        cache = dp.build_package_cache(tmp_path)
        assert {"mathlib4", "flt"} <= set(cache)

    def test_toolchain_src_mapping(self, tmp_path, monkeypatch):
        ws = tmp_path / "mathlib"
        ws.mkdir()
        (ws / "lean-toolchain").write_text("leanprover/lean4:v4.30.0-rc2\n")
        fake_home = tmp_path / "home"
        src = (
            fake_home / ".elan" / "toolchains"
            / "leanprover--lean4---v4.30.0-rc2" / "src" / "lean"
        )
        src.mkdir(parents=True)
        monkeypatch.setenv("HOME", str(fake_home))
        import pathlib

        monkeypatch.setattr(pathlib.Path, "home", classmethod(lambda cls: fake_home))
        cache = dp.build_package_cache(tmp_path, "mathlib")
        assert cache.get("lean4") == src

    def test_empty_root(self, tmp_path):
        assert dp.build_package_cache(tmp_path, "mathlib") == {}


class TestVersoDocstrings:
    def _rows(self):
        return [
            dict(
                module="Mathlib.A",
                name="Mathlib.A.markdown_doc",
                start=1,
                end=1,
                docstring="md doc",
                source_url="URL",
            ),
            dict(
                module="Mathlib.A", name="Mathlib.A.verso_only", start=1, end=1,
                source_url="URL",
            ),
        ]

    def _parse(self, tmp_path, **db_kwargs):
        src = tmp_path / "pkg"
        (src / "Mathlib").mkdir(parents=True)
        (src / "Mathlib" / "A.lean").write_text("def x := 1\n")
        db = tmp_path / "api-docs.db"
        url = (
            "https://github.com/leanprover-community/mathlib4/blob/x/"
            "Mathlib/A.lean"
        )
        rows = self._rows()
        for r in rows:
            r["source_url"] = url
        make_db(db, rows, **db_kwargs)
        return dp.parse_sqlite_docs(db, tmp_path, {"mathlib4": src}, ["Mathlib"])

    def test_markdown_preferred(self, tmp_path):
        decls = self._parse(
            tmp_path,
            verso_table=True,
            verso_rows=[("Mathlib.A", 0, b"\x01verso")],
        )
        assert decls[0].docstring == "md doc"

    def test_verso_only_stored_as_none_and_counted(self, tmp_path, caplog):
        import logging

        with caplog.at_level(logging.WARNING):
            decls = self._parse(
                tmp_path,
                verso_table=True,
                verso_rows=[("Mathlib.A", 1, b"\x01verso")],
            )
        assert decls[1].docstring is None
        assert any("Verso-only" in r.message for r in caplog.records)

    def test_db_without_verso_table(self, tmp_path):
        decls = self._parse(tmp_path)
        assert [d.docstring for d in decls] == ["md doc", None]

    def test_db_without_markdown_table(self, tmp_path):
        decls = self._parse(tmp_path, markdown_table=False, verso_table=True)
        assert [d.docstring for d in decls] == [None, None]


class TestSqliteParseFilters:
    def _workspace(self, tmp_path, rows):
        src = tmp_path / "pkg"
        (src / "Mathlib").mkdir(parents=True)
        (src / "Mathlib" / "A.lean").write_text("def x := 1\ndef y := 2\n")
        db = tmp_path / "api-docs.db"
        url = (
            "https://github.com/leanprover-community/mathlib4/blob/x/"
            "Mathlib/A.lean"
        )
        for r in rows:
            r.setdefault("source_url", url)
        make_db(db, rows)
        return db, tmp_path, {"mathlib4": src}

    def test_render_zero_excluded(self, tmp_path):
        db, root, cache = self._workspace(
            tmp_path,
            [
                dict(module="Mathlib.A", name="Mathlib.keep", start=1, end=1),
                dict(
                    module="Mathlib.A", name="Mathlib.hidden", start=1, end=1,
                    render=0,
                ),
            ],
        )
        names = [d.name for d in dp.parse_sqlite_docs(db, root, cache, ["Mathlib"])]
        assert names == ["Mathlib.keep"]

    def test_mk_constructors_excluded(self, tmp_path):
        db, root, cache = self._workspace(
            tmp_path,
            [
                dict(module="Mathlib.A", name="Mathlib.Prod.mk", start=1, end=1),
                dict(module="Mathlib.A", name="Mathlib.keep", start=1, end=1),
            ],
        )
        names = [d.name for d in dp.parse_sqlite_docs(db, root, cache, ["Mathlib"])]
        assert names == ["Mathlib.keep"]

    def test_module_prefix_filter_is_component_wise(self, tmp_path):
        db, root, cache = self._workspace(
            tmp_path,
            [
                dict(module="Mathlib.A", name="Mathlib.keep", start=1, end=1),
                dict(module="MathlibExtra.A", name="Other.skip", start=1, end=1),
            ],
        )
        # "MathlibExtra" must NOT match prefix "Mathlib" (component match).
        names = [d.name for d in dp.parse_sqlite_docs(db, root, cache, ["Mathlib"])]
        assert names == ["Mathlib.keep"]

    def test_self_dependency_excluded(self, tmp_path):
        blob = tag_const("Mathlib.self_ref", tag_const("Nat", text("x")))
        db, root, cache = self._workspace(
            tmp_path,
            [
                dict(
                    module="Mathlib.A", name="Mathlib.self_ref", start=1, end=1,
                    type_blob=blob,
                ),
            ],
        )
        decls = dp.parse_sqlite_docs(db, root, cache, ["Mathlib"])
        assert decls[0].dependencies == ["Nat"]

    def test_no_source_url_and_non_core_module_skipped(self, tmp_path):
        db, root, cache = self._workspace(
            tmp_path,
            [
                dict(
                    module="Mathlib.A", name="Mathlib.nourl", start=1, end=1,
                    source_url=None,
                ),
            ],
        )
        assert dp.parse_sqlite_docs(db, root, cache, ["Mathlib"]) == []

    def test_unreadable_source_row_skipped(self, tmp_path):
        db, root, cache = self._workspace(
            tmp_path,
            [
                dict(module="Mathlib.A", name="Mathlib.keep", start=1, end=1),
                dict(module="Mathlib.A", name="Mathlib.bad", start=90, end=99),
            ],
        )
        names = [d.name for d in dp.parse_sqlite_docs(db, root, cache, ["Mathlib"])]
        assert names == ["Mathlib.keep"]


class TestFormatDetectionFallbacks:
    def _ws(self, tmp_path):
        build = tmp_path / "ws" / ".lake" / "build"
        build.mkdir(parents=True)
        return tmp_path / "ws", build

    def test_empty_db_falls_back_to_bmp(self, tmp_path):
        ws, build = self._ws(tmp_path)
        (build / "api-docs.db").touch()
        bmp = build / "doc-data" / "Mod"
        bmp.mkdir(parents=True)
        (bmp / "a.bmp").write_text("{}")
        assert dp.detect_docgen_format(ws) == "bmp"

    def test_empty_db_without_bmp_is_none(self, tmp_path):
        ws, build = self._ws(tmp_path)
        (build / "api-docs.db").touch()
        assert dp.detect_docgen_format(ws) == "none"

    def test_corrupt_db_falls_back(self, tmp_path):
        ws, build = self._ws(tmp_path)
        (build / "api-docs.db").write_bytes(b"this is not sqlite at all" * 10)
        assert dp.detect_docgen_format(ws) == "none"

    def test_db_missing_tables_falls_back(self, tmp_path):
        ws, build = self._ws(tmp_path)
        conn = sqlite3.connect(str(build / "api-docs.db"))
        conn.execute("CREATE TABLE name_info (x INT)")
        conn.commit()
        conn.close()
        assert dp.detect_docgen_format(ws) == "none"

    def test_valid_db_detected(self, tmp_path):
        ws, build = self._ws(tmp_path)
        make_db(build / "api-docs.db", [])
        assert dp.detect_docgen_format(ws) == "sqlite"

    def test_empty_doc_data_dir_is_none(self, tmp_path):
        ws, build = self._ws(tmp_path)
        (build / "doc-data").mkdir()
        assert dp.detect_docgen_format(ws) == "none"


class TestBmpCorners:
    def _bmp(self, tmp_path, declarations, module="Std.A"):
        src = tmp_path / "pkg"
        (src / "Std").mkdir(parents=True)
        (src / "Std" / "A.lean").write_text("def a := 1\n")
        path = tmp_path / "mod.bmp"
        path.write_text(json.dumps({"name": module, "declarations": declarations}))
        return [path], tmp_path, {"std": src}

    def _decl(self, name, header="", line=1):
        return {
            "info": {
                "name": name,
                "doc": f"doc {name}",
                "sourceLink": (
                    f"https://github.com/o/std/blob/x/Std/A.lean#L{line}-L{line}"
                ),
            },
            "header": header,
        }

    def test_module_filter(self, tmp_path):
        files, root, cache = self._bmp(
            tmp_path, [self._decl("Std.a")], module="Other.Mod"
        )
        assert dp.parse_bmp_docs(files, root, cache, ["Std"]) == []

    def test_mk_filtered(self, tmp_path):
        files, root, cache = self._bmp(
            tmp_path, [self._decl("Std.Prod.mk"), self._decl("Std.keep")]
        )
        names = [d.name for d in dp.parse_bmp_docs(files, root, cache, ["Std"])]
        assert names == ["Std.keep"]

    def test_missing_source_skipped(self, tmp_path):
        bad = self._decl("Std.bad", line=99)
        files, root, cache = self._bmp(tmp_path, [bad, self._decl("Std.ok")])
        names = [d.name for d in dp.parse_bmp_docs(files, root, cache, ["Std"])]
        assert names == ["Std.ok"]

    def test_header_dependencies_dedup_and_self_excluded(self, tmp_path):
        header = (
            '<a href="Mod.html#Nat.add">+</a>'
            '<a href="Mod.html#Std.x">x</a>'
            '<a href="Mod.html#Nat.add">again</a>'
        )
        files, root, cache = self._bmp(tmp_path, [self._decl("Std.x", header)])
        decls = dp.parse_bmp_docs(files, root, cache, ["Std"])
        assert decls[0].dependencies == ["Nat.add"]

    def test_absent_header_means_no_deps(self, tmp_path):
        files, root, cache = self._bmp(tmp_path, [self._decl("Std.y")])
        decls = dp.parse_bmp_docs(files, root, cache, ["Std"])
        assert decls[0].dependencies is None

    def test_docstring_carried(self, tmp_path):
        files, root, cache = self._bmp(tmp_path, [self._decl("Std.z")])
        decls = dp.parse_bmp_docs(files, root, cache, ["Std"])
        assert decls[0].docstring == "doc Std.z"


class TestProjectionFilterCorners:
    def _mk(self, name, source, module="M"):
        return ParsedDeclaration(
            name=name, module=module, source_text=source, source_link="https://x"
        )

    def test_requires_uppercase_after_to(self):
        decls = [
            self._mk("A.total", "shared"),
            self._mk("A", "shared"),
        ]
        kept, removed = dp.filter_projections(decls)
        assert removed == 0

    def test_short_to_name_kept(self):
        decls = [self._mk("A.to", "shared"), self._mk("A", "shared")]
        kept, removed = dp.filter_projections(decls)
        assert removed == 0

    def test_three_way_shared_source(self):
        decls = [
            self._mk("S", "structure S extends A, B"),
            self._mk("S.toA", "structure S extends A, B"),
            self._mk("S.toB", "structure S extends A, B"),
        ]
        kept, removed = dp.filter_projections(decls)
        assert removed == 2
        assert [d.name for d in kept] == ["S"]

    def test_to_projection_with_unique_source_kept(self):
        decls = [
            self._mk("S.toA", "def toA := by constructor"),
            self._mk("Other", "def other := 1"),
        ]
        kept, removed = dp.filter_projections(decls)
        assert removed == 0

    def test_empty_and_singleton(self):
        assert dp.filter_projections([]) == ([], 0)
        single = [self._mk("S.toA", "x")]
        kept, removed = dp.filter_projections(single)
        assert kept == single and removed == 0

    def test_whitespace_only_difference_still_shared(self):
        decls = [
            self._mk("S", "structure  S\n  extends A"),
            self._mk("S.toA", "structure S extends A"),
        ]
        kept, removed = dp.filter_projections(decls)
        assert removed == 1


class TestStripCommentsCorners:
    def test_unterminated_block_comment(self):
        assert dp.strip_lean_comments("def x := 1 /- runs off") == "def x := 1"

    def test_comment_markers_inside_line_comment(self):
        assert dp.strip_lean_comments("def x := 1 -- has /- marker") == "def x := 1"

    def test_adjacent_comments(self):
        out = dp.strip_lean_comments("/- a -/ /- b -/ def x := 1")
        assert out == "def x := 1"

    def test_doc_comment_then_attribute(self):
        out = dp.strip_lean_comments("/-- doc -/\n@[simp]\ntheorem t := rfl")
        assert out == "@[simp] theorem t := rfl"

    def test_triple_nested_blocks(self):
        out = dp.strip_lean_comments("def x /- 1 /- 2 /- 3 -/ -/ -/ := 1")
        assert out == "def x := 1"


class TestInsertIdempotency:
    def test_rerun_inserts_only_new(self, tmp_path, monkeypatch):
        store = DeclarationStore(":memory:", create=True)
        ws = tmp_path / "mathlib"
        build = ws / ".lake" / "build"
        build.mkdir(parents=True)
        src = tmp_path / "mathlib" / ".lake" / "packages" / "mathlib4"
        (src / "Mathlib").mkdir(parents=True)
        (src / "Mathlib" / "A.lean").write_text("def x := 1\ndef y := 2\n")
        url = (
            "https://github.com/leanprover-community/mathlib4/blob/x/"
            "Mathlib/A.lean"
        )
        make_db(
            build / "api-docs.db",
            [
                dict(
                    module="Mathlib.A", name="Mathlib.x", start=1, end=1,
                    source_url=url,
                )
            ],
        )
        monkeypatch.setattr(dp, "get_extraction_order", lambda: ["mathlib"])
        first = dp.extract_declarations(store, tmp_path)
        second = dp.extract_declarations(store, tmp_path)
        assert first == 1 and second == 0
        store.close()
