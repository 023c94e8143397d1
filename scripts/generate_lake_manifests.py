"""Generate lake-manifest.json + lean-toolchain pins for the Lean workspaces.

The manifests are machine-format Lake lockfiles; the pinned git revisions are
*dataset-release configuration data* — they record the exact upstream states
the published index artifacts were extracted from (mirroring the pins the
reference ships per workspace, e.g. /root/reference/lean/flt/lake-manifest.json),
so a doc-gen4 run reproduces the same corpus. Regenerate the files with:

    python scripts/generate_lake_manifests.py

When upstream moves, run `lake update` in each workspace instead (it rewrites
the manifest natively); this script only exists because the dataset pins must
ship with the repo whether or not a Lean toolchain is installed.
"""

import json
from pathlib import Path

WORKSPACES_ROOT = Path(__file__).resolve().parent.parent / "lean"

# Shared doc-gen4 dependency closure at the v4.30.0-rc2 dataset release.
# Tuples: (url, scope, rev, name, inputRev, inherited, configFile)
_DOCGEN_CLOSURE_430 = [
    ("https://github.com/leanprover-community/plausible", "leanprover-community",
     "86210d4ad1b08b086d0bd638637a75246523dbb8", "plausible", "main", True, "lakefile.toml"),
    ("https://github.com/leanprover-community/LeanSearchClient", "leanprover-community",
     "c5d5b8fe6e5158def25cd28eb94e4141ad97c843", "LeanSearchClient", "main", True, "lakefile.toml"),
    ("https://github.com/leanprover-community/import-graph", "leanprover-community",
     "cdab3938ccabbdb044be6896e251b5814bec932e", "importGraph", "main", True, "lakefile.toml"),
    ("https://github.com/leanprover-community/ProofWidgets4", "leanprover-community",
     "2db6054a44326f8c0230ee0570e2ddb894816511", "proofwidgets", "v0.0.98", True, "lakefile.lean"),
    ("https://github.com/leanprover-community/aesop", "leanprover-community",
     "f0c6e183ea26531e82773feb4b73ab6595ca17a5", "aesop", "v4.30.0-rc2", True, "lakefile.toml"),
    ("https://github.com/leanprover-community/quote4", "leanprover-community",
     "1cc7e819b9b9bc1e87c9edcccb62e0269e00a809", "Qq", "v4.30.0-rc2", True, "lakefile.toml"),
    ("https://github.com/leanprover-community/batteries", "leanprover-community",
     "5c57f3857ba81924a88b2cdf4f062e34ec04ff11", "batteries", "v4.30.0-rc2", True, "lakefile.toml"),
    ("https://github.com/leanprover/lean4-cli", "leanprover",
     "13567aed1ac4f12aea9484178e07e51f8c9f7658", "Cli", "v4.30.0-rc2", True, "lakefile.toml"),
]

_TAIL = [
    ("https://github.com/leanprover/leansqlite", "",
     "c7326b06de365308e008bdfe379909e44334a2e2", "leansqlite", "main", True, "lakefile.lean"),
    ("https://github.com/fgdorais/lean4-unicode-basic", "",
     "05954ce1797e6bd6b414c916499fe6dda4a11702", "UnicodeBasic", "main", True, "lakefile.lean"),
    ("https://github.com/dupuisf/BibtexQuery", "",
     "5d31b64fb703c5d77f6ef4d1fb958f9bdf1ea539", "BibtexQuery", "nightly-testing", True, "lakefile.toml"),
    ("https://github.com/acmepjz/md4lean", "",
     "6a3fb240133bcb7e1a066fdc784b3fdc304e3fc5", "MD4Lean", "main", True, "lakefile.lean"),
]

_DOCGEN_MAIN = ("https://github.com/leanprover/doc-gen4", "",
                "799154a6ee3cefd3c0c89a68a81911fb83b7755c", "«doc-gen4»", "main",
                False, "lakefile.lean")

# workspace -> (toolchain, manifest version, package rows)
PINS: dict[str, tuple[str, str, list[tuple]]] = {
    "cslib": ("leanprover/lean4:v4.30.0-rc2", "1.2.0", [
        ("https://github.com/leanprover/cslib", "",
         "95fdc7dc863ff83e9d6c3a68fcb2505540462a4d", "Cslib", "main", False, "lakefile.toml"),
        _DOCGEN_MAIN,
        ("https://github.com/leanprover-community/mathlib4", "leanprover-community",
         "5450b53e5ddc75d46418fabb605edbf36bd0beb6", "mathlib", "master", True, "lakefile.lean"),
        *_DOCGEN_CLOSURE_430,
        *_TAIL,
    ]),
    "flt": ("leanprover/lean4:v4.30.0-rc2", "1.2.0", [
        ("https://github.com/ImperialCollegeLondon/FLT", "",
         "e8c35753f741cf30ffc59dcec88b5ce4e36f37b7", "FLT", "main", False, "lakefile.toml"),
        _DOCGEN_MAIN,
        ("https://github.com/PatrickMassot/checkdecls.git", "",
         "3d425859e73fcfbef85b9638c2a91708ef4a22d4", "checkdecls", None, True, "lakefile.lean"),
        ("https://github.com/leanprover-community/mathlib4.git", "",
         "8e3c989104daaa052921bf43de9eef0e1ac9fbf5", "mathlib", None, True, "lakefile.lean"),
        ("https://github.com/leanprover-community/plausible", "leanprover-community",
         "264309b5c0c10e569025a53ab6440a45c03133e4", "plausible", "main", True, "lakefile.toml"),
        ("https://github.com/leanprover-community/LeanSearchClient", "leanprover-community",
         "c5d5b8fe6e5158def25cd28eb94e4141ad97c843", "LeanSearchClient", "main", True, "lakefile.toml"),
        ("https://github.com/leanprover-community/import-graph", "leanprover-community",
         "4411c5f89c797401c609b3a946c8874569e69731", "importGraph", "main", True, "lakefile.toml"),
        ("https://github.com/leanprover-community/ProofWidgets4", "leanprover-community",
         "82d457fb3bdd9efadbae06608ff337d689efdddf", "proofwidgets", "v0.0.97", True, "lakefile.lean"),
        ("https://github.com/leanprover-community/aesop", "leanprover-community",
         "f74c7555aaa94eadd7b7bff9170f7983f92aac21", "aesop", "v4.30.0-rc1", True, "lakefile.toml"),
        ("https://github.com/leanprover-community/quote4", "leanprover-community",
         "7aa86cb20b8458748dc24d55dab2d7ea01161057", "Qq", "v4.30.0-rc1", True, "lakefile.toml"),
        ("https://github.com/leanprover-community/batteries", "leanprover-community",
         "bf597c77bf9b8e66720d724928207f5911533113", "batteries", "v4.30.0-rc1", True, "lakefile.toml"),
        ("https://github.com/leanprover/lean4-cli", "leanprover",
         "f7d0ca7c926cdde0562af20394dd25d028b839a5", "Cli", "v4.30.0-rc1", True, "lakefile.toml"),
        *_TAIL,
    ]),
    "formal-conjectures": ("leanprover/lean4:v4.30.0-rc2", "1.2.0", [
        ("https://github.com/google-deepmind/formal-conjectures", "",
         "e6ccabe7bbeecc5c51c5e93152ad2c4acfbff039", "formal_conjectures", "main", False, "lakefile.toml"),
        _DOCGEN_MAIN,
        ("https://github.com/leanprover-community/mathlib4", "leanprover-community",
         "a3a10db0e9d66acbebf76c5e6a135066525ac900", "mathlib", "v4.27.0", True, "lakefile.lean"),
        ("https://github.com/leanprover-community/plausible", "leanprover-community",
         "009dc1e6f2feb2c96c081537d80a0905b2c6498f", "plausible", "main", True, "lakefile.toml"),
        ("https://github.com/leanprover-community/LeanSearchClient", "leanprover-community",
         "5ce7f0a355f522a952a3d678d696bd563bb4fd28", "LeanSearchClient", "main", True, "lakefile.toml"),
        ("https://github.com/leanprover-community/import-graph", "leanprover-community",
         "8f497d55985a189cea8020d9dc51260af1e41ad2", "importGraph", "main", True, "lakefile.toml"),
        ("https://github.com/leanprover-community/ProofWidgets4", "leanprover-community",
         "c04225ee7c0585effbd933662b3151f01b600e40", "proofwidgets", "v0.0.85", True, "lakefile.lean"),
        ("https://github.com/leanprover-community/aesop", "leanprover-community",
         "cb837cc26236ada03c81837bebe0acd9c70ced7d", "aesop", "master", True, "lakefile.toml"),
        ("https://github.com/leanprover-community/quote4", "leanprover-community",
         "bd58c9efe2086d56ca361807014141a860ddbf8c", "Qq", "master", True, "lakefile.toml"),
        ("https://github.com/leanprover-community/batteries", "leanprover-community",
         "b25b36a7caf8e237e7d1e6121543078a06777c8a", "batteries", "main", True, "lakefile.toml"),
        ("https://github.com/leanprover/lean4-cli", "leanprover",
         "55c37290ff6186e2e965d68cf853a57c0702db82", "Cli", "v4.27.0", True, "lakefile.toml"),
        *_TAIL,
    ]),
    "mathlib": ("leanprover/lean4:v4.30.0-rc2", "1.2.0", [
        ("https://github.com/leanprover-community/mathlib4.git", "",
         "700fcd702faa706903e2cde26901b1732c36e951", "mathlib", None, False, "lakefile.lean"),
        _DOCGEN_MAIN,
        *_DOCGEN_CLOSURE_430,
        *_TAIL,
    ]),
    "physlean": ("leanprover/lean4:v4.29.1", "1.1.0", [
        ("https://github.com/HEPLean/PhysLean", "",
         "04ab5a9d13b4e306795ed6970f5ade5dc699c3f7", "PhysLean", None, False, "lakefile.lean"),
        ("https://github.com/leanprover/doc-gen4", "",
         "a0aebd77a6619214a727994fade0e05203fc5252", "«doc-gen4»", "v4.29.1", False, "lakefile.lean"),
        ("https://github.com/leanprover-community/mathlib4.git", "",
         "5e932f97dd25535344f80f9dd8da3aab83df0fe6", "mathlib", "v4.29.1", True, "lakefile.lean"),
        ("https://github.com/leanprover-community/plausible", "leanprover-community",
         "83e90935a17ca19ebe4b7893c7f7066e266f50d3", "plausible", "main", True, "lakefile.toml"),
        ("https://github.com/leanprover-community/LeanSearchClient", "leanprover-community",
         "c5d5b8fe6e5158def25cd28eb94e4141ad97c843", "LeanSearchClient", "main", True, "lakefile.toml"),
        ("https://github.com/leanprover-community/import-graph", "leanprover-community",
         "48d5698bc464786347c1b0d859b18f938420f060", "importGraph", "main", True, "lakefile.toml"),
        ("https://github.com/leanprover-community/ProofWidgets4", "leanprover-community",
         "4dd0959c44d1af0462bd604d0f87c5781307d709", "proofwidgets", "v0.0.95+lean-v4.29.1", True, "lakefile.lean"),
        ("https://github.com/leanprover-community/aesop", "leanprover-community",
         "7152850e7b216a0d409701617721b6e469d34bf6", "aesop", "master", True, "lakefile.toml"),
        ("https://github.com/leanprover-community/quote4", "leanprover-community",
         "707efb56d0696634e9e965523a1bbe9ac6ce141d", "Qq", "master", True, "lakefile.toml"),
        ("https://github.com/leanprover-community/batteries", "leanprover-community",
         "756e3321fd3b02a85ffda19fef789916223e578c", "batteries", "main", True, "lakefile.toml"),
        ("https://github.com/leanprover/lean4-cli", "leanprover",
         "7802da01beb530bf051ab657443f9cd9bc3e1a29", "Cli", "v4.29.0", True, "lakefile.toml"),
        ("https://github.com/kim-em/leansqlite", "",
         "d14544c72b593af6a66131bc34cdab16bf7c0940", "leansqlite", "suppress-reducibility-warning", True, "lakefile.lean"),
        ("https://github.com/fgdorais/lean4-unicode-basic", "",
         "9539e34e5cb2d52a6454d9b6218f6b6835cad071", "UnicodeBasic", "main", True, "lakefile.lean"),
        *_TAIL[2:],  # BibtexQuery + MD4Lean (same pins as the 4.30 set)
    ]),
}


def _package_entry(row: tuple) -> dict:
    url, scope, rev, name, input_rev, inherited, config_file = row
    return {
        "url": url,
        "type": "git",
        "subDir": None,
        "scope": scope,
        "rev": rev,
        "name": name,
        "manifestFile": "lake-manifest.json",
        "inputRev": input_rev,
        "inherited": inherited,
        "configFile": config_file,
    }


def _workspace_package_name(workspace: Path) -> str:
    for line in (workspace / "lakefile.lean").read_text().splitlines():
        if line.startswith("package"):
            return line.split()[1].strip("«»")
    raise ValueError(f"no package declaration in {workspace}/lakefile.lean")


def generate(root: Path = WORKSPACES_ROOT) -> list[Path]:
    written = []
    for workspace_name, (toolchain, version, rows) in PINS.items():
        workspace = root / workspace_name
        manifest = {
            "version": version,
            "packagesDir": ".lake/packages",
            "packages": [_package_entry(r) for r in rows],
            "name": f"«{_workspace_package_name(workspace)}»",
            "lakeDir": ".lake",
        }
        if version >= "1.2.0":
            manifest["fixedToolchain"] = False
        manifest_path = workspace / "lake-manifest.json"
        manifest_path.write_text(json.dumps(manifest, indent=1) + "\n")
        toolchain_path = workspace / "lean-toolchain"
        toolchain_path.write_text(toolchain + "\n")
        written += [manifest_path, toolchain_path]
    return written


if __name__ == "__main__":
    for path in generate():
        print(path)
