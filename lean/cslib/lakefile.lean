import Lake
open Lake DSL

package «cslib-extract-ws» where
  -- Lake workspace driving doc-gen4 over CSLib.

@[default_target]
lean_lib «CslibExtract» where
  roots := #[`CslibExtract]

require «doc-gen4» from git
  "https://github.com/leanprover/doc-gen4" @ "main"

require Cslib from git
  "https://github.com/leanprover/cslib"
