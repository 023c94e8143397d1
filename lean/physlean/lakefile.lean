import Lake
open Lake DSL

package «physlean-extract-ws» where
  -- Lake workspace driving doc-gen4 over PhysLean.

@[default_target]
lean_lib «PhysExtract» where
  roots := #[`PhysExtract]

require «doc-gen4» from git
  "https://github.com/leanprover/doc-gen4" @ "main"

require PhysLean from git
  "https://github.com/HEPLean/PhysLean"
