import Lake
open Lake DSL

package «flt-extract-ws» where
  -- Lake workspace driving doc-gen4 over FLT.

@[default_target]
lean_lib «FLTExtract» where
  roots := #[`FLTExtract]

require «doc-gen4» from git
  "https://github.com/leanprover/doc-gen4" @ "main"

require FLT from git
  "https://github.com/ImperialCollegeLondon/FLT"
