import Lake
open Lake DSL

package «mathlib-extract-ws» where
  -- Lake workspace driving doc-gen4 over Mathlib (plus the Init/Lean/Std
  -- core modules its toolchain ships). Consumed by the extraction
  -- pipeline (lean_explore_tpu.extract.doc_gen4).

lean_lib «MathExtract» where
  roots := #[`MathExtract]

require «doc-gen4» from git
  "https://github.com/leanprover/doc-gen4" @ "main"

require mathlib from git
  "https://github.com/leanprover-community/mathlib4.git"
