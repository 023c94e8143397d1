import Lake
open Lake DSL

package «formal-conjectures-extract-ws» where
  -- Lake workspace driving doc-gen4 over formal-conjectures. The upstream
  -- libraries are built directly (no umbrella root needed).

require «doc-gen4» from git
  "https://github.com/leanprover/doc-gen4" @ "main"

require «formal_conjectures» from git
  "https://github.com/google-deepmind/formal-conjectures" @ "main"
