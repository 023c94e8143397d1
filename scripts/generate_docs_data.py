"""Generate API documentation data for the website.

Walks the lean_explore_tpu package with Python's ast module (the reference
uses griffe, which is not a dependency here) and emits
``data/module_data.json``: per module, its docstring plus every public
class/function with signature, docstring, and line span.

Usage:
    python scripts/generate_docs_data.py [--output data/module_data.json]
"""

import argparse
import ast
import json
from pathlib import Path

PACKAGE_ROOT = Path(__file__).resolve().parent.parent / "lean_explore_tpu"


def _signature(node: ast.FunctionDef | ast.AsyncFunctionDef) -> str:
    """Render a readable signature from the AST."""
    parts: list[str] = []
    args = node.args
    positional = args.posonlyargs + args.args
    defaults = [None] * (len(positional) - len(args.defaults)) + list(args.defaults)
    for arg, default in zip(positional, defaults):
        text = arg.arg
        if arg.annotation is not None:
            text += f": {ast.unparse(arg.annotation)}"
        if default is not None:
            text += f" = {ast.unparse(default)}"
        parts.append(text)
    if args.vararg:
        parts.append(f"*{args.vararg.arg}")
    elif args.kwonlyargs:
        parts.append("*")
    for arg, default in zip(args.kwonlyargs, args.kw_defaults):
        text = arg.arg
        if arg.annotation is not None:
            text += f": {ast.unparse(arg.annotation)}"
        if default is not None:
            text += f" = {ast.unparse(default)}"
        parts.append(text)
    if args.kwarg:
        parts.append(f"**{args.kwarg.arg}")
    returns = f" -> {ast.unparse(node.returns)}" if node.returns else ""
    prefix = "async def" if isinstance(node, ast.AsyncFunctionDef) else "def"
    return f"{prefix} {node.name}({', '.join(parts)}){returns}"


def _describe_function(node) -> dict:
    return {
        "kind": "function",
        "name": node.name,
        "signature": _signature(node),
        "docstring": ast.get_docstring(node),
        "lineno": node.lineno,
        "end_lineno": node.end_lineno,
    }


def _describe_class(node: ast.ClassDef) -> dict:
    methods = [
        _describe_function(child)
        for child in node.body
        if isinstance(child, (ast.FunctionDef, ast.AsyncFunctionDef))
        and not child.name.startswith("_")
    ]
    bases = [ast.unparse(base) for base in node.bases]
    return {
        "kind": "class",
        "name": node.name,
        "bases": bases,
        "docstring": ast.get_docstring(node),
        "methods": methods,
        "lineno": node.lineno,
        "end_lineno": node.end_lineno,
    }


def describe_module(path: Path, module_name: str) -> dict:
    tree = ast.parse(path.read_text())
    members = []
    for node in tree.body:
        if isinstance(node, ast.ClassDef) and not node.name.startswith("_"):
            members.append(_describe_class(node))
        elif isinstance(
            node, (ast.FunctionDef, ast.AsyncFunctionDef)
        ) and not node.name.startswith("_"):
            members.append(_describe_function(node))
    return {
        "module": module_name,
        "file": str(path.relative_to(PACKAGE_ROOT.parent)),
        "docstring": ast.get_docstring(tree),
        "members": members,
    }


def generate(output_path: Path) -> dict:
    modules = {}
    for path in sorted(PACKAGE_ROOT.rglob("*.py")):
        relative = path.relative_to(PACKAGE_ROOT.parent)
        module_name = ".".join(relative.with_suffix("").parts)
        if module_name.endswith(".__init__"):
            module_name = module_name[: -len(".__init__")]
        modules[module_name] = describe_module(path, module_name)
    payload = {"package": "lean_explore_tpu", "modules": modules}
    output_path.parent.mkdir(parents=True, exist_ok=True)
    output_path.write_text(json.dumps(payload, indent=2))
    return payload


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--output",
        type=Path,
        default=PACKAGE_ROOT.parent / "data" / "module_data.json",
    )
    args = parser.parse_args()
    payload = generate(args.output)
    total_members = sum(len(m["members"]) for m in payload["modules"].values())
    print(
        f"Wrote {args.output}: {len(payload['modules'])} modules, "
        f"{total_members} documented members"
    )


if __name__ == "__main__":
    main()
