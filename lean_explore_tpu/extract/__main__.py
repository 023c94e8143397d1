"""Extraction pipeline CLI: ``python -m lean_explore_tpu.extract``.

Stage parity with the reference orchestrator (extract/__main__.py:118-381):
schema -> doc-gen4 -> parse -> informalize -> embed -> index, all stages on
by default, each individually toggleable, each idempotent/resumable. Output
goes to a timestamped extraction directory under the data root (or the most
recent one with --use-latest).
"""

import asyncio
import logging
import sys
from pathlib import Path

import click

from lean_explore_tpu.config import Config
from lean_explore_tpu.models import DeclarationStore
from lean_explore_tpu.util.logging import setup_logging

logger = logging.getLogger(__name__)


async def run_pipeline(
    extraction_path: Path,
    *,
    run_docgen: bool,
    run_parse: bool,
    run_informalize: bool,
    run_embed: bool,
    run_index: bool,
    lean_root: Path,
    informalize_model: str,
    max_concurrent: int,
    embed_batch_size: int,
    limit: int | None,
) -> None:
    db_path = extraction_path / "declarations.db"
    store = DeclarationStore(db_path, create=True)

    try:
        if run_docgen:
            from lean_explore_tpu.extract.doc_gen4 import run_doc_gen4

            logger.info("=== stage: doc-gen4 ===")
            run_doc_gen4(lean_root)

        if run_parse:
            from lean_explore_tpu.extract.doc_parser import extract_declarations

            logger.info("=== stage: parse declarations ===")
            extract_declarations(store, lean_root)

        if run_informalize:
            from lean_explore_tpu.extract.informalize import (
                informalize_declarations,
            )

            logger.info("=== stage: informalize ===")
            await informalize_declarations(
                store,
                model=informalize_model,
                max_concurrent=max_concurrent,
                limit=limit,
            )

        if run_embed:
            from lean_explore_tpu.extract.embeddings import generate_embeddings

            logger.info("=== stage: embeddings ===")
            generate_embeddings(store, batch_size=embed_batch_size, limit=limit)

        if run_index:
            from lean_explore_tpu.extract.index import build_indices

            logger.info("=== stage: index artifacts ===")
            build_indices(store, extraction_path)
    finally:
        store.close()


@click.command()
@click.option("--run-doc-gen4", "run_docgen", is_flag=True, help="Run only doc-gen4.")
@click.option("--parse", "run_parse", is_flag=True, help="Run only parsing.")
@click.option(
    "--informalize", "run_informalize", is_flag=True, help="Run only informalization."
)
@click.option("--embed", "run_embed", is_flag=True, help="Run only embedding.")
@click.option("--index", "run_index", is_flag=True, help="Run only index build.")
@click.option(
    "--use-latest",
    is_flag=True,
    help="Reuse the most recent timestamped extraction directory.",
)
@click.option(
    "--lean-root",
    type=click.Path(path_type=Path),
    default=None,
    help="Root of Lean package workspaces (default: configured PACKAGES_ROOT).",
)
@click.option(
    "--model",
    "informalize_model",
    default="google/gemini-3-flash-preview",
    show_default=True,
    help="LLM for informalization.",
)
@click.option(
    "--max-concurrent",
    default=100,
    show_default=True,
    help="Concurrent LLM requests.",
)
@click.option(
    "--batch-size",
    "embed_batch_size",
    default=250,
    show_default=True,
    help="Corpus embedding batch size.",
)
@click.option("--limit", type=int, default=None, help="Cap processed rows (smoke).")
@click.option("--verbose", is_flag=True)
def main(
    run_docgen,
    run_parse,
    run_informalize,
    run_embed,
    run_index,
    use_latest,
    lean_root,
    informalize_model,
    max_concurrent,
    embed_batch_size,
    limit,
    verbose,
):
    """Run the extraction pipeline (all stages unless specific flags given)."""
    setup_logging(verbose)

    any_flag = any([run_docgen, run_parse, run_informalize, run_embed, run_index])
    if not any_flag:
        run_docgen = run_parse = run_informalize = run_embed = run_index = True

    if use_latest:
        extraction_path = Config.get_latest_extraction_path()
        if extraction_path is None:
            click.echo("No existing extraction directory found.", err=True)
            sys.exit(1)
    else:
        extraction_path = Config.create_timestamped_extraction_path()
    click.echo(f"Extraction directory: {extraction_path}")

    asyncio.run(
        run_pipeline(
            extraction_path,
            run_docgen=run_docgen,
            run_parse=run_parse,
            run_informalize=run_informalize,
            run_embed=run_embed,
            run_index=run_index,
            lean_root=lean_root or Config.PACKAGES_ROOT,
            informalize_model=informalize_model,
            max_concurrent=max_concurrent,
            embed_batch_size=embed_batch_size,
            limit=limit,
        )
    )


if __name__ == "__main__":
    main()
