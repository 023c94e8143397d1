"""``lean-explore data`` commands: fetch and clean index artifacts.

Parity surface: reference cli/data_commands.py:26-254 — version-addressed
downloads from remote storage (latest.txt resolution), active_version
pointer, old-version pruning — adapted to this framework's 7-file TPU
artifact set (config.REQUIRED_INDEX_FILES).
"""

import logging
import shutil
from pathlib import Path

import click
import requests
from rich.console import Console
from rich.progress import (
    BarColumn,
    DownloadColumn,
    Progress,
    TextColumn,
    TransferSpeedColumn,
)

from lean_explore_tpu.config import REQUIRED_INDEX_FILES, Config

logger = logging.getLogger(__name__)


def fetch_latest_version(base_url: str | None = None) -> str:
    """Resolve the newest published version via <assets>/latest.txt."""
    url = f"{base_url or Config.R2_ASSETS_BASE_URL}/assets/latest.txt"
    try:
        response = requests.get(url, timeout=10)
        response.raise_for_status()
        return response.text.strip()
    except requests.exceptions.RequestException as error:
        raise ValueError(f"Failed to fetch latest version: {error}") from error


def download_file(url: str, destination: Path, progress: Progress) -> None:
    """Stream to a temp file and rename atomically: an interrupted download
    must never leave a truncated file at the final path, because the
    resume pass skips any existing file and serving would then load a
    corrupt artifact."""
    destination.parent.mkdir(parents=True, exist_ok=True)
    response = requests.get(url, stream=True, timeout=300)
    response.raise_for_status()
    total = int(response.headers.get("content-length", 0))
    task_id = progress.add_task(destination.name, total=total)
    partial = destination.with_suffix(destination.suffix + ".part")
    try:
        with open(partial, "wb") as f:
            for chunk in response.iter_content(chunk_size=1 << 16):
                f.write(chunk)
                progress.update(task_id, advance=len(chunk))
        if total and partial.stat().st_size != total:
            raise OSError(
                f"short download: {partial.stat().st_size} of {total} bytes"
            )
        partial.replace(destination)
    finally:
        partial.unlink(missing_ok=True)


def write_active_version(version: str) -> None:
    marker = Config.CACHE_DIRECTORY.parent / "active_version"
    marker.parent.mkdir(parents=True, exist_ok=True)
    marker.write_text(version)
    logger.info("active version -> %s", version)


def cleanup_old_versions(keep: str) -> None:
    if not Config.CACHE_DIRECTORY.exists():
        return
    for item in Config.CACHE_DIRECTORY.iterdir():
        if item.is_dir() and item.name != keep:
            logger.info("removing old version %s", item.name)
            shutil.rmtree(item, ignore_errors=True)


def install_toolchain(
    version: str | None = None, base_url: str | None = None
) -> str:
    """Download every artifact for a version, activate it, prune the rest."""
    console = Console()
    base = base_url or Config.R2_ASSETS_BASE_URL
    if not version:
        console.print("Fetching latest version...")
        version = fetch_latest_version(base)
    console.print(f"Installing version: [bold]{version}[/bold]")

    asset_base = f"{base}/assets/{version}"
    cache_path = Config.CACHE_DIRECTORY / version
    with Progress(
        TextColumn("[bold blue]{task.description}"),
        BarColumn(),
        DownloadColumn(),
        TransferSpeedColumn(),
        console=console,
    ) as progress:
        for filename in REQUIRED_INDEX_FILES:
            destination = cache_path / filename
            if destination.exists():
                logger.info("skipping existing %s", filename)
                continue
            try:
                download_file(f"{asset_base}/{filename}", destination, progress)
            except requests.exceptions.RequestException as error:
                raise ValueError(
                    f"Failed to download {asset_base}/{filename}: {error}"
                ) from error

    write_active_version(version)
    cleanup_old_versions(version)
    console.print(f"[green]Installed data for version {version}[/green]")
    return version


@click.group(name="data")
def data_group():
    """Manage local index-artifact versions (download, clean)."""


@data_group.command()
@click.option(
    "--version",
    "-v",
    default=None,
    help="Version to install (e.g. '20260127_103630'). Defaults to latest.",
)
def fetch(version):
    """Fetch and install the index artifacts from remote storage."""
    try:
        install_toolchain(version)
    except ValueError as error:
        raise click.ClickException(str(error)) from error


@data_group.command()
@click.argument("source", type=click.Path(exists=True, path_type=Path))
@click.option(
    "--output",
    "-o",
    type=click.Path(path_type=Path),
    default=None,
    help="Artifact output directory (default: the active cache version dir).",
)
@click.option(
    "--version",
    "-v",
    default="converted",
    help="Version label to install the converted artifacts under.",
)
def convert(source, output, version):
    """Convert a REFERENCE data set into this framework's artifacts.

    SOURCE is a lean_explore.db produced by the reference (or a directory
    containing one — e.g. ~/.lean_explore/cache/<version>/). The reference's
    sqlite schema and embedding blob format are byte-compatible with this
    framework's store, so conversion copies the database and rebuilds the
    dense + BM25 artifacts from it; the FAISS/bm25s files are not needed
    (embeddings live in the db, reference models/search_db.py:44-76).
    """
    from lean_explore_tpu.index import build_index_artifacts
    from lean_explore_tpu.models import DeclarationStore

    console = Console()
    db_path = source / "lean_explore.db" if source.is_dir() else source
    if not db_path.exists():
        raise click.ClickException(f"No lean_explore.db found under {source}")
    destination = output or (Config.CACHE_DIRECTORY / version)
    destination.mkdir(parents=True, exist_ok=True)
    console.print(f"Converting [bold]{db_path}[/bold] -> {destination}")
    shutil.copyfile(db_path, destination / "declarations.db")
    store = DeclarationStore(destination / "declarations.db")
    try:
        manifest = build_index_artifacts(store, destination)
    finally:
        store.close()
    if output is None:
        write_active_version(version)
    console.print(
        f"[green]Converted {manifest['n_declarations']} declarations "
        f"({manifest['n_embedded']} embedded) into {destination}[/green]"
    )


@data_group.command()
@click.confirmation_option(prompt="Delete all cached data?")
def clean():
    """Remove all downloaded index-artifact versions."""
    console = Console()
    marker = Config.CACHE_DIRECTORY.parent / "active_version"
    if not Config.CACHE_DIRECTORY.exists() and not marker.exists():
        console.print("[yellow]No local data found to clean.[/yellow]")
        return
    try:
        if Config.CACHE_DIRECTORY.exists():
            shutil.rmtree(Config.CACHE_DIRECTORY)
        if marker.exists():
            marker.unlink()
        console.print("[green]Data cache cleared.[/green]")
    except OSError as error:
        raise click.ClickException(f"Error cleaning data: {error}") from error
