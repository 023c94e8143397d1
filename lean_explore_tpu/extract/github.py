"""GitHub metadata fetchers for the extraction pipeline.

Parity surface: reference extract/github.py:15-112. Network-gated: every
function raises RuntimeError on failure so callers can retry or skip.
"""

import json
import logging
import re
import urllib.request

logger = logging.getLogger(__name__)

_GITHUB_REPO_RE = re.compile(r"github\.com/([^/]+)/([^/]+?)(?:\.git)?$")
_LEAN_VERSION_RE = re.compile(r"v\d+\.\d+\.\d+(?:-rc\d+)?")
_SEMVER_TAG_RE = re.compile(r"^v?\d+\.\d+\.\d+")


def github_url_to_raw(git_url: str, branch: str, file_path: str) -> str:
    """Repo URL + ref + path -> raw.githubusercontent.com URL."""
    match = _GITHUB_REPO_RE.search(git_url)
    if not match:
        raise ValueError(f"Could not parse GitHub URL: {git_url}")
    owner, repo = match.groups()
    return f"https://raw.githubusercontent.com/{owner}/{repo}/{branch}/{file_path}"


def fetch_lean_toolchain(git_url: str, ref: str = "main") -> str:
    """Fetch a repo's lean-toolchain file contents at a ref."""
    raw_url = github_url_to_raw(git_url, ref, "lean-toolchain")
    logger.info("Fetching lean-toolchain from %s", raw_url)
    try:
        with urllib.request.urlopen(raw_url, timeout=30) as response:
            return response.read().decode("utf-8").strip()
    except Exception as error:  # noqa: BLE001 — network boundary
        raise RuntimeError(
            f"Failed to fetch lean-toolchain from {raw_url}: {error}"
        ) from error


def fetch_latest_tag(git_url: str) -> str:
    """Newest semver-looking tag of a repo (GitHub API)."""
    match = _GITHUB_REPO_RE.search(git_url)
    if not match:
        raise ValueError(f"Could not parse GitHub URL: {git_url}")
    owner, repo = match.groups()
    api_url = f"https://api.github.com/repos/{owner}/{repo}/tags?per_page=100"
    logger.info("Fetching tags from %s", api_url)
    try:
        request = urllib.request.Request(
            api_url, headers={"Accept": "application/vnd.github.v3+json"}
        )
        with urllib.request.urlopen(request, timeout=30) as response:
            tags = json.loads(response.read().decode("utf-8"))
    except Exception as error:  # noqa: BLE001
        raise RuntimeError(f"Failed to fetch tags from {api_url}: {error}") from error

    if not tags:
        raise RuntimeError(f"No tags found for {git_url}")

    semver_tags = [t["name"] for t in tags if _SEMVER_TAG_RE.match(t["name"])]
    if not semver_tags:
        return tags[0]["name"]

    def key(tag: str) -> list[int]:
        return [int(x) for x in re.findall(r"\d+", tag)]

    return max(semver_tags, key=key)


def extract_lean_version(toolchain: str) -> str:
    """'leanprover/lean4:v4.27.0' -> 'v4.27.0' (rc suffixes preserved)."""
    match = _LEAN_VERSION_RE.search(toolchain)
    if not match:
        raise ValueError(f"Could not extract version from toolchain: {toolchain}")
    return match.group()
