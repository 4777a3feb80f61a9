"""Shared helpers for the tools/ experiment scripts."""

from __future__ import annotations

import subprocess
from pathlib import Path


def drop_caches() -> None:
    """Cold-read setup: flush dirty pages, then drop the page cache.
    Requires root (/proc/sys/vm/drop_caches)."""
    subprocess.run(["sync"], check=True)
    Path("/proc/sys/vm/drop_caches").write_text("3")


def du_bytes(path: str) -> int:
    out = subprocess.run(["du", "-sb", path], capture_output=True, text=True, check=True)
    return int(out.stdout.split()[0])
