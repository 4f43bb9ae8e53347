"""Crash-recoverable versioned state directories, shared by the
streaming index-maintenance modules (``ann_ingest.py`` — IVF centroids
+ postings; ``index_ingest.py`` — inverted-index postings + BM25
stats).

The invariant: a state that consists of MULTIPLE tables which must
agree (centroids and their postings; postings and their corpus stats)
is never swapped in place. A re-fit writes a complete new ``v{n+1}``
directory, then flips a one-line ``CURRENT`` pointer with an atomic
``os.replace``. A crash anywhere before the flip leaves ``v{n}`` fully
live and ``v{n+1}`` as an orphan the next writer sweeps; there is no
window in which the tables disagree. At cluster scale the pointer file
becomes a catalog entry / transactional-table snapshot — the read and
compute shapes are unchanged by that swap.
"""

from __future__ import annotations

import os
import shutil

CURRENT_FILE = "CURRENT"


def current_version(state_dir: str) -> int | None:
    cur = os.path.join(state_dir, CURRENT_FILE)
    if not os.path.exists(cur):
        return None
    with open(cur) as f:
        return int(f.read().strip().lstrip("v"))


def version_dir(state_dir: str, version: int) -> str:
    return os.path.join(state_dir, f"v{version}")


def flip_current(state_dir: str, version: int) -> None:
    """Atomically point CURRENT at ``v{version}`` (write-temp +
    os.replace — POSIX rename atomicity; readers see old or new,
    never a torn pointer)."""
    cur = os.path.join(state_dir, CURRENT_FILE)
    tmp = cur + ".tmp"
    with open(tmp, "w") as f:
        f.write(f"v{version}\n")
    os.replace(tmp, cur)


def gc_orphans(state_dir: str) -> None:
    """Remove version directories other than CURRENT — crash leftovers
    from an interrupted build/refit (pre-flip: the orphan is the new
    version; post-flip: the orphan is the superseded one)."""
    live = current_version(state_dir)
    if live is None:
        return
    for name in os.listdir(state_dir):
        if name.startswith("v") and name != f"v{live}":
            path = os.path.join(state_dir, name)
            if os.path.isdir(path):
                shutil.rmtree(path)
