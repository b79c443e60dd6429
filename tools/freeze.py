"""Freeze manifest for rotated-out registry entries.

The driver grades only the first ~50 registry entries per round; the
rest keep their evidence from a PRIOR round's green row. That union
argument is sound only while the code backing a rotated-out entry is
byte-identical to what that prior round graded. This tool automates the
manual git-diff audit the round-4 verdict performed:

- ``manifest()`` maps every source file backing a NON-window entry
  (the module defining its ``queries()`` callable, plus the shared
  cross-engine core every oracle leans on) to its sha256.
- ``python tools/freeze.py`` regenerates ``tools/frozen_hashes.json``
  — run it ONLY when rotating the window, i.e. when every entry whose
  backing file changed has been moved INTO ``_REGISTER_FIRST`` for
  regrading.
- ``tests/test_freeze.py`` fails when a frozen file's current hash
  drifts from the manifest: mutating code behind a rotated-out entry
  without regrading it turns CI red.
"""

from __future__ import annotations

import hashlib
import inspect
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MANIFEST_PATH = os.path.join(REPO, "tools", "frozen_hashes.json")

# shared cross-engine fragments: a change here shifts hash/tokenizer
# behavior for every oracle, so they are frozen regardless of the window
SHARED = [
    "etl_pipeline_example_spark/operators/hashing.py",
    "etl_pipeline_example_spark/sources/readers.py",
]


def _sha256(path: str) -> str:
    with open(path, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def frozen_entries() -> dict[str, str]:
    """Non-window registry keys -> repo-relative backing module path."""
    sys.path.insert(0, REPO)
    import __spark_entry__ as entry

    qs = entry.queries()
    window = set(entry._REGISTER_FIRST)
    out = {}
    for key, fn in qs.items():
        if key in window:
            continue
        path = os.path.relpath(inspect.getfile(fn), REPO)
        out[key] = path
    return out


def manifest() -> dict[str, str]:
    """{repo-relative path: sha256} over all frozen backing files."""
    paths = sorted(set(frozen_entries().values()) | set(SHARED))
    return {p: _sha256(os.path.join(REPO, p)) for p in paths}


def main() -> int:
    m = manifest()
    with open(MANIFEST_PATH, "w") as f:
        json.dump(m, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {MANIFEST_PATH}: {len(m)} files frozen")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
