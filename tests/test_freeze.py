"""Freeze-verify: rotated-out registry entries rest on prior-round
evidence, which is valid only while their backing code is unchanged.

Red here means a file behind a non-window entry (or one of its
transitive intra-repo imports) was edited without rotating that entry
into ``_REGISTER_FIRST`` for regrading (or without consciously
regenerating the manifest via ``python tools/freeze.py`` after doing
so).
"""

from __future__ import annotations

import json
import os
import shutil

from tools.freeze import (
    MANIFEST_PATH,
    REPO,
    _intra_repo_imports,
    drifted,
    frozen_entries,
    frozen_paths,
    manifest,
)


def _load_manifest() -> dict[str, str]:
    with open(MANIFEST_PATH) as f:
        return json.load(f)


def test_window_fits_driver_budget():
    import __spark_entry__ as entry

    # Positions beyond 50 are allowed ONLY for the documented rows-only
    # entries (no oracle_sql by design): if the driver budget is exactly
    # 50 they fall out deliberately, losing nothing but a weak check.
    overflow = entry._REGISTER_FIRST[50:]
    oracles = entry.oracle_sql()
    assert all(k not in oracles for k in overflow), (
        "a full-oracle entry sits beyond the driver's ~50-row budget and "
        "would silently go ungraded"
    )
    assert len(entry._REGISTER_FIRST) <= 52, (
        "grading window exceeds the driver's ~50-row budget; trailing "
        "entries would silently go ungraded"
    )
    # window keys must be real registry keys, in first position
    keys = list(entry.queries())
    assert keys[: len(entry._REGISTER_FIRST)] == entry._REGISTER_FIRST


def test_every_frozen_backing_file_is_in_manifest():
    recorded = set(_load_manifest())
    for key, path in frozen_entries().items():
        assert path in recorded, f"{key}'s backing file {path} is not frozen"


def test_manifest_covers_transitive_import_closure():
    """The round-5 ADVICE gap: a frozen operator importing a non-frozen
    helper would let behavior drift past the gate. The manifest must be
    closed under intra-repo imports."""
    recorded = set(_load_manifest())
    for p in recorded:
        for dep in _intra_repo_imports(p):
            assert dep in recorded, f"frozen {p} imports unfrozen {dep}"


def test_frozen_files_unchanged_since_manifest():
    recorded = _load_manifest()
    current = manifest()
    bad = drifted(recorded, current)
    assert not bad, (
        f"frozen files changed without regrading: {bad} — move the "
        "affected entries into _REGISTER_FIRST and rerun tools/freeze.py"
    )


def test_manifest_detects_mutation(tmp_path):
    """The check itself must be falsifiable: copy the frozen tree, flip
    one byte in one file, run the SAME manifest+drift path the real
    check uses against the copy, and the mutated file — exactly it —
    must be reported."""
    recorded = _load_manifest()
    paths = frozen_paths()
    for p in paths:
        dst = tmp_path / p
        dst.parent.mkdir(parents=True, exist_ok=True)
        shutil.copyfile(os.path.join(REPO, p), dst)
    victim = sorted(paths)[0]
    with open(tmp_path / victim, "ab") as f:
        f.write(b"\n# mutated\n")
    current = manifest(repo=str(tmp_path), paths=paths)
    assert drifted(recorded, current) == [victim]
