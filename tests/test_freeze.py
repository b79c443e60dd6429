"""Freeze-verify: rotated-out registry entries rest on prior-round
evidence, which is valid only while their backing code is unchanged.

Red here means a file behind a non-window entry was edited without
rotating that entry into ``_REGISTER_FIRST`` for regrading (or without
consciously regenerating the manifest via ``python tools/freeze.py``
after doing so).
"""

from __future__ import annotations

import json

from tools.freeze import MANIFEST_PATH, frozen_entries, manifest


def _load_manifest() -> dict[str, str]:
    with open(MANIFEST_PATH) as f:
        return json.load(f)


def test_window_fits_driver_budget():
    import __spark_entry__ as entry

    assert len(entry._REGISTER_FIRST) <= 50, (
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


def test_frozen_files_unchanged_since_manifest():
    recorded = _load_manifest()
    current = manifest()
    drifted = sorted(
        p
        for p in set(recorded) | set(current)
        if recorded.get(p) != current.get(p)
    )
    assert not drifted, (
        f"frozen files changed without regrading: {drifted} — move the "
        "affected entries into _REGISTER_FIRST and rerun tools/freeze.py"
    )


def test_manifest_detects_mutation(tmp_path, monkeypatch):
    """The check itself must be falsifiable: a byte flip in a frozen file
    changes its manifest hash."""
    import tools.freeze as fz

    recorded = _load_manifest()
    path = next(iter(recorded))
    src = (tmp_path / "copy.py")
    with open(fz.os.path.join(fz.REPO, path), "rb") as f:
        src.write_bytes(f.read() + b"\n# mutated\n")
    assert fz._sha256(str(src)) != recorded[path]
