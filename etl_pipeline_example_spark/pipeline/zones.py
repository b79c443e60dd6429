"""Land → raw-hist → curated zone store.

The reference's storage contract (reference: README.md "Data Storage Best
Practice"; python_scripts/constants.py:1-2): data lands under
``land/<dataset>/<table>/file_land_timestamp=<ts>/``, is promoted verbatim
to ``raw-hist`` after validation (copy then delete — land is transient,
raw-hist is immutable history; reference: python_scripts/test_data.py:50-53),
and transforms write to ``curated``. Paths are plain strings so the same
code runs on ``s3://`` URIs on a cluster and local dirs in tests — Spark's
Hadoop filesystem layer abstracts the scheme.
"""

from __future__ import annotations

import shutil
from dataclasses import dataclass
from pathlib import Path


@dataclass
class ZoneStore:
    root: str

    @property
    def land(self) -> str:
        return f"{self.root}/land"

    @property
    def raw_hist(self) -> str:
        return f"{self.root}/raw-hist"

    @property
    def curated(self) -> str:
        return f"{self.root}/curated"

    def land_path(self, dataset: str, table: str, ts: int | None = None) -> str:
        p = f"{self.land}/{dataset}/{table}"
        if ts is not None:
            p += f"/file_land_timestamp={ts}"
        return p

    def raw_hist_path(self, dataset: str, table: str) -> str:
        return f"{self.raw_hist}/{dataset}/{table}"

    def curated_path(self, db_base: str, location: str) -> str:
        return f"{self.curated}/{db_base}/{location}"

    def promote_to_raw(self, dataset: str, table: str) -> list[str]:
        """Move every landed partition of ``table`` to raw-hist (copy+delete).

        Local-FS implementation; on a real deployment this is an object-store
        server-side copy. Partition directories (``file_land_timestamp=...``)
        transfer verbatim so raw-hist keeps full arrival history.
        """
        src = Path(self.land_path(dataset, table))
        dst = Path(self.raw_hist_path(dataset, table))
        if not src.exists():
            raise FileNotFoundError(
                f"Was expecting data in land but nothing was found in the folder: {src}"
            )
        moved: list[str] = []
        for part in sorted(p for p in src.iterdir() if p.is_dir()):
            target = dst / part.name
            target.parent.mkdir(parents=True, exist_ok=True)
            if target.exists():
                shutil.rmtree(target)
            shutil.copytree(part, target)
            shutil.rmtree(part)
            moved.append(str(target))
        return moved
