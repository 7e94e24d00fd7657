"""Checkpoint manifests: per-stage lineage + metrics + resume (SURVEY.md §3.1, §4).

A build directory looks like:

    build_dir/
      stage=<name>/            # parquet output of the stage (when materialized)
      manifests/<name>.json    # written ATOMICALLY after the stage completes

A stage is "complete" iff its manifest exists and its ``config_hash`` matches
the current build config — resume skips complete stages and reads their
parquet.  Manifests carry lineage (inputs, config hash, upstream stages) and
metrics (row counts, wall seconds, per-partition file rows) per
BASELINE.json:14 ("checkpoint-resume with per-partition lineage + metrics").
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import asdict, dataclass, field
from typing import Any


def config_hash(cfg: dict[str, Any]) -> str:
    return hashlib.sha256(json.dumps(cfg, sort_keys=True, default=str).encode()).hexdigest()[:16]


@dataclass
class StageManifest:
    stage: str
    config_hash: str
    inputs: list[str]
    upstream: list[str]
    started_unix: float
    wall_s: float = 0.0
    rows_out: int = 0
    metrics: dict[str, Any] = field(default_factory=dict)
    partitions: list[dict[str, Any]] = field(default_factory=list)
    complete: bool = False


class BuildState:
    """Filesystem-backed stage ledger for one index build."""

    def __init__(self, build_dir: str, cfg: dict[str, Any]):
        self.build_dir = build_dir
        self.cfg = cfg
        self.cfg_hash = config_hash(cfg)
        os.makedirs(os.path.join(build_dir, "manifests"), exist_ok=True)

    def stage_dir(self, name: str) -> str:
        return os.path.join(self.build_dir, f"stage={name}")

    def _manifest_path(self, name: str) -> str:
        return os.path.join(self.build_dir, "manifests", f"{name}.json")

    def is_complete(self, name: str, cfg_hash: str | None = None) -> bool:
        """``cfg_hash`` lets a stage be fingerprinted by only the config
        subset it actually depends on (so e.g. a segments-only parameter
        change doesn't invalidate the docvec checkpoint)."""
        p = self._manifest_path(name)
        if not os.path.exists(p):
            return False
        try:
            with open(p) as f:
                m = json.load(f)
        except (json.JSONDecodeError, OSError):
            return False
        return bool(m.get("complete")) and m.get("config_hash") == (
            cfg_hash or self.cfg_hash
        )

    def read_manifest(self, name: str) -> dict[str, Any] | None:
        p = self._manifest_path(name)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def begin(
        self,
        name: str,
        inputs: list[str],
        upstream: list[str],
        cfg_hash: str | None = None,
    ) -> StageManifest:
        return StageManifest(
            stage=name,
            config_hash=cfg_hash or self.cfg_hash,
            inputs=inputs,
            upstream=upstream,
            started_unix=time.time(),
        )

    def commit(self, m: StageManifest) -> None:
        """Atomic manifest write: tmp file + rename."""
        m.wall_s = time.time() - m.started_unix
        m.complete = True
        # per-partition metrics: record the stage's output files + sizes
        sd = self.stage_dir(m.stage)
        if os.path.isdir(sd) and not m.partitions:
            for root, _dirs, files in os.walk(sd):
                for fn in sorted(files):
                    fp = os.path.join(root, fn)
                    m.partitions.append(
                        {"file": os.path.relpath(fp, sd), "bytes": os.path.getsize(fp)}
                    )
        path = self._manifest_path(m.stage)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(asdict(m), f, indent=1, sort_keys=True)
        os.replace(tmp, path)

    def write_sidecar(self, name: str, obj: dict[str, Any]) -> str:
        path = os.path.join(self.build_dir, name)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(obj, f, indent=1, sort_keys=True)
        os.replace(tmp, path)
        return path

    def read_sidecar(self, name: str) -> dict[str, Any]:
        with open(os.path.join(self.build_dir, name)) as f:
            return json.load(f)
