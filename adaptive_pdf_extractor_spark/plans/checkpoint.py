"""Checkpointed lineage + exact resume for the refinement round loop.

The reference persisted its whole cache to JSON after every accepted rule
(src/main.py:284-286) — crash-safe but driver-bound. Here state lives in a
versioned run directory ("Iceberg-shaped": parquet snapshots + an atomic
JSON manifest standing in for Iceberg snapshot metadata — no Iceberg jar in
the sandbox, layout maps 1:1, SURVEY §7.1.5)::

    <run_dir>/
      manifest.json                  -- atomic (tmp+rename), one entry/round
      rules/round=NNN/*.parquet      -- rules-table snapshot AFTER round NNN
      output/                        -- final output span table

Each manifest round entry records the rules snapshot path, round metrics
(docs, hit/miss counts, mined-rule counts) and **per-partition lineage**
(docs + unresolved per executor partition) so an operator can audit which
partitions contributed and a resumed run can prove input identity.

Resume contract (tested): a run killed after round k restarts, finds the
latest complete snapshot, and continues from round k+1 — producing a final
rules table and output byte-identical to an uninterrupted run. Rounds are
the atomic unit: a half-finished round's snapshot is never referenced by a
manifest entry (manifest write happens strictly after the parquet commit),
so a crash mid-round replays that round idempotently (same deterministic
miner inputs -> same rules).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Optional

MANIFEST = "manifest.json"


def _atomic_write_json(path: str, payload: dict) -> None:
    """Write-then-rename with fsync on file AND directory: without the
    fsyncs, a power loss right after commit can persist the rename before
    the data blocks, leaving a truncated manifest that makes the run
    unresumable (process kills alone don't need this; crashes do)."""
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(payload, f, ensure_ascii=False, indent=1)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
    dir_fd = os.open(os.path.dirname(path) or ".", os.O_RDONLY)
    try:
        os.fsync(dir_fd)
    finally:
        os.close(dir_fd)


class RunManifest:
    """Driver-side handle on a run directory's manifest."""

    def __init__(self, run_dir: str):
        self.run_dir = run_dir
        self.path = os.path.join(run_dir, MANIFEST)
        os.makedirs(run_dir, exist_ok=True)
        self.state: dict[str, Any] = {
            "run_id": os.path.basename(os.path.normpath(run_dir)),
            "status": "running",
            "rounds": [],
            "output_path": None,
        }
        if os.path.exists(self.path):
            with open(self.path, "r", encoding="utf-8") as f:
                self.state = json.load(f)

    # -- round lifecycle ----------------------------------------------------

    def last_completed_round(self) -> int:
        """Highest round number with a committed snapshot, or -1."""
        rounds = self.state.get("rounds", [])
        return max((r["round"] for r in rounds), default=-1)

    def rules_snapshot_path(self, round_no: int) -> str:
        return os.path.join(self.run_dir, "rules", f"round={round_no:03d}")

    def latest_rules_path(self) -> Optional[str]:
        last = self.last_completed_round()
        if last < 0:
            return None
        for r in self.state["rounds"]:
            if r["round"] == last:
                return r["rules_path"]
        return None

    def commit_round(
        self,
        round_no: int,
        rules_path: str,
        metrics: dict,
        lineage: list[dict],
        n_new_rules: int,
    ) -> None:
        """Record a completed round. MUST be called after the rules parquet
        snapshot is fully written — the manifest is the commit point."""
        self.state["rounds"] = [
            r for r in self.state["rounds"] if r["round"] != round_no
        ] + [
            {
                "round": round_no,
                "rules_path": rules_path,
                "n_new_rules": n_new_rules,
                "metrics": metrics,
                "lineage": lineage,
                "committed_at": time.time(),
            }
        ]
        self.state["rounds"].sort(key=lambda r: r["round"])
        _atomic_write_json(self.path, self.state)

    def finish(self, output_path: str, summary: dict) -> None:
        self.state["status"] = "complete"
        self.state["output_path"] = output_path
        self.state["summary"] = summary
        _atomic_write_json(self.path, self.state)

    @property
    def complete(self) -> bool:
        return self.state.get("status") == "complete"
