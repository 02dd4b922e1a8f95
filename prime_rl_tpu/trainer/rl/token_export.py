"""Per-step JSONL export of per-token training tensors for offline analysis
(reference: trainer/rl/token_export.py:1-279): trainer logprobs, inference
logprobs, importance ratios, advantages, masks — one record per packed
sequence row."""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np


class TokenExporter:
    def __init__(self, output_dir: str | Path, max_rows_per_step: int = 64):
        self.dir = Path(output_dir) / "token_export"
        self.dir.mkdir(parents=True, exist_ok=True)
        self.max_rows = max_rows_per_step

    def export(self, step: int, batch, trainer_logprobs: np.ndarray | None = None) -> Path:
        """``batch``: host MicroBatchArrays [N, B, L]; ``trainer_logprobs``
        optionally [N, B, L] (post-step recompute)."""
        path = self.dir / f"step_{step}.jsonl"
        rows = 0
        with open(path, "w") as f:
            n, b, l = batch.input_ids.shape
            for i in range(n):
                for j in range(b):
                    if rows >= self.max_rows:
                        break
                    mask = np.asarray(batch.loss_mask[i, j], bool)
                    if not mask.any():
                        continue
                    inf_lp = np.asarray(batch.inference_logprobs[i, j], np.float32)
                    rec = {
                        "micro_batch": i,
                        "row": j,
                        "token_ids": np.asarray(batch.input_ids[i, j])[mask].tolist(),
                        "inference_logprobs": inf_lp[mask].round(5).tolist(),
                        "advantages": np.asarray(batch.advantages[i, j])[mask].round(5).tolist(),
                    }
                    if trainer_logprobs is not None:
                        t_lp = np.asarray(trainer_logprobs[i, j], np.float32)
                        rec["trainer_logprobs"] = t_lp[mask].round(5).tolist()
                        ratio = np.exp(t_lp - inf_lp)[mask]
                        rec["importance_ratio"] = ratio.round(5).tolist()
                    f.write(json.dumps(rec) + "\n")
                    rows += 1
        (path.with_suffix(".STABLE")).touch()
        return path
