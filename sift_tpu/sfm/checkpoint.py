"""Checkpoint/resume for SfM state (aux subsystem, SURVEY.md §5).

The reference persists nothing (single-shot binary, no write calls);
for long incremental reconstructions and restartable distributed BA we
save the map (cameras/points/observations) and reload it to resume.
Uses orbax-checkpoint when available, with a plain .npz fallback so
checkpointing never becomes an import liability.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import jax.numpy as jnp

from sift_tpu.sfm.ba import BAProblem

_FIELDS = ("cameras", "points", "cam_idx", "pt_idx", "uv", "mask",
           "fixed_cams")


def save_ba_step(dirpath: str, prob: BAProblem, step: int) -> str:
    """Save under the canonical `ba_<step>` name `latest()` orders by."""
    return save_ba(os.path.join(dirpath, f"ba_{step:08d}"), prob, step)


def save_ba(path: str, prob: BAProblem, step: int = 0) -> str:
    """Save a BA problem snapshot; returns the written path."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays = {f: np.asarray(getattr(prob, f)) for f in _FIELDS}
    arrays["step"] = np.asarray(step)

    def _sidecar(written: str) -> str:
        # tiny step sidecar: latest() orders arbitrary names without
        # deserializing whole (potentially map-scale) snapshots
        with open(written + ".step", "w") as f:
            f.write(str(int(step)))
        return written

    try:
        import orbax.checkpoint as ocp
        ckpt_path = os.path.abspath(f"{path}.orbax")
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(ckpt_path, arrays, force=True)
        ckptr.wait_until_finished()
        return _sidecar(ckpt_path)
    except Exception:
        np.savez(path + ".npz", **arrays)
        return _sidecar(path + ".npz")


def load_ba(path: str) -> tuple[BAProblem, int]:
    """Load a snapshot written by save_ba. Accepts either backend's
    path (as returned by save_ba)."""
    if path.endswith(".orbax") or os.path.isdir(path):
        import orbax.checkpoint as ocp
        ckptr = ocp.StandardCheckpointer()
        arrays = ckptr.restore(os.path.abspath(path))
    else:
        with np.load(path) as z:
            arrays = {k: z[k] for k in z.files}
    step = int(np.asarray(arrays.pop("step")))
    prob = BAProblem(**{f: jnp.asarray(arrays[f]) for f in _FIELDS})
    return prob, step


def latest(dirpath: str, prefix: str = "ba_") -> Optional[str]:
    """Most recent checkpoint under dirpath, ordered by step.

    The step comes from the `ba_<step>` filename written by
    save_ba_step when present; files saved under arbitrary names fall
    back to the step RECORDED INSIDE the snapshot (save_ba always
    embeds it), so ordering never silently degrades to -1.
    """
    if not os.path.isdir(dirpath):
        return None
    cands = [f for f in os.listdir(dirpath)
             if f.startswith(prefix) and not f.endswith(".step")]
    if not cands:
        return None

    def step_of(name: str) -> int:
        stem = name.split(".")[0]
        try:
            return int(stem.rsplit("_", 1)[1])
        except (IndexError, ValueError):
            pass
        full = os.path.join(dirpath, name)
        try:                      # cheap sidecar written by save_ba
            with open(full + ".step") as f:
                return int(f.read().strip())
        except (OSError, ValueError):
            pass
        try:                      # last resort: embedded step (npz
            if name.endswith(".npz"):     # header read, not a full
                with np.load(full) as z:  # snapshot restore)
                    return int(np.asarray(z["step"]))
        except Exception:
            pass
        return -1
    return os.path.join(dirpath, max(cands, key=step_of))
