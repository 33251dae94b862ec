"""Checkpoint / auto-resume (Orbax), mirroring the reference's "Perfect
Resume" design (train_ddp_v3mod2.py:392-424, 747-810, 1120-1148):

- timestamped run directories ``MMDDHHMM`` under a base dir,
- ``last`` every epoch, ``best`` on val improvement, ``interval_<step>``
  every N steps,
- full state: params, optimizer state, step, PRNG key, epoch,
  best_val_loss, and the preset config JSON for inference-side rebuilds.

The reference saves python/numpy/torch/CUDA RNG tuples; in JAX the single
threaded PRNG key inside ``TrainState`` plus the data-loader epoch seed is
the complete randomness state, so resume is exact by construction.
"""

from __future__ import annotations

import json
from datetime import datetime
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import orbax.checkpoint as ocp

from .state import TrainState


def timestamp_run_name() -> str:
    return datetime.now().strftime("%m%d%H%M")


def find_latest_run(base_dir: str) -> Optional[Path]:
    """Latest ``MMDDHHMM`` run dir containing a ``last`` checkpoint
    (ref train_ddp_v3mod2.py:397-424)."""
    base = Path(base_dir)
    if not base.exists():
        return None
    runs = sorted(
        (d for d in base.iterdir()
         if d.is_dir() and d.name.isdigit() and len(d.name) == 8),
        reverse=True,
    )
    for run in runs:
        if (run / "last").exists():
            return run
    # No run has a resumable `last` (e.g. all crashed before the first
    # save): let the caller create a fresh run dir rather than silently
    # mixing new checkpoints into an old one.
    return None


def _state_pytree(state: TrainState) -> Dict[str, Any]:
    return {
        "step": state.step,
        "params": state.params,
        "opt_state": state.opt_state,
        "rng": state.rng,
    }


class CheckpointManager:
    def __init__(self, run_dir: str | Path, primary: bool = True):
        """``primary``: multi-host mode — every process calls ``save``
        (Orbax coordinates the sharded array writes) but only process 0
        writes the sidecar meta JSON / prunes."""
        self.run_dir = Path(run_dir)
        self.primary = primary
        if primary:
            self.run_dir.mkdir(parents=True, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def save(self, name: str, state: TrainState, epoch: int,
             best_val_loss: float, extra: Optional[Dict] = None):
        path = (self.run_dir / name).absolute()
        self._ckptr.save(path, _state_pytree(state), force=True)
        if self.primary:
            meta = {
                "epoch": epoch,
                "global_step": int(state.step),
                "best_val_loss": float(best_val_loss),
                **(extra or {}),
            }
            (self.run_dir / f"{name}.meta.json").write_text(json.dumps(meta))
        self._ckptr.wait_until_finished()

    def restore(self, name: str, template: TrainState
                ) -> Tuple[TrainState, Dict]:
        path = (self.run_dir / name).absolute()
        abstract = jax.tree_util.tree_map(
            ocp.utils.to_shape_dtype_struct, _state_pytree(template)
        )
        try:
            restored = self._ckptr.restore(path, abstract)
        except ValueError:
            # PRNG impl changed since the checkpoint was written (threefry
            # keys are uint32[2], rbg uint32[4]).  Restore with the stored
            # key shape, then re-key under the current impl by folding the
            # stored bits in — weights/optimizer resume exactly; only the
            # future noise stream differs.
            import numpy as _np

            restored = None
            for alt in ((2,), (4,)):
                if alt == tuple(template.rng.shape):
                    continue
                abstract2 = dict(abstract)
                abstract2["rng"] = jax.ShapeDtypeStruct(
                    alt, template.rng.dtype
                )
                try:
                    restored = self._ckptr.restore(path, abstract2)
                    break
                except ValueError:
                    continue
            if restored is None:
                raise
            bits = int(_np.asarray(restored["rng"]).astype(_np.uint64).sum())
            impl = "rbg" if tuple(template.rng.shape) == (4,) else "threefry2x32"
            restored["rng"] = jax.random.PRNGKey(
                bits % (2**31 - 1), impl=impl
            )
            print("[checkpoint] warning: PRNG impl changed since this "
                  "checkpoint was written; re-keyed (noise stream differs)")
        meta = json.loads((self.run_dir / f"{name}.meta.json").read_text())
        state = template.replace(
            step=restored["step"],
            params=restored["params"],
            opt_state=restored["opt_state"],
            rng=restored["rng"],
        )
        return state, meta

    def has(self, name: str) -> bool:
        return (self.run_dir / name).exists()

    def prune_intervals(self, keep: int):
        """Remove all but the newest ``keep`` interval checkpoints."""
        if keep <= 0 or not self.primary:
            return
        import re
        import shutil

        intervals = []
        for d in self.run_dir.iterdir():
            m = re.fullmatch(r"interval_(\d+)", d.name)
            if m and d.is_dir():
                intervals.append((int(m.group(1)), d))
        for _, d in sorted(intervals)[:-keep]:
            shutil.rmtree(d, ignore_errors=True)
            meta = Path(str(d) + ".meta.json")
            if meta.exists():
                meta.unlink()
