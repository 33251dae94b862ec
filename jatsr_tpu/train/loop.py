"""Training loop: epochs, validation, TensorBoard, checkpoints, auto-resume.

The runtime around the jitted train step — everything
train_ddp_v3mod2.py:603-1019 does per process, as one Trainer:

- epoch loop with per-epoch loader reshuffle (``set_epoch`` replaces
  ``DistributedSampler.set_epoch``, :832),
- TB scalars every ``log_interval_steps`` (Train/Loss, LR, GradNorm, SNR_dB,
  prediction stats, per-term latent losses; :945-963),
- ``interval_<step>`` checkpoints every ``save_interval_steps``, ``last``
  per epoch, ``best`` on val improvement (:965-1016),
- validation per epoch (mean + std of batch losses; the cross-device SUM
  all-reduce of the reference, :1087-1096, is implicit — metrics come out
  of the SPMD program already reduced).

Sharding: pass a mesh and the trainer places params per the TP rules and
shards batches over ``data``; without one it runs single-device.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import Preset
from ..data import BatchLoader, LatentDataset, ValidationDataset, load_stats
from ..models import DiT, count_params
from ..parallel import batch_sharding, param_shardings, replicated
from ..parallel.mesh import opt_state_shardings
from .checkpoint import CheckpointManager, find_latest_run, timestamp_run_name
from .state import create_train_state
from .step import Normalizer, make_eval_step, make_train_step


class Trainer:
    def __init__(
        self,
        preset: Preset,
        data_dir: Optional[str] = None,
        resume: Optional[str] = None,  # None | "auto" | run-dir path
        mesh=None,
        run_name: Optional[str] = None,
        writer=None,
        native_loader: bool = False,
    ):
        self.preset = preset
        mcfg, tcfg, dcfg = preset.model, preset.train, preset.data
        data_dir = data_dir or dcfg.data_dir

        from ..utils.runtime import select_prng_impl

        select_prng_impl(tcfg.prng_impl)

        # Multi-host: each process materialises only its span of every
        # global batch (the DistributedSampler analogue); requires a mesh
        # over the global device set (parallel/distributed.py).
        self.n_procs = jax.process_count()
        self.primary = jax.process_index() == 0
        shard = (jax.process_index(), self.n_procs) \
            if self.n_procs > 1 else None
        if self.n_procs > 1 and mesh is None:
            raise ValueError("multi-host training requires a device mesh")

        # Data.
        target = dcfg.target_frames
        self.train_loader = BatchLoader(
            LatentDataset(data_dir, "train", target,
                          dcfg.samples_per_epoch_multiplier, seed=tcfg.seed),
            tcfg.batch_size, shuffle=True, seed=tcfg.seed,
            native=native_loader, shard=shard,
        )
        self.val_loader = BatchLoader(
            ValidationDataset(data_dir, "val", target,
                              dcfg.samples_per_epoch_multiplier),
            tcfg.batch_size, shuffle=False, shard=shard,
        )
        stats_path = Path(data_dir) / dcfg.stats_file
        self.normalizer = Normalizer(*load_stats(str(stats_path)))

        # Model + state.
        self.model = DiT(mcfg)
        hr0, lr0 = next(iter(
            BatchLoader(self.train_loader.ds, tcfg.batch_size, shuffle=False,
                        prefetch=0)
        ))
        total_steps = len(self.train_loader) * tcfg.num_epochs
        self.total_steps = total_steps
        self.state = create_train_state(
            self.model, tcfg, total_steps, (jnp.asarray(hr0), jnp.asarray(lr0))
        )
        self.n_params = count_params(self.state.params)

        # Placement.
        self.mesh = mesh
        if mesh is not None:
            data_size = mesh.shape["data"]
            if tcfg.batch_size % data_size:
                raise ValueError(
                    f"batch_size {tcfg.batch_size} must be divisible by the "
                    f"data-parallel axis ({data_size}) — pass --batch-size "
                    f"accordingly"
                )
            rep = replicated(mesh)
            self.state = self.state.replace(
                params=self._place(
                    self.state.params, param_shardings(mesh, self.state.params)
                ),
                opt_state=self._place(
                    self.state.opt_state,
                    opt_state_shardings(mesh, self.state.opt_state)
                    if tcfg.shard_opt_state
                    else jax.tree_util.tree_map(
                        lambda _: rep, self.state.opt_state,
                        is_leaf=lambda x: isinstance(x, jax.Array),
                    ),
                ),
                step=self._place(self.state.step, rep),
                rng=self._place(self.state.rng, rep),
            )
            self._batch_sharding = batch_sharding(mesh)
        else:
            self._batch_sharding = None

        # MFU accounting (VERDICT r3 #5): model FLOPs per optimizer step /
        # chip, against the v5e bf16 matmul peak, logged alongside
        # steps_per_sec.
        from ..utils.flops import V5E_BF16_PEAK_FLOPS, train_step_flops

        n_chips = max(1, jax.device_count()) if mesh is not None else 1
        self._flops_per_step = train_step_flops(
            mcfg, tcfg.batch_size, target, tcfg.grad_accum_steps) / n_chips
        self._peak_flops = V5E_BF16_PEAK_FLOPS

        self.train_step = jax.jit(
            make_train_step(preset.loss, tcfg, self.normalizer),
            donate_argnums=(0,),
        )
        self.eval_step = jax.jit(make_eval_step(preset.loss, self.normalizer))

        # Host->device transfers happen on the loader's prefetch thread so
        # they overlap device compute (_put_batch is idempotent, so the
        # fit-loop call on already-transferred arrays is a no-op).
        self.train_loader.transform = self._put_batch
        self.val_loader.transform = self._put_batch

        # Run dir / resume (ref train_ddp_v3mod2.py:616-660).
        base = Path(tcfg.save_dir_base) / preset.name
        self.start_epoch = 0
        self.best_val_loss = float("inf")
        # -1 so the first best-save lands at epoch >= cadence-1 (a fresh
        # run with cadence N doesn't spend a full-state pull on epoch 0).
        self._last_best_save_epoch = -1
        if resume == "auto":
            latest = find_latest_run(str(base))
            run_dir = latest if latest else base / (
                run_name or timestamp_run_name())
        elif resume:
            run_dir = Path(resume)
        else:
            run_dir = base / (run_name or timestamp_run_name())
        if self.n_procs > 1:
            # Timestamp names can differ across hosts by a tick; all hosts
            # must write the one run dir chosen by process 0.
            from ..parallel.distributed import shared_run_name

            run_dir = run_dir.parent / shared_run_name(run_dir.name)
        self.ckpt = CheckpointManager(run_dir, primary=self.primary)
        if resume and self.ckpt.has("last"):
            self.state, meta = self.ckpt.restore("last", self.state)
            self.start_epoch = meta["epoch"] + 1
            self.best_val_loss = meta["best_val_loss"]
            print(f"[trainer] resumed from {run_dir} at epoch "
                  f"{self.start_epoch}, step {int(self.state.step)}")

        self.writer = writer
        if self.writer is None and self.primary:
            try:
                from tensorboardX import SummaryWriter

                log_dir = Path(tcfg.log_dir_base) / preset.name / run_dir.name
                self.writer = SummaryWriter(logdir=str(log_dir))
            except Exception:
                self.writer = None

        # Persist the full preset alongside checkpoints (the reference saves
        # model_params inside every checkpoint, train_ddp_v3mod2.py:1145).
        if self.primary:
            (self.ckpt.run_dir / "preset.json").write_text(preset.to_json())

    # ------------------------------------------------------------------

    def _place(self, tree, shardings):
        """Place a host tree onto the mesh.  Multi-host: values exist
        identically on every process (same init seed / same restored
        checkpoint), so each process contributes its addressable shards of
        the full array."""
        if self.n_procs == 1:
            return jax.device_put(tree, shardings)
        return jax.tree_util.tree_map(
            lambda x, s: jax.make_array_from_process_local_data(
                s, np.asarray(x), np.shape(x)
            ),
            tree, shardings,
            is_leaf=lambda x: isinstance(x, (jax.Array, np.ndarray)),
        )

    def _put_batch(self, hr, lr):
        if self.n_procs > 1:
            from ..parallel.distributed import put_global_batch

            if getattr(hr, "is_fully_addressable", None) is False:
                return hr, lr  # already global (idempotent re-put)
            return put_global_batch(
                self.mesh, np.asarray(hr), np.asarray(lr),
                global_batch=self.preset.train.batch_size,
            )
        hr, lr = jnp.asarray(hr), jnp.asarray(lr)
        if self._batch_sharding is not None:
            hr = jax.device_put(hr, self._batch_sharding)
            lr = jax.device_put(lr, self._batch_sharding)
        return hr, lr

    def _log(self, tag_values: Dict[str, float], step: int, prefix: str):
        if not self.writer:
            return
        for k, v in tag_values.items():
            self.writer.add_scalar(f"{prefix}/{k}", float(v), step)

    def validate(self) -> Dict[str, float]:
        # Metrics stay on device per batch; ONE host pull at the end (a
        # float() per metric per batch would serialise validation on a mesh).
        device_metrics = []
        rng = jax.random.PRNGKey(1234)
        for i, (hr, lr) in enumerate(self.val_loader):
            hr, lr = self._put_batch(hr, lr)
            device_metrics.append(
                self.eval_step(self.state, hr, lr, jax.random.fold_in(rng, i))
            )
        pulled = jax.device_get(device_metrics)
        n = len(pulled)
        sums: Dict[str, float] = {}
        for m in pulled:
            for k, v in m.items():
                sums[k] = sums.get(k, 0.0) + float(v)
        out = {k: v / max(n, 1) for k, v in sums.items()}
        losses = [float(m["loss"]) for m in pulled]
        out["loss_std"] = float(np.std(losses)) if len(losses) > 1 else 0.0
        return out

    def fit(self, num_epochs: Optional[int] = None, max_steps: int = 0,
            verbose: bool = True):
        tcfg = self.preset.train
        num_epochs = num_epochs or tcfg.num_epochs
        extra = {"preset": self.preset.name}

        # The warmup-cosine horizon must match the *effective* run length:
        # the optimizer was built from preset.train.num_epochs, but
        # fit(num_epochs=...) / --epochs can override it (e.g. --epochs 50
        # on a 300-epoch preset would otherwise decay only 1/6 of the
        # cosine).  tx is a non-pytree field, so swapping it retraces the
        # step but leaves opt_state (restored on resume) intact.
        effective_total = len(self.train_loader) * num_epochs
        if effective_total != self.total_steps:
            from .state import make_optimizer

            self.total_steps = effective_total
            self.state = self.state.replace(
                tx=make_optimizer(tcfg, effective_total)
            )

        from ..utils.profiling import StepTimer

        timer = StepTimer()
        self._last_completed_epoch = self.start_epoch - 1
        try:
            self._fit_epochs(num_epochs, max_steps, verbose, timer, tcfg,
                             extra)
        except KeyboardInterrupt:
            # Always leave a resumable `last` behind (the reference needed a
            # source rewriter, fix_ddp_cleanup.py, to get this guarantee).
            # Epoch bookkeeping: save the last *completed* epoch so resume
            # continues from the interrupted one rather than replaying every
            # epoch since start.
            print("[trainer] interrupted — saving last checkpoint")
            self.ckpt.save("last", self.state, self._last_completed_epoch,
                           self.best_val_loss, extra)
            raise
        if self.writer is not None:
            self.writer.flush()
        return self.best_val_loss

    def _fit_epochs(self, num_epochs, max_steps, verbose, timer, tcfg, extra):
        step_count = int(self.state.step)
        for epoch in range(self.start_epoch, num_epochs):
            self.train_loader.set_epoch(epoch)
            t0 = time.time()
            epoch_loss, epoch_batches = 0.0, 0
            for hr, lr in self.train_loader:
                hr, lr = self._put_batch(hr, lr)
                self.state, metrics = self.train_step(self.state, hr, lr)
                step_count += 1
                epoch_batches += 1
                # Lazy device-scalar accumulation: no host sync until the
                # end-of-epoch float().
                epoch_loss = epoch_loss + metrics["loss"]
                if step_count % tcfg.log_interval_steps == 0:
                    vals = {k: float(v) for k, v in metrics.items()}
                    timer.tick()  # blocks here only (metrics were pulled)
                    vals["steps_per_sec"] = timer.steps_per_sec() \
                        * tcfg.log_interval_steps
                    if vals["steps_per_sec"] > 0:
                        vals["MFU"] = self._flops_per_step \
                            * vals["steps_per_sec"] / self._peak_flops
                    self._log(vals, step_count, "Train")
                if (tcfg.save_interval_steps
                        and step_count % tcfg.save_interval_steps == 0):
                    self.ckpt.save(f"interval_{step_count}", self.state,
                                   epoch, self.best_val_loss, extra)
                    self.ckpt.prune_intervals(tcfg.keep_interval_checkpoints)
                if max_steps and step_count >= max_steps:
                    break

            self._last_completed_epoch = epoch
            every = max(1, tcfg.save_last_every_epochs)
            if (epoch + 1) % every == 0 or epoch == num_epochs - 1:
                self.ckpt.save("last", self.state, epoch, self.best_val_loss,
                               extra)
            mean_train_loss = float(epoch_loss) / max(epoch_batches, 1)
            self._log({"EpochLoss": mean_train_loss}, epoch, "Train")
            val = self.validate()
            self._log(val, epoch, "Val")
            if val["loss"] < self.best_val_loss:
                # Rate-limit best-checkpoint writes: early training improves
                # val loss nearly every epoch, and on slow device->host
                # links the full-state pull can dominate epoch time.
                # best_val_loss moves ONLY when a save actually lands, so the
                # on-disk `best` weights and the threshold persisted in
                # `last` metadata can never diverge: an improvement skipped
                # by the cadence gate leaves the threshold at the last SAVED
                # value, and any later epoch that beats it still saves.
                best_every = max(1, tcfg.save_best_every_epochs)
                if (epoch - self._last_best_save_epoch >= best_every
                        or epoch == num_epochs - 1):
                    self.best_val_loss = val["loss"]
                    self.ckpt.save("best", self.state, epoch,
                                   self.best_val_loss, extra)
                    self._last_best_save_epoch = epoch
            if verbose:
                print(
                    f"[epoch {epoch}] {epoch_batches} steps in "
                    f"{time.time() - t0:.1f}s | train loss "
                    f"{mean_train_loss:.5f} | val loss "
                    f"{val['loss']:.5f} ± {val['loss_std']:.5f} "
                    f"(best {self.best_val_loss:.5f})"
                )
            if max_steps and step_count >= max_steps:
                break
