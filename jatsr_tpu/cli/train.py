"""CLI: training (the reference's train_ddp_*.py family as one command).

Usage:
    python -m jatsr_tpu.cli.train --preset v3mod2 --data-dir data_processed \
        [--resume [auto|RUN_DIR]] [--mesh DATA MODEL] [--epochs N] \
        [--max-steps N]

Each reference script maps to ``--preset``:
    train_ddp_v1.py -> v1        train_ddp_v3m2.py   -> v3m2
    train_ddp_v2.py -> v2        train_ddp_v3mod2.py -> v3mod2
    train_ddp_v3.py -> v3        train_ddp_v3mod3.py -> v3mod3
Instead of ``torchrun --nproc_per_node=N``, pass ``--mesh N 1`` (data
parallel) or ``--mesh N M`` (+ tensor parallel) — the step is one SPMD
program over the device mesh.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--preset", default="v3mod2")
    ap.add_argument("--data-dir", default=None)
    ap.add_argument("--resume", nargs="?", const="auto", default=None)
    ap.add_argument("--mesh", nargs=2, type=int, default=None,
                    metavar=("DATA", "MODEL"))
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--max-steps", type=int, default=0)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--shard-opt-state", action="store_true",
                    help="ZeRO-1: shard Adam moments over the data axis")
    ap.add_argument("--native-loader", action="store_true",
                    help="use the C++ mmap/thread batch engine (native/)")
    ap.add_argument("--lr", type=float, default=None)
    ap.add_argument("--warmup-steps", type=int, default=None)
    ap.add_argument("--grad-accum", type=int, default=None)
    ap.add_argument("--cfg-dropout", type=float, default=None,
                    help="sample-level condition dropout (CFG training)")
    ap.add_argument("--save-last-every", type=int, default=None,
                    help="save the `last` checkpoint every N epochs "
                         "(default 1 = reference parity; raise on slow "
                         "device->host links)")
    ap.add_argument("--save-best-every", type=int, default=None,
                    help="save the `best` checkpoint on improvement at most "
                         "every N epochs (default 1 = reference parity; "
                         "raise on slow device->host links)")
    ap.add_argument("--run-name", default=None,
                    help="run dir name (default: MMDDHHMM timestamp)")
    ap.add_argument("--remat", default=None,
                    choices=["full", "attn_out", "mlp", "dots", "none"],
                    help="rematerialisation policy (ModelConfig.remat_policy:"
                         " full=max recompute, mlp=save attention outputs + "
                         "pre-GELU activations, none=no remat)")
    ap.add_argument("--profile-steps", type=int, default=0,
                    help="capture a jax.profiler trace of the first N steps")
    ap.add_argument("--platform", default=None,
                help="force jax platform (cpu/tpu)")
    ap.add_argument("--distributed", action="store_true",
                    help="multi-host: join the jax.distributed runtime "
                         "(auto-detects on Cloud TPU pods; elsewhere set "
                         "JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / "
                         "JAX_PROCESS_ID)")
    args = ap.parse_args(argv)

    from ..utils.runtime import select_platform

    select_platform(args.platform)

    if args.distributed:
        from ..parallel.distributed import init_distributed

        init_distributed()

    import dataclasses

    from ..configs import get_preset
    from ..parallel import make_mesh
    from ..train.loop import Trainer

    preset = get_preset(args.preset)
    train_over = {}
    if args.batch_size:
        train_over["batch_size"] = args.batch_size
    if args.shard_opt_state:
        train_over["shard_opt_state"] = True
    if args.lr is not None:
        train_over["lr"] = args.lr
    if args.warmup_steps is not None:
        train_over["warmup_steps"] = args.warmup_steps
    if args.grad_accum is not None:
        train_over["grad_accum_steps"] = args.grad_accum
    if args.cfg_dropout is not None:
        train_over["cfg_dropout_prob"] = args.cfg_dropout
    if args.save_last_every is not None:
        train_over["save_last_every_epochs"] = args.save_last_every
    if args.save_best_every is not None:
        train_over["save_best_every_epochs"] = args.save_best_every
    if train_over:
        preset = dataclasses.replace(
            preset, train=dataclasses.replace(preset.train, **train_over)
        )
    if args.remat:
        preset = dataclasses.replace(
            preset, model=dataclasses.replace(preset.model,
                                              remat_policy=args.remat)
        )
    mesh = make_mesh(*args.mesh) if args.mesh else None
    trainer = Trainer(preset, data_dir=args.data_dir, resume=args.resume,
                      mesh=mesh, native_loader=args.native_loader,
                      run_name=args.run_name)
    print(f"[train] preset={preset.name} params={trainer.n_params/1e6:.1f}M "
          f"steps/epoch={len(trainer.train_loader)} mesh={args.mesh}")
    if args.profile_steps:
        from ..utils.profiling import trace

        with trace(str(trainer.ckpt.run_dir / "profile")):
            trainer.fit(num_epochs=args.epochs,
                        max_steps=int(trainer.state.step) + args.profile_steps)
        print(f"[train] profile trace in {trainer.ckpt.run_dir}/profile")
    best = trainer.fit(num_epochs=args.epochs, max_steps=args.max_steps)
    print(f"[train] done; best val loss {best:.5f}")


if __name__ == "__main__":
    main()
