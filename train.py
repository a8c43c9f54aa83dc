#!/usr/bin/env python
"""Training CLI.

Counterpart of the reference's ``train.py`` (argparse + config + resume
semantics, ``train.py:84-134``): ``python train.py -c config.json
[-r] [-i N]``.  The config may be in our schema or the reference's schema
(auto-detected, including the published ``configs/cf_*.json`` files).
"""

import argparse
import json
import sys


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-c", "--config", required=True)
    ap.add_argument("-r", "--resume", action="store_true",
                    help="resume from checkpoint-latest if present "
                         "(soft-resume: starts fresh when absent); without "
                         "-r, a run dir that already has checkpoints is "
                         "refused (reference train.py:110-117)")
    ap.add_argument("-i", "--iterations", type=int, default=None,
                    help="override iteration budget")
    ap.add_argument("--dataset", default=None,
                    help="override dataset (e.g. 'synthetic' for smoke runs)")
    ap.add_argument("--save-dir", default=None)
    ap.add_argument("-a", "--override", action="append",
                    default=[], metavar="PATH=VALUE",
                    help="nested config override, e.g. -a trainer.iterations=100")
    ap.add_argument("--debug", action="store_true",
                    help="enable jax_debug_nans (the reference's "
                         "autograd-anomaly mode, base_trainer.py:196-197)")
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="capture a jax.profiler trace of the run into DIR")
    ap.add_argument("--distributed", action="store_true",
                    help="multi-host SPMD: jax.distributed.initialize() + "
                         "per-process dataset sharding (SURVEY.md §5.8)")
    ap.add_argument("--mesh", type=int, default=0, metavar="N",
                    help="data-parallel mesh size (0 = single device when "
                         "one chip is attached, else all local devices)")
    ap.add_argument("--fsdp", type=int, default=0, metavar="M",
                    help="shard params/optimizer over a model mesh axis of "
                         "size M (FSDP/ZeRO-style; devices = data x M)")
    args = ap.parse_args()

    import os
    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        # the axon TPU plugin wins platform selection over the env var
        # (same guard as __graft_entry__.dryrun_multichip); honor an
        # explicit JAX_PLATFORMS=cpu so virtual-mesh CPU runs never touch
        # the (exclusive) TPU tunnel
        import jax
        jax.config.update("jax_platforms", "cpu")

    if args.debug:
        import jax
        jax.config.update("jax_debug_nans", True)

    # Device-acquisition watchdog (utils/acquire.py): pipeline stages chain
    # many processes over one exclusive tunnel; a launch that races the
    # previous holder's release otherwise blocks forever inside backend
    # init.  On timeout this re-execs the same argv, so the pipeline's
    # stage-retry loop never burns an attempt on a wedged acquisition.
    from handwriting_line_generation_tpu.utils.acquire import (
        ensure_device_or_reexec)
    ensure_device_or_reexec()

    from handwriting_line_generation_tpu.config import (apply_overrides,
                                                    load_config)
    cfg = load_config(args.config)
    apply_overrides(cfg, args.override)
    if cfg.model.generator.fused_epilogue:
        raise ValueError(
            "model.generator.fused_epilogue is inference-only (the Pallas "
            "epilogue has no VJP) — unset it for training; inference CLIs "
            "may enable it on their own model builds")
    if args.dataset:
        cfg.data.dataset = args.dataset
    if args.save_dir:
        cfg.trainer.save_dir = args.save_dir
    if args.iterations:
        cfg.trainer.iterations = args.iterations

    # The tunnel wedge can also strike AFTER acquisition — on the first big
    # compile RPC (axon-conn-read parked in tcp_recvmsg) or on any LATER
    # dispatch mid-run (round-4 forensics: processes with completed steps
    # hung at 22:00:30).  Heartbeat guard: every log entry re-arms the
    # deadline; a wedge anywhere in the hot loop settles and re-execs
    # (soft-resume loses at most save_every iterations).
    from handwriting_line_generation_tpu.utils.acquire import (
        arm_completion_guard)
    # first_timeout: the first logged step sits behind the cold-compile
    # window (several multi-minute lesson compiles on a fresh .jax_cache);
    # 900 s fired on a HEALTHY cold GAN launch (observed round 5), so the
    # first milestone gets 40 min while steady-state keeps the tight
    # heartbeat.
    guard = arm_completion_guard(first_timeout=2400.0)

    def log(entry):
        guard.beat()
        print(json.dumps({k: (round(v, 5) if isinstance(v, float) else v)
                          for k, v in entry.items()}), flush=True)

    mesh = None
    if args.distributed or args.mesh or args.fsdp:
        import jax
        from handwriting_line_generation_tpu.config import MeshConfig
        from handwriting_line_generation_tpu.parallel.mesh import (
            init_distributed, make_mesh)
        if args.distributed:
            init_distributed()
        m = max(args.fsdp, 1)
        n = args.mesh or (jax.device_count() // m)
        mesh = make_mesh(MeshConfig(data=n, model=m))
        print(f"SPMD: {jax.process_count()} process(es), "
              f"{n}x{m} data x model mesh"
              + (" (fsdp params)" if m > 1 else ""), flush=True)

    # persistent XLA compile cache: the RSS-leak soft-resume loops restart
    # this process many times per run; warm restarts skip the multi-minute
    # GAN-step recompiles (same HLO -> cache hit).  After the distributed
    # block — enabling it queries the backend, which must not initialize
    # before jax.distributed.initialize().
    from handwriting_line_generation_tpu.utils.compile_cache import (
        enable_compile_cache)
    enable_compile_cache()

    kind = cfg.trainer.kind
    if kind == "hwr":
        from handwriting_line_generation_tpu.training.hwr_trainer import \
            HWRTrainer
        trainer = HWRTrainer(cfg)
    elif kind == "auto":
        from handwriting_line_generation_tpu.training.auto_trainer import \
            AutoTrainer
        trainer = AutoTrainer(cfg)
    else:
        from handwriting_line_generation_tpu.training.gan_trainer import \
            GanTrainer
        trainer = GanTrainer(cfg)
    print(f"training '{cfg.name}' ({kind}) for "
          f"{cfg.trainer.iterations} iterations", flush=True)
    if args.profile:
        import jax
        with jax.profiler.trace(args.profile):
            trainer.train(on_log=log, mesh=mesh, resume=args.resume,
                          fsdp=args.fsdp > 1)
        print(f"profiler trace written to {args.profile}", flush=True)
    else:
        trainer.train(on_log=log, mesh=mesh, resume=args.resume,
                      fsdp=args.fsdp > 1)
    guard.disarm()  # run complete; finalization already beat via val logs


if __name__ == "__main__":
    main()
