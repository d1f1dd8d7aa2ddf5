"""Training entry: dataset/model/solver wiring + epoch loop.

Parity surface of reference train.py:33-264 — seeding, dataset factory,
model build, two optimizers, loader, solver dispatch, tqdm epoch loop,
periodic + final checkpointing, final sample grid, hparams table — rebuilt
around jitted train steps and a prefetching device loader.

TPU-first differences:
* device selection is a mesh (config.data_parallel), not a cuda index;
* config.use_amp is accepted but ignored, matching the reference where the
  AMP flag was dead code (quirk Q1); config.precision='bf16' is the
  explicit mixed-precision knob;
* config.anomaly_detection enables jax_debug_nans + input-range asserts;
* config.profile captures a jax.profiler trace of iters 0-50 and stops,
  like the reference's torch profiler break (train.py:207-230);
* resume restores params AND optimizer state (fixes quirk Q12).
"""

from __future__ import annotations

import dataclasses
import random
import time

import jax
import jax.numpy as jnp
import numpy as np

from intro_tc_vae_tpu.config import Config
from intro_tc_vae_tpu.data import DeviceLoader, load_dataset
from intro_tc_vae_tpu.models import Decoder, Encoder
from intro_tc_vae_tpu.models.vae import (
    num_params,
    resolve_conv_impl,
    resolve_tile_rows,
)
from intro_tc_vae_tpu.parallel import batch_sharding, make_mesh, shard_state
from intro_tc_vae_tpu.solvers import make_optimizer, make_solver
from intro_tc_vae_tpu.utils import (
    LossDict,
    SingletonWriter,
    load_checkpoint,
    make_writer,
    save_checkpoint,
)
from intro_tc_vae_tpu.utils.nan import enable_anomaly_detection
from intro_tc_vae_tpu.utils.profiling import StepTimer, profile_trace


def resolve_fuse_passes(fuse: bool | None, batch_size: int,
                        data_axis: int) -> bool:
    """Resolve the ``fuse_passes`` auto mode (None) to a concrete choice.

    Measured crossover (BENCHMARKS.md): pairing (2x-batch calls) beats
    unpaired below ~batch 128 PER DEVICE; past it the batch alone fills
    the MXU and pairing's extra copies cost more than the occupancy it
    buys (under DP it also pays concat/split collective-permutes — the
    ICI audit). The occupancy argument is per-device, so the rule uses
    the per-data-shard batch, not the global one."""
    if fuse is not None:
        return fuse
    return batch_size // max(1, data_axis) < 128


def train_soft_intro_vae(config: Config):
    """Run one training job from a Config; returns the final TrainState."""
    from intro_tc_vae_tpu.config import validate_config

    validate_config(config)  # reject typo'd enum values before any work
    if config.remat == "pass" and config.solver in ("vae", "tc"):
        # pass-level remat only exists for the intro two-phase step; fall
        # back to per-block remat rather than silently running without any
        print(
            f"remat='pass' has no pass structure in the '{config.solver}' "
            "solver; falling back to per-block rematerialization"
        )
        config = dataclasses.replace(config, remat="block")

    # ----- seeding (reference train.py:38-44) -----
    seed = config.seed if config.seed != -1 else int(time.time()) % (2**31)
    random.seed(seed)
    np.random.seed(seed)
    root_key = jax.random.key(seed)
    if config.seed != -1:
        print("random seed: ", seed)

    if config.anomaly_detection:
        enable_anomaly_detection()

    # ----- multi-host (TPU-native extension; reference is single-device,
    # SURVEY §2.9) — no-op unless ITCVAE_COORDINATOR_ADDRESS / args say so
    from intro_tc_vae_tpu.parallel import initialize_distributed

    if initialize_distributed():
        print(
            f"distributed: process {jax.process_index()}/{jax.process_count()}, "
            f"{len(jax.local_devices())} local / {len(jax.devices())} global devices"
        )

    # ----- data (reference train.py:56-92) -----
    train_set, image_size, channels, ch = load_dataset(
        config.dataset, data_root=config.data_root
    )

    # ----- writer (reference train.py:94-103) -----
    writer = (
        make_writer(comment=config.run_comment(), log_dir=config.log_dir)
        if config.use_tensorboard
        else None
    )
    SingletonWriter().writer = writer
    SingletonWriter().cur_iter = 0
    SingletonWriter().test_iter = max(1, len(train_set) // config.batch_size)

    # ----- mesh + sharding -----
    mp = max(1, config.model_parallel)
    n_avail = config.data_parallel or len(jax.devices())
    if n_avail % mp != 0:
        raise ValueError(
            f"{n_avail} devices not divisible by model_parallel={mp}"
        )
    # config.data_parallel sets the TOTAL mesh size; the batch shards over
    # the data axis only (n // mp rows per data shard)
    if config.data_parallel and config.batch_size % (n_avail // mp) != 0:
        raise ValueError(
            f"batch_size {config.batch_size} not divisible by the data-axis "
            f"size {n_avail // mp} (data_parallel={config.data_parallel} "
            f"total devices / model_parallel={mp})"
        )
    # auto mode: largest total device count whose data axis divides the batch
    n_total = next(
        n for n in range(n_avail, 0, -mp)
        if n % mp == 0 and config.batch_size % (n // mp) == 0
    )
    if n_total != n_avail:
        print(f"mesh auto-shrunk to {n_total}/{n_avail} devices "
              f"(batch_size {config.batch_size}, model_parallel {mp})")
    mesh = make_mesh(n_total, model_parallel=mp)
    scan_steps = max(1, config.scan_steps)
    b_sharding = (
        batch_sharding(mesh, ndim=5, batch_axis=1)
        if scan_steps > 1 else batch_sharding(mesh)
    )

    # ----- model (reference train.py:105-117) -----
    dtype = jnp.bfloat16 if config.precision == "bf16" else None
    model_kwargs = dict(
        arch=config.arch, cdim=ch, zdim=config.z_dim,
        channels=tuple(channels), image_size=image_size, dtype=dtype,
        tile_rows=resolve_tile_rows(config.tile_rows, image_size),
        conv_impl=resolve_conv_impl(config.conv_impl),
        remat=config.remat in (True, "block"),
    )
    encoder = Encoder(**model_kwargs)
    # auto (-1) currently resolves to the plain conv: output-packing the
    # predict conv wins 1.7-6.6x standalone but measured -4..-13% on the
    # full step at every resolution (BENCHMARKS.md negative results)
    pack = max(0, config.pack_predict)
    decoder = Decoder(**model_kwargs, pack_predict=pack)

    # ----- optimizers (reference train.py:140-144: one per subtree) -----
    optimizer_e = make_optimizer(config.optimizer, config.lr)
    optimizer_d = make_optimizer(config.optimizer, config.lr)

    # ----- loader (reference train.py:146-159) -----
    def check_range(batch: np.ndarray) -> np.ndarray:
        if config.anomaly_detection:
            assert batch.max() <= 1.0 and batch.min() >= 0.0
        return batch

    loader = DeviceLoader(
        train_set,
        batch_size=config.batch_size,
        shuffle=True,
        sharding=b_sharding,
        prefetch=max(1, config.num_workers),
        seed=seed,
        pre_process=check_range,
        stack_steps=scan_steps,
        transfer_dtype=config.transfer_dtype,
        device_cache=config.device_cache,
        device_cache_budget_mb=config.device_cache_budget_mb,
        # solvers fold the cache gather into the jitted step (one dispatch
        # per step); the loader yields CachedBatch references when cached
        yield_refs=True,
    )

    # ----- solver (reference train.py:163-192) -----
    solver = make_solver(
        config.solver,
        dataset=train_set,
        encoder=encoder,
        decoder=decoder,
        batch_size=config.batch_size,
        optimizer_e=optimizer_e,
        optimizer_d=optimizer_d,
        recon_loss_type=config.recon_loss_type,
        beta_kl=config.beta_kl,
        beta_rec=config.beta_rec,
        beta_neg=config.beta_neg,
        gamma_r=config.gamma_r,
        writer=writer,
        test_iter=config.test_iter,
        clip=config.clip,
        tc_impl=config.tc_impl,
        tc_sampling=config.tc_sampling,
        kl_kind=config.kl_kind,
        scan_steps=scan_steps,
        mesh=mesh,
        batch_sharding=b_sharding,
        fuse_passes=resolve_fuse_passes(
            config.fuse_passes, config.batch_size, n_total // mp
        ),
        remat_passes=config.remat == "pass",
    )

    sample_shape = (1, image_size, image_size, ch)
    state = solver.init_state(root_key, jnp.zeros(sample_shape))
    state = shard_state(state, mesh)
    print(f"{num_params(state.params):,} Parameters")

    start_epoch = config.start_epoch
    prefix = config.fingerprint()
    resume_path = config.resume
    if resume_path == "auto":  # crash recovery: newest matching checkpoint
        from intro_tc_vae_tpu.utils.checkpoint import find_latest_checkpoint

        resume_path = find_latest_checkpoint(config.checkpoint_dir, prefix)
        if resume_path is None:
            print("resume=auto: no checkpoint found, starting fresh")
    cur_iter = 0
    if resume_path:
        state, resumed_epoch = load_checkpoint(resume_path, state)
        start_epoch = max(start_epoch, resumed_epoch)
        # Continue the global step count: checkpoint names and TensorBoard
        # global_step must keep increasing across resumes, or a second
        # resume='auto' would rank a stale pre-crash checkpoint as newest.
        cur_iter = int(jax.device_get(state.step))
        SingletonWriter().cur_iter = cur_iter
        print(f"resumed from {resume_path} at epoch {start_epoch} iter {cur_iter}")

    # ----- epoch loop (reference train.py:194-242) -----
    from tqdm import tqdm

    last_epoch_loss = LossDict()
    timer = StepTimer()
    batch = None
    epoch_rates: list = []  # system throughput, img/s, one entry per epoch

    try:
        for epoch in range(start_epoch, config.num_epochs):
            # save_interval <= 0: no periodic checkpoints (the final
            # checkpoint still saves) — the reference would divide by
            # zero here (reference train.py:198)
            if (config.save_interval > 0
                    and epoch % config.save_interval == 0 and epoch > 0):
                save_epoch = (epoch // config.save_interval) * config.save_interval
                save_checkpoint(state, save_epoch, cur_iter, prefix,
                                checkpoint_dir=config.checkpoint_dir,
                                async_save=config.async_checkpoint)

            pbar = tqdm(iterable=loader)

            # Solver metric ring, drained K steps behind the dispatch
            # frontier in ONE batched device_get (the fetch then touches
            # only completed buffers, ~0.1ms instead of a ~20ms tunnel
            # completion wait). ONE drain serves both TB scalar writes
            # (inside drain_metrics) and the loop's NaN-check/postfix.
            # Fail-fast latency is <=ring_depth steps (the reference
            # checks each step, at each-step sync cost).
            def consume(keep_tail: int = 0):
                nonlocal last_epoch_loss
                for host_metrics, _ in solver.drain_metrics(keep_tail):
                    loss_dict = {
                        k: float(host_metrics[k]) for k in
                        ("loss_enc", "loss_dec", "loss_kl", "loss_rec", "L2")
                        if k in host_metrics
                    }
                    solver.check_finite(loss_dict)
                    pbar.set_postfix(loss_dict, refresh=False)
                    if epoch == config.num_epochs - 1:
                        loss_dict.pop("L2", None)
                        last_epoch_loss += LossDict(loss_dict)

            epoch_t0 = time.perf_counter()
            n_steps = 0
            with profile_trace(enabled=config.profile):
                for batch in pbar:
                    timer.start()
                    state, metrics = solver.train_step(state, batch, cur_iter)
                    timer.stop()

                    n_steps += 1
                    if len(solver._metric_ring) >= solver.ring_depth + 2:
                        consume(keep_tail=2)

                    if config.profile and cur_iter >= 50:
                        break
                    cur_iter += scan_steps
                    SingletonWriter().cur_iter = cur_iter
            consume()  # fetches the last step too -> completion-bound time
            pbar.close()

            # system throughput: loader + dispatch + device + TB, per epoch
            # (epoch 0 includes the XLA compile; the final summary skips it)
            dt = time.perf_counter() - epoch_t0
            if n_steps and dt > 0:
                rate = n_steps * scan_steps * config.batch_size / dt
                epoch_rates.append(rate)
                if writer:
                    writer.add_scalar("perf/images_per_sec", rate, epoch)

            if config.profile:
                print("profile:", timer.summary())
                break

            if epoch == config.num_epochs - 1 and batch is not None:
                from intro_tc_vae_tpu.data.loader import CachedBatch, gather_cached

                if isinstance(batch, CachedBatch):  # device-cache reference
                    batch = gather_cached(batch, scan_steps, b_sharding)
                if scan_steps > 1:
                    batch = batch[-1]  # last step's batch for the sample grid
                noise = jax.random.normal(
                    jax.random.fold_in(root_key, cur_iter),
                    (batch.shape[0], config.z_dim),
                )
                from intro_tc_vae_tpu.solvers.base import decode

                fake, _ = decode(decoder, state.params["decoder"],
                                 state.batch_stats["decoder"], noise, train=False)
                solver.write_images(state, batch, fake, cur_iter)
                save_checkpoint(state, epoch, cur_iter, prefix,
                                checkpoint_dir=config.checkpoint_dir,
                                async_save=config.async_checkpoint)

    finally:
        # An abort (NaN fail-fast, loader error, Ctrl-C) must not lose
        # the last ring of buffered TensorBoard scalars — they are the
        # steps that show the blow-up — nor leave an async checkpoint
        # uncommitted. Both are idempotent on the clean path.
        try:
            solver.flush_writes()
        except Exception as flush_err:  # never mask the original error
            print(f"flush_writes failed during teardown: {flush_err!r}")
        from intro_tc_vae_tpu.utils.checkpoint import finalize_checkpoints

        finalize_checkpoints()

    if len(epoch_rates) > 1:  # skip epoch 0 (XLA compile dominates it)
        steady = float(np.median(epoch_rates[1:]))
        print(f"training throughput: {steady:,.0f} img/s "
              f"(median of epochs after the first; {len(epoch_rates)} epochs)")

    # ----- hparams table (reference train.py:244-264) -----
    if writer:
        num_batches = len(loader)
        last_epoch_loss = last_epoch_loss / max(num_batches, 1)
        writer.add_hparams(
            dict(
                optimizer=config.optimizer,
                recon_loss_type=config.recon_loss_type,
                lr=config.lr,
                batch_size=config.batch_size,
                solver=config.solver,
                dataset=config.dataset,
                z_dim=config.z_dim,
                beta_kl=config.beta_kl,
                beta_neg=config.beta_neg,
                beta_rec=config.beta_rec,
                gamma_r=config.gamma_r,
                arch=config.arch,
                clip=config.clip if config.clip is not None else 0.0,
            ),
            metric_dict=dict(last_epoch_loss),
        )
        writer.close()

    return state
