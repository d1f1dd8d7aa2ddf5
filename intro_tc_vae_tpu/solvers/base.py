"""Solver core: train state, optimizers, loss terms, and the host-side
``VAESolver`` wrapper (observability + evaluation hooks).

Design (vs reference solvers/vae.py):

* All per-step math lives in pure jitted functions built once at solver
  construction (``build_step``); the host class only dispatches, converts
  metrics for TensorBoard, and runs the (host-side, sklearn-based)
  disentanglement metrics off the device's critical path.
* The two torch optimizers (train.py:143-144) are two optax states over
  the ``params['encoder']`` / ``params['decoder']`` subtrees.
* PRNG is explicit: ``TrainState.rng`` is split every step.
* NaN handling: the step returns loss scalars; the host raises
  RuntimeError on non-finite loss like the reference (solvers/vae.py:112).
"""

from __future__ import annotations

import dataclasses

from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from intro_tc_vae_tpu import ops


# ---------------------------------------------------------------------------
# state + hyperparameters
# ---------------------------------------------------------------------------

class TrainState(flax.struct.PyTreeNode):
    """All device-resident mutable training state (a single pytree)."""

    step: jax.Array
    params: Any            # {'encoder': ..., 'decoder': ...}
    batch_stats: Any       # {'encoder': ..., 'decoder': ...}
    opt_state_e: Any
    opt_state_d: Any
    rng: jax.Array


@dataclasses.dataclass(frozen=True)
class SolverHyper:
    """Static (trace-time) solver hyperparameters."""

    recon_loss_type: str = "mse"
    beta_kl: float = 1.0
    beta_rec: float = 1.0
    beta_neg: float = 1.0
    gamma_r: float = 1e-8
    scale: float = 1.0              # 1 / (cdim * image_size^2), vae.py:61
    dataset_size: int = 1
    kl_kind: str = "gaussian"       # 'gaussian' | 'tc'
    tc_impl: str = "xla"            # 'xla' | 'pallas'
    tc_sampling: str = "stratified" # 'stratified' | 'weighted' (quirk Q11)
    clip: Optional[float] = None
    zdim: int = 32
    # mesh for the global-batch sharded TC path (scaling impls only):
    # compared/hased by identity, only read at trace time
    tc_mesh: Any = dataclasses.field(default=None, compare=False)


_OPTIMIZERS = {
    "adam": optax.adam,
    "adamw": optax.adamw,
    "adagrad": optax.adagrad,
    "adadelta": optax.adadelta,
    "sgd": optax.sgd,
    "rmsprop": optax.rmsprop,
    "lamb": optax.lamb,
    "lion": optax.lion,
}


def make_optimizer(name: str, lr: float) -> optax.GradientTransformation:
    """Optimizer by name — the reference resolves any torch.optim class by
    name (train.py:141); we resolve optax transforms case-insensitively."""
    key = name.lower()
    if key not in _OPTIMIZERS:
        raise ValueError(f"unknown optimizer '{name}' (known: {sorted(_OPTIMIZERS)})")
    return _OPTIMIZERS[key](lr)


# ---------------------------------------------------------------------------
# loss terms
# ---------------------------------------------------------------------------

def kl_term(h: SolverHyper, z, mu, logvar, reduce: str = "mean", beta=None):
    """KL term with solver-dependent composition.

    'gaussian' (vae/intro): beta * KL             (solvers/vae.py:63-77)
    'tc' (tc/intro_tc):     (beta-1)*TC + KL      (solvers/tc.py:69-89)
    'tc_full':              MI + beta*TC + dimension-wise KL — the full
        ELBO decomposition the reference implements but leaves unwired
        (solvers/tc.py:91-144, quirk Q11).

    Returns (weighted loss, unscaled value for the 'kl_loss_unscaled' tag).
    """
    if beta is None:
        beta = h.beta_kl
    if h.kl_kind == "tc_full":
        mi, tc, kl_dim = ops.tc_decomposition(z, mu, logvar, h.dataset_size)
        if reduce == "mean":
            mi, tc, kl_dim = jnp.mean(mi), jnp.mean(tc), jnp.mean(kl_dim)
        elif reduce == "sum":
            mi, tc, kl_dim = jnp.sum(mi), jnp.sum(tc), jnp.sum(kl_dim)
        return mi + beta * tc + kl_dim, mi + tc + kl_dim
    kl = ops.kl_divergence(logvar, mu, reduce=reduce)
    if h.kl_kind == "gaussian":
        return beta * kl, kl
    tc = ops.total_correlation(
        z, mu, logvar, h.dataset_size, reduce=reduce, impl=h.tc_impl,
        sampling=h.tc_sampling, mesh=h.tc_mesh,
    )
    return (beta - 1.0) * tc + kl, kl


def tc_decomp_metrics(h: SolverHyper, z, mu, logvar) -> dict:
    """Device-side means of the full ELBO decomposition for the
    ``tc_decomp/{mi,tc,kl}`` TensorBoard group (reference
    solvers/tc.py:129-139 logs these from ``_compute_kl_loss_full``).

    We log the real-batch KL site's decomposition — in the reference every
    mean-reduce call overwrites the same global_step, so "which call wins"
    is an artifact of pass order; the real-KL decomposition is the
    meaningful signal. XLA CSEs the recompute against the loss path.
    """
    mi, tc, kl = ops.tc_decomposition(z, mu, logvar, h.dataset_size)
    return {
        "tc_decomp/mi": jnp.mean(mi),
        "tc_decomp/tc": jnp.mean(tc),
        "tc_decomp/kl": jnp.mean(kl),
    }


def rec_term(h: SolverHyper, x, recon_x, reduction: str = "sum", beta=None):
    """beta_rec-weighted reconstruction loss (solvers/vae.py:79-87)."""
    if beta is None:
        beta = h.beta_rec
    return beta * ops.reconstruction_loss(x, recon_x, h.recon_loss_type, reduction)


def global_norm(tree) -> jax.Array:
    return optax.global_norm(tree)


def clip_by_global_norm(tree, max_norm: float):
    """torch.nn.utils.clip_grad_norm_ semantics; returns (clipped, pre-norm)."""
    norm = global_norm(tree)
    scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))
    return jax.tree_util.tree_map(lambda g: g * scale, tree), norm


# ---------------------------------------------------------------------------
# model application helpers (explicit batch_stats threading)
# ---------------------------------------------------------------------------

def encode(encoder, params_e, stats_e, x, train: bool = True, groups: int = 1):
    """Run the encoder, returning (mu, logvar, updated_batch_stats).

    groups > 1 treats the batch as a concat of equal sub-batches with
    per-group BatchNorm statistics (see models.blocks.GroupedBatchNorm) —
    numerically identical to `groups` sequential calls.
    """
    (mu, logvar), upd = encoder.apply(
        {"params": params_e, "batch_stats": stats_e}, x, train, groups,
        mutable=["batch_stats"],
    )
    return mu, logvar, upd["batch_stats"]


def decode(decoder, params_d, stats_d, z, train: bool = True, groups: int = 1):
    """Run the decoder, returning (image, updated_batch_stats)."""
    y, upd = decoder.apply(
        {"params": params_d, "batch_stats": stats_d}, z, train, groups,
        mutable=["batch_stats"],
    )
    return y, upd["batch_stats"]


# x/255 for every uint8 value, computed with the host pipeline's IEEE
# divide. XLA rewrites an on-device divide-by-constant into a
# reciprocal multiply (measured: 126/256 values 1 ULP off the host
# result), so on-device normalization reads this 256-entry constant
# instead — a ~1 us gather that makes the uint8-transfer path
# bit-identical to host normalization (runtime gather_normalize).
_U8_UNIT = np.arange(256, dtype=np.float32) / 255.0


def u8_to_unit_f32(batch: jax.Array) -> jax.Array:
    """uint8 image batch -> float32 in [0,1], bit-identical to the host
    pipeline's /255 (see _U8_UNIT)."""
    return jnp.take(jnp.asarray(_U8_UNIT), batch.astype(jnp.int32))


def unit_f32_to_u8(img: jax.Array) -> jax.Array:
    """[0,1] float image -> uint8 on-device, bit-identical to the host
    export convention ``(np.clip(x,0,1)*255).astype(np.uint8)``.

    The serving-side mirror of u8_to_unit_f32: quantizing before the
    device->host fetch quarters D2H bytes on bulk image export. numpy's
    astype TRUNCATES while XLA's float->int convert rounds to nearest,
    so the truncation is made explicit with floor (clip/multiply/floor
    are all exact single IEEE ops on both sides)."""
    x = jnp.clip(img.astype(jnp.float32), 0.0, 1.0) * 255.0
    return jnp.floor(x).astype(jnp.uint8)


def _normalize_input(step_fn: Callable) -> Callable:
    """Accept uint8 batches: normalize to float32 [0,1] on-device.

    The dtype branch resolves at trace time (dtypes are static under
    jit), so float batches compile to the identical program as before.
    uint8 batches arrive from DeviceLoader(transfer_dtype='uint8'/'auto')
    at 4x fewer bytes over the host->device link; the table lookup makes
    the loss math see bit-identical inputs to the float path."""

    def wrapped(state, batch):
        if batch.dtype == jnp.uint8:
            batch = u8_to_unit_f32(batch)
        return step_fn(state, batch)

    return wrapped


def _materialize_cached(step_fn: Callable, scan_steps: int,
                        sharding) -> Callable:
    """Accept CachedBatch references (data/loader.py): fold the
    device-cache row gather + conditional flip into the step's own XLA
    program. A cached-data train step is then ONE dispatch whose only
    host->device payload is the ~300-byte index/flag vectors — there is
    no separate gather dispatch to pay tunnel/launch latency for.

    The isinstance branch resolves at trace time (pytree structure is
    static under jit); plain array batches compile to the identical
    program as before."""
    from intro_tc_vae_tpu.data.loader import CachedBatch, gather_cached

    def wrapped(state, batch):
        if isinstance(batch, CachedBatch):
            batch = gather_cached(batch, scan_steps, sharding)
        return step_fn(state, batch)

    return wrapped


def _scan_steps(step_fn: Callable, k: int) -> Callable:
    """Fuse k train steps into one XLA program via lax.scan.

    The per-step launch/dispatch latency (significant for small batches:
    the intro step is ~13 small network passes) is paid once per k steps.
    Input batch shape becomes [k, B, ...]; returned metrics are the
    STACKED ``[k]`` tree lax.scan already produces — every inner step's
    scalars survive (the reference logs each step,
    solvers/vae.py:115-128). drain_metrics fans the k entries back out
    to their own global_steps on the host side, so TensorBoard density
    and NaN fail-fast latency are independent of k.
    """

    def scanned(state, batches):
        def body(st, b):
            st, m = step_fn(st, b)
            return st, m

        return jax.lax.scan(body, state, batches)

    return scanned


# ---------------------------------------------------------------------------
# host-side solver wrapper
# ---------------------------------------------------------------------------

class VAESolver:
    """Vanilla ELBO solver (reference solvers/vae.py:26-136) + the shared
    observability/evaluation surface inherited by all solvers.

    ``build_step`` is overridden by subclasses to swap the jitted step.
    """

    kl_kind = "gaussian"

    def __init__(
        self,
        *,
        dataset,
        encoder,
        decoder,
        batch_size: int,
        optimizer_e: optax.GradientTransformation,
        optimizer_d: optax.GradientTransformation,
        recon_loss_type: str = "mse",
        beta_kl: float = 1.0,
        beta_rec: float = 1.0,
        beta_neg: float = 1.0,
        gamma_r: float = 1e-8,
        writer=None,
        test_iter: int = 1000,
        clip: Optional[float] = None,
        tc_impl: str = "xla",
        tc_sampling: str = "stratified",
        kl_kind: Optional[str] = None,
        scan_steps: int = 1,
        mesh=None,
        batch_sharding=None,
        fuse_passes: bool = True,
        remat_passes: bool = False,
    ):
        self.dataset = dataset
        self.encoder = encoder
        self.decoder = decoder
        self.batch_size = batch_size
        self.optimizer_e = optimizer_e
        self.optimizer_d = optimizer_d
        self.writer = writer
        self.test_iter = test_iter
        self.mesh = mesh
        self.batch_sharding = batch_sharding
        # pair the intro step's independent passes into 2x-batch calls with
        # per-group BN stats (see solvers/intro.py); no-op for vae/tc steps
        self.fuse_passes = fuse_passes
        # checkpoint whole encode/decode passes of the intro step (config
        # remat="pass"): backward recomputes pass internals, only pass
        # boundaries persist in HBM; no-op for the single-phase vae/tc steps
        self.remat_passes = remat_passes

        image_size = encoder.image_size
        cdim = encoder.cdim
        self.hyper = SolverHyper(
            recon_loss_type=recon_loss_type,
            beta_kl=beta_kl,
            beta_rec=beta_rec,
            beta_neg=beta_neg,
            gamma_r=gamma_r,
            scale=1.0 / (cdim * image_size**2),
            dataset_size=len(dataset) if dataset is not None else 1,
            kl_kind=kl_kind or self.kl_kind,
            tc_impl=tc_impl,
            tc_sampling=tc_sampling,
            clip=clip,
            zdim=encoder.zdim,
            # scaling TC impls compute the GLOBAL-batch estimate via
            # shard_map when the batch is sharded over >1 data devices
            tc_mesh=mesh if tc_impl in ("blockwise", "pallas") else None,
        )

        self.latent_generator = None
        try:
            if dataset is not None and dataset.latent_indices is not None:
                from intro_tc_vae_tpu.evaluation.generator import LatentGenerator

                self.latent_generator = LatentGenerator(dataset)
        except (NotImplementedError, AttributeError):
            pass  # plain (non-factor) dataset: no disentanglement metrics

        self.scan_steps = int(scan_steps)
        # metric ring: device metric dicts buffered K steps deep and
        # fetched in ONE batched device_get — on the axon tunnel a
        # completion wait costs ~20ms regardless of payload, so per-step
        # fetches serialize the pipeline (2,252 -> 1,364 img/s measured)
        # while a K=8 ring drained >=2 steps behind the dispatch frontier
        # touches only completed buffers (~0.1ms). The ONE ring serves
        # both consumers: TensorBoard scalar writes (every step's values
        # still land at their own global_step) and the train loop's
        # NaN-check/postfix (drain_metrics returns the host dicts). The
        # loop drives the drain cadence; train_step only appends.
        self._metric_ring: list = []
        self.ring_depth = 8
        step = _normalize_input(self.build_step())
        if self.scan_steps > 1:
            step = _scan_steps(step, self.scan_steps)
        step = _materialize_cached(step, self.scan_steps, self.batch_sharding)
        self._step_fn = jax.jit(step, donate_argnums=(0,))
        self._eval_encode = None

    # -- construction -----------------------------------------------------

    def build_step(self) -> Callable:
        from intro_tc_vae_tpu.solvers.vae import build_vae_step

        return build_vae_step(
            self.hyper, self.encoder, self.decoder,
            self.optimizer_e, self.optimizer_d,
        )

    def init_state(self, rng: jax.Array, sample_batch) -> TrainState:
        """Initialize params/batch_stats/optimizer states."""
        k_e, k_d, k_run = jax.random.split(rng, 3)
        enc_vars = self.encoder.init({"params": k_e}, sample_batch[:1], True)
        dec_vars = self.decoder.init(
            {"params": k_d}, jnp.zeros((1, self.hyper.zdim)), True
        )
        params = {"encoder": enc_vars["params"], "decoder": dec_vars["params"]}
        batch_stats = {
            "encoder": enc_vars.get("batch_stats", {}),
            "decoder": dec_vars.get("batch_stats", {}),
        }
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state_e=self.optimizer_e.init(params["encoder"]),
            opt_state_d=self.optimizer_d.init(params["decoder"]),
            rng=k_run,
        )

    # -- hot loop ---------------------------------------------------------

    def train_step(self, state: TrainState, batch, cur_iter: int):
        """One optimization step. Returns (new_state, metrics dict).

        Metric values stay on device; they are fetched lazily by the train
        loop (one-step-behind async fetch) to keep the device pipeline full.
        """
        new_state, metrics = self._step_fn(state, batch)

        # Metrics are consumed BEHIND the device: fetching step N's
        # values immediately would block on the step just dispatched
        # (the reference pays .item() every step). The ring buffers the
        # device dicts (fresh outputs, never donated); the train loop
        # drains them in batches via drain_metrics. Image grids +
        # disentanglement metrics are test_iter-gated (rare) and run
        # synchronously on the current state.
        self._metric_ring.append((metrics, cur_iter))
        # Image grids + disentanglement metrics are test_iter-gated; the
        # gate is hoisted here so a CachedBatch is only materialized (one
        # extra gather dispatch) on the rare steps that actually render.
        if self.writer is not None and cur_iter % self.test_iter == 0:
            from intro_tc_vae_tpu.data.loader import CachedBatch, gather_cached

            vis_batch = batch
            if isinstance(vis_batch, CachedBatch):
                vis_batch = gather_cached(
                    vis_batch, self.scan_steps, self.batch_sharding
                )
            if self.scan_steps > 1:
                vis_batch = vis_batch[-1]
            self._write_heavy_metrics(new_state, vis_batch, cur_iter)
        return new_state, metrics

    def drain_metrics(self, keep_tail: int = 0):
        """Fetch all ring entries except the newest ``keep_tail`` in ONE
        batched device_get, TB-write them (writer on), and return the
        host-side ``[(metrics dict, iter), ...]``.

        keep_tail=2 on the hot path: entries >=2 steps old have already
        completed, so the batched fetch costs ~0.1ms instead of blocking
        on the step just dispatched (which would idle the device for the
        whole drain)."""
        n = len(self._metric_ring) - keep_tail
        if n <= 0:
            return []
        drained = self._metric_ring[:n]
        self._metric_ring = self._metric_ring[n:]
        fetched = jax.device_get([m for m, _ in drained])
        if self.scan_steps > 1:
            # scan_steps>1 buffers the stacked [K] metric tree per call;
            # fan each call back out to K per-step dicts at consecutive
            # global_steps (the train loop advances cur_iter by K per
            # call), so no inner step's scalars are dropped.
            out = [
                ({k: v[j] for k, v in host.items()}, it + j)
                for host, (_, it) in zip(fetched, drained)
                for j in range(self.scan_steps)
            ]
        else:
            out = [(host, it) for host, (_, it) in zip(fetched, drained)]
        if self.writer is not None:
            for host_metrics, it in out:
                self._write_scalar_metrics(host_metrics, it)
            self.writer.flush()  # once per drain, not once per step
        return out

    def flush_writes(self):
        """Drain the metric ring completely (one batched device fetch)."""
        self.drain_metrics(0)

    def check_finite(self, metrics):
        """Raise RuntimeError on NaN loss (reference solvers/vae.py:112-113)."""
        for name in ("loss_enc", "loss_dec"):
            if name in metrics and not np.isfinite(float(metrics[name])):
                raise RuntimeError(f"non-finite {name}: {metrics[name]}")

    # -- observability ----------------------------------------------------

    def _write_scalar_metrics(self, metrics, cur_iter: int):
        """Write one step's (host-side) scalar dict to TensorBoard."""
        losses = dict(
            r_loss=float(metrics["loss_rec"]),
            kl_loss=float(metrics["loss_kl"]),
        )
        if "expelbo_f" in metrics:
            losses["expelbo_f"] = float(metrics["expelbo_f"])
        self.write_scalars(cur_iter, losses)
        for tag in ("kl_loss_unscaled", "r_loss_unscaled", "lossE", "lossD",
                    "diff_kl", "fc_grad_norm"):
            if tag in metrics:
                self.writer.add_scalar(tag, float(metrics[tag]), global_step=cur_iter)
        if "tc_decomp/mi" in metrics:  # kl_kind='tc_full' (quirk Q11)
            self.writer.add_scalars(
                "tc_decomp",
                {k: float(metrics[f"tc_decomp/{k}"]) for k in ("mi", "tc", "kl")},
                global_step=cur_iter,
            )
        if self.hyper.clip and "total_norm" in metrics:
            self.writer.add_scalar(
                "total_norm", float(metrics["total_norm"]), global_step=cur_iter
            )

    def _write_heavy_metrics(self, state, batch, cur_iter: int):
        self._write_images_helper(state, batch, cur_iter)
        self.write_disentanglemnt_scores(state, cur_iter)

    def write_scalars(self, cur_iter: int, losses: dict, **kwargs):
        if self.writer is not None:
            self.writer.add_scalars("losses", losses, global_step=cur_iter)
            for name, value in kwargs.items():
                self.writer.add_scalar(name, value, global_step=cur_iter)

    def _write_images_helper(self, state, batch, cur_iter: int):
        if self.writer is None or cur_iter % self.test_iter != 0:
            return
        key = jax.random.fold_in(jax.random.key(0), cur_iter)
        noise = jax.random.normal(key, (batch.shape[0], self.hyper.zdim))
        fake, _ = decode(
            self.decoder, state.params["decoder"], state.batch_stats["decoder"],
            noise, train=False,
        )
        self.write_images(state, batch, fake, cur_iter)

    def write_images(self, state, batch, fake_batch, cur_iter: int):
        """Real / deterministic-reconstruction / sampled grids to TB
        (reference solvers/vae.py:147-163)."""
        if self.writer is None or cur_iter % self.test_iter != 0:
            return
        if batch.dtype == jnp.uint8:  # uint8-transfer path: normalize here
            batch = u8_to_unit_f32(jnp.asarray(batch))
        mu, _, _ = encode(
            self.encoder, state.params["encoder"], state.batch_stats["encoder"],
            batch, train=False,
        )
        rec_det, _ = decode(
            self.decoder, state.params["decoder"], state.batch_stats["decoder"],
            mu, train=False,
        )
        n = min(batch.shape[0], 16)
        grid = np.concatenate(
            [np.asarray(batch[:n]), np.asarray(rec_det[:n]), np.asarray(fake_batch[:n])],
            axis=0,
        )
        # NHWC -> NCHW for tensorboard add_images
        self.writer.add_images(
            "reconstructions", grid.transpose(0, 3, 1, 2), global_step=cur_iter
        )

    def write_disentanglemnt_scores(self, state, cur_iter: int, num_samples: int = 10000):
        """Four disentanglement metric families (reference vae.py:188-213).

        Name spelled as in the reference API (quirk Q9).
        """
        if (
            self.writer is None
            or self.latent_generator is None
            or cur_iter % self.test_iter != 0
        ):
            return
        from intro_tc_vae_tpu.evaluation import metrics as em

        if len(self.dataset) < num_samples:
            num_samples = len(self.dataset) // 2
        encode_fn = self.make_eval_encoder(state)
        kwargs = dict(
            latent_generator=self.latent_generator,
            encode_fn=encode_fn,
            num_samples=num_samples,
            batch_size=self.batch_size,
        )
        for write in (em.write_bvae_score, em.write_dci_score,
                      em.write_mig_score, em.write_mod_expl_score):
            try:
                write(self.writer, cur_iter, **kwargs)
            except Exception as e:
                # host-side sklearn metrics can fail on degenerate draws
                # (e.g. a single-class label sample with tiny eval sets);
                # never let that kill a long device run
                print(f"disentanglement metric {write.__name__} failed: {e}")

    def make_eval_encoder(self, state) -> Callable:
        """Jitted eval-mode encode: images -> (mu, logvar) numpy."""
        if self._eval_encode is None:
            @jax.jit
            def _enc(params_e, stats_e, x):
                (mu, logvar), _ = self.encoder.apply(
                    {"params": params_e, "batch_stats": stats_e}, x, False,
                    mutable=[],
                )
                return mu, logvar

            self._eval_encode = _enc

        def encode_fn(x):
            mu, logvar = self._eval_encode(
                state.params["encoder"], state.batch_stats["encoder"], jnp.asarray(x)
            )
            return np.asarray(mu), np.asarray(logvar)

        return encode_fn

    def write_gradient_flow(self, state, batch, cur_iter: int):
        """Per-layer |grad| mean/max bar chart (reference vae.py:215-254).

        Recomputed on demand (only every test_iter) so the hot step never
        pays for per-layer stats.
        """
        if self.writer is None or cur_iter % self.test_iter != 0:
            return
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        h, enc, dec = self.hyper, self.encoder, self.decoder

        @jax.jit
        def grads_of(state, batch):
            def loss_fn(params):
                key = jax.random.fold_in(state.rng, 12345)
                mu, logvar, _ = encode(enc, params["encoder"],
                                       state.batch_stats["encoder"], batch)
                z = ops.reparameterize(key, mu, logvar)
                rec, _ = decode(dec, params["decoder"],
                                state.batch_stats["decoder"], z)
                l_rec = rec_term(h, batch, rec, reduction="mean")
                l_kl, _ = kl_term(h, z, mu, logvar)
                return h.scale * (l_rec + l_kl)

            return jax.grad(loss_fn)(state.params)

        grads = grads_of(state, batch)
        flat = flax.traverse_util.flatten_dict(grads, sep="/")
        layers, ave, mx = [], [], []
        for name, g in flat.items():
            if name.endswith("bias"):
                continue
            layers.append(name)
            g = np.abs(np.asarray(g))
            ave.append(g.mean())
            mx.append(g.max())
        fig, ax = plt.subplots(figsize=(12, 4))
        ax.bar(np.arange(len(mx)), mx, alpha=0.3, lw=1, color="c", label="max-gradient")
        ax.bar(np.arange(len(ave)), ave, alpha=0.3, lw=1, color="b", label="mean-gradient")
        ax.set_xticks(range(len(layers)))
        ax.set_xticklabels(layers, rotation="vertical", fontsize=4)
        ax.set_ylim(bottom=-0.001, top=0.02)
        ax.set_xlabel("Layers")
        ax.set_ylabel("average gradient")
        ax.set_title("Gradient flow")
        ax.legend()
        fig.tight_layout()
        self.writer.add_figure("gradient_flow", fig, global_step=cur_iter)
        plt.close(fig)


def make_solver(name: str, **kwargs) -> VAESolver:
    """Solver factory; accepts 'vae' | 'tc' | 'intro' | 'intro-tc'/'intro_tc'
    (reference train.py:179-192 + BASELINE.json naming)."""
    from intro_tc_vae_tpu.solvers.intro import IntroSolver
    from intro_tc_vae_tpu.solvers.intro_tc import IntroTCSolver
    from intro_tc_vae_tpu.solvers.tc import TCSolver

    solvers = {
        "vae": VAESolver,
        "tc": TCSolver,
        "intro": IntroSolver,
        "intro-tc": IntroTCSolver,
        "intro_tc": IntroTCSolver,
    }
    if name not in solvers:
        raise ValueError(f"Solver '{name}' not supported! (known: {sorted(solvers)})")
    return solvers[name](**kwargs)
