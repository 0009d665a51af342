"""VI training: ensemble-averaged ELBO, Adam + reduce-on-plateau, metrics.

Mirrors the reference's two training loops
(/root/reference/Neural_network/VI/main_regression_VI.py:76-124,279-346 and
/root/reference/Operator_network/VI/main_VI_deeponet.py:23-81,130-203):

* per-step loss = mean over ``num_ens`` stochastic forward passes of the ELBO
  (ensembling here is a ``vmap`` over PRNG keys, not a Python loop);
* Adam with ReduceLROnPlateau on the validation loss (torch semantics:
  factor 0.1, rel threshold 1e-4, ``min_lr`` floor) — implemented as a pure
  plateau state update applied as an update-scale, so the whole step stays
  inside jit;
* optional learnable homoscedastic log-variance noise parameter optimized
  jointly with the variational parameters (reference appends it to the Adam
  param list, main_VI_deeponet.py:154-156);
* per-epoch metric rows [train_loss, valid_loss, train_mse, valid_mse]
  (+ aleatoric noise when learned) with best-validation tracking.

The model is abstracted as ``apply_fn(vp, batch, key, sample) -> pred`` or
``-> (pred, noise_head)`` so MLP and DeepONet pipelines share this loop.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from vihmc_tpu.vi.elbo import ELBOConfig, elbo_loss, get_beta
from vihmc_tpu.models.bayesian import kl_divergence


@dataclasses.dataclass(frozen=True)
class VIConfig:
    epochs: int = 1000
    lr_start: float = 1e-2
    min_lr: float = 1e-5
    patience: int = 100
    plateau_factor: float = 0.1
    num_ens: int = 10
    beta_type: Any = 1.0
    prior_mu: float = 0.0
    prior_sigma: float = 1.0
    elbo: ELBOConfig = dataclasses.field(default_factory=ELBOConfig)
    kl_direction: str = "reference"
    n_save: int = 0        # checkpoint every n_save epochs (0 = best/final only)
    log_every: int = 100


@struct.dataclass
class PlateauState:
    best: jnp.ndarray
    num_bad: jnp.ndarray
    scale: jnp.ndarray


def plateau_init() -> PlateauState:
    return PlateauState(best=jnp.asarray(jnp.inf, jnp.float32),
                        num_bad=jnp.zeros((), jnp.int32),
                        scale=jnp.ones((), jnp.float32))


def plateau_update(st: PlateauState, value, patience, factor, min_scale,
                   threshold=1e-4) -> PlateauState:
    """torch ReduceLROnPlateau (mode='min', threshold_mode='rel') as a pure fn."""
    improved = value < st.best * (1.0 - threshold)
    best = jnp.minimum(st.best, value)
    num_bad = jnp.where(improved, 0, st.num_bad + 1)
    reduce = num_bad > patience
    scale = jnp.where(reduce, jnp.maximum(st.scale * factor, min_scale), st.scale)
    num_bad = jnp.where(reduce, 0, num_bad)
    return PlateauState(best=best, num_bad=num_bad, scale=scale)


@struct.dataclass
class VITrainState:
    vp: Any                      # variational params {'mu','rho'}
    noise_param: jnp.ndarray     # scalar log-variance (used iff learn_noise)
    opt_state: Any
    plateau: PlateauState
    epoch: jnp.ndarray


def init_train_state(vp, cfg: VIConfig, optimizer=None) -> VITrainState:
    optimizer = optimizer or optax.adam(cfg.lr_start)
    noise0 = jnp.zeros((), jnp.float32)
    params = (vp, noise0) if cfg.elbo.learn_noise else (vp,)
    return VITrainState(vp=vp, noise_param=noise0, opt_state=optimizer.init(params),
                        plateau=plateau_init(), epoch=jnp.zeros((), jnp.int32))


def _split_pred(out):
    """apply_fn may return pred or (pred, noise_head)."""
    if isinstance(out, tuple):
        return out
    return out, None


def make_loss_fn(apply_fn: Callable, cfg: VIConfig, train_size):
    """(vp, noise_param, batch, key, beta) -> scalar mean-ensemble negative ELBO."""

    def loss_fn(vp, noise_param, batch, key, beta):
        target = batch["y"]
        kl = kl_divergence(vp, cfg.prior_mu, cfg.prior_sigma, cfg.kl_direction)

        def one(k):
            pred, noise_head = _split_pred(apply_fn(vp, batch, k, True))
            noise = noise_head if cfg.elbo.noise_type == 1 else noise_param
            return elbo_loss(cfg.elbo, pred, target, kl, beta, train_size, noise)

        losses = jax.vmap(one)(jax.random.split(key, cfg.num_ens))
        return jnp.mean(losses)

    return loss_fn


def _sgd_update(loss_fn, optimizer, cfg: VIConfig, state: VITrainState,
                batch, key, beta):
    """One ELBO gradient step (shared by the jitted step and the scan paths);
    plateau scale multiplies the updates (= lr scale)."""
    if cfg.elbo.learn_noise:
        def wrapped(params):
            vp, noise = params
            return loss_fn(vp, noise, batch, key, beta)
        params = (state.vp, state.noise_param)
    else:
        def wrapped(params):
            (vp,) = params
            return loss_fn(vp, state.noise_param, batch, key, beta)
        params = (state.vp,)

    loss, grads = jax.value_and_grad(wrapped)(params)
    updates, opt_state = optimizer.update(grads, state.opt_state, params)
    updates = jax.tree_util.tree_map(lambda u: u * state.plateau.scale, updates)
    params = optax.apply_updates(params, updates)
    if cfg.elbo.learn_noise:
        vp, noise = params
    else:
        (vp,), noise = params, state.noise_param
    return state.replace(vp=vp, noise_param=noise, opt_state=opt_state), loss


def make_train_step(apply_fn: Callable, cfg: VIConfig, train_size, optimizer=None):
    """Jitted SGD step."""
    optimizer = optimizer or optax.adam(cfg.lr_start)
    loss_fn = make_loss_fn(apply_fn, cfg, train_size)

    @jax.jit
    def step(state: VITrainState, batch, key, beta):
        return _sgd_update(loss_fn, optimizer, cfg, state, batch, key, beta)

    return step


def make_eval_fn(apply_fn: Callable, cfg: VIConfig, train_size):
    """Jitted (loss, mse) evaluation on one batch dict with mean weights."""
    loss_fn = make_loss_fn(apply_fn, cfg, train_size)

    @jax.jit
    def evaluate(state: VITrainState, batch, key, beta):
        loss = loss_fn(state.vp, state.noise_param, batch, key, beta)
        pred, _ = _split_pred(apply_fn(state.vp, batch, key, False))
        mse = jnp.mean((pred.reshape(batch["y"].shape) - batch["y"]) ** 2)
        return loss, mse

    return evaluate


def predictive_samples(apply_fn: Callable, vp, batch, key, n: int):
    """n stochastic forward passes (the reference's ``do_uq``,
    main_regression_VI.py:167-190) as one vmap."""
    def one(k):
        out = apply_fn(vp, batch, k, True)
        return out[0] if isinstance(out, tuple) else out

    return jax.vmap(one)(jax.random.split(key, n))


def train_fullbatch_scan(
    apply_fn: Callable,
    state: VITrainState,
    cfg: VIConfig,
    train_batch,
    valid_batch,
    train_size,
    key,
    optimizer=None,
):
    """Whole full-batch training as ONE compiled lax.scan over epochs.

    The python-loop :func:`train` costs several host round-trips per epoch —
    prohibitive on remote-execution backends (hundreds of ms each). This
    variant runs every epoch (step + train/valid evaluation + plateau update
    + best-state tracking) inside a single scan: one dispatch for the whole
    run. Restricted to constant (float) beta and full-batch data (the NN
    reference configuration, beta_type=1.0 at Neural_network/VI/config.py:33).

    Returns (final_state, best_state, metrics (E, 4)).
    """
    if not isinstance(cfg.beta_type, float):
        raise ValueError("train_fullbatch_scan requires a constant float beta")
    optimizer = optimizer or optax.adam(cfg.lr_start)
    loss_fn = make_loss_fn(apply_fn, cfg, train_size)
    beta = cfg.beta_type

    def sgd_step(state, batch, k):
        return _sgd_update(loss_fn, optimizer, cfg, state, batch, k, beta)

    def mse_of(state, batch, k):
        pred, _ = _split_pred(apply_fn(state.vp, batch, k, False))
        return jnp.mean((pred.reshape(batch["y"].shape) - batch["y"]) ** 2)

    @jax.jit
    def run(state, key):
        def epoch(carry, k):
            state, best_vp, best_noise, best_valid = carry
            ks, kv, kt = jax.random.split(k, 3)
            state, train_loss = sgd_step(state, train_batch, ks)
            valid_loss = loss_fn(state.vp, state.noise_param, valid_batch, kv, beta)
            train_mse = mse_of(state, train_batch, kt)
            valid_mse = mse_of(state, valid_batch, kt)
            state = state.replace(
                plateau=plateau_update(state.plateau, valid_loss, cfg.patience,
                                       cfg.plateau_factor,
                                       cfg.min_lr / cfg.lr_start),
                epoch=state.epoch + 1,
            )
            improved = valid_loss < best_valid
            best_vp = jax.tree_util.tree_map(
                lambda new, old: jnp.where(improved, new, old), state.vp, best_vp)
            best_noise = jnp.where(improved, state.noise_param, best_noise)
            best_valid = jnp.minimum(best_valid, valid_loss)
            row = jnp.stack([train_loss, valid_loss, train_mse, valid_mse])
            return (state, best_vp, best_noise, best_valid), row

        keys = jax.random.split(key, cfg.epochs)
        carry0 = (state, state.vp, state.noise_param, jnp.asarray(jnp.inf))
        (state, best_vp, best_noise, _), rows = jax.lax.scan(epoch, carry0, keys)
        return state, best_vp, best_noise, rows

    final_state, best_vp, best_noise, rows = run(state, key)
    best_state = final_state.replace(vp=best_vp, noise_param=best_noise)
    import numpy as np

    return final_state, best_state, np.asarray(rows)


def train(
    apply_fn: Callable,
    state: VITrainState,
    cfg: VIConfig,
    train_batches_fn: Callable,   # (key, epoch) -> list/stack of batch dicts
    valid_batch,                  # batch dict for validation
    train_eval_batch,             # batch dict for train-side metrics
    train_size,
    key,
    optimizer=None,
    callback: Optional[Callable] = None,  # (epoch, metrics_row, state) -> None
    ckpt_dir: Optional[str] = None,
    restart: bool = False,
):
    """Epoch loop. Returns (final_state, best_state, metrics ndarray).

    With ``ckpt_dir``, the best-validation state is checkpointed whenever it
    improves and the full state every ``cfg.n_save`` epochs; ``restart=True``
    resumes from the latest checkpoint (the reference's ``restart`` +
    ``model_file`` flow, main_regression_VI.py:301-303,328-344).
    """
    import numpy as np

    start_epoch = 0
    if ckpt_dir is not None and restart:
        from vihmc_tpu.io.checkpoint import load_checkpoint, latest_step

        step_no = latest_step(ckpt_dir)
        if step_no is not None:
            payload = load_checkpoint(ckpt_dir, step_no,
                                      template={"state": state, "epoch": 0})
            state = jax.tree_util.tree_map(jnp.asarray, payload["state"])
            start_epoch = int(payload["epoch"])

    optimizer = optimizer or optax.adam(cfg.lr_start)
    step = make_train_step(apply_fn, cfg, train_size, optimizer)
    evaluate = make_eval_fn(apply_fn, cfg, train_size)

    metrics = []
    best_state = state
    best_valid = float("inf")
    for epoch in range(start_epoch, cfg.epochs):
        key, ek, vk, tk = jax.random.split(key, 4)
        batches = train_batches_fn(ek, epoch)
        m = len(batches)
        ep_loss = 0.0
        for i, batch in enumerate(batches):
            ek, sk = jax.random.split(ek)
            beta = get_beta(i, m, cfg.beta_type, epoch, cfg.epochs)
            state, loss = step(state, batch, sk, beta)
            ep_loss += float(loss)
        ep_loss /= m

        beta_eval = get_beta(0, m, cfg.beta_type, epoch, cfg.epochs)
        valid_loss, valid_mse = evaluate(state, valid_batch, vk, beta_eval)
        _, train_mse = evaluate(state, train_eval_batch, tk, beta_eval)
        state = state.replace(
            plateau=plateau_update(state.plateau, valid_loss, cfg.patience,
                                   cfg.plateau_factor, cfg.min_lr / cfg.lr_start),
            epoch=state.epoch + 1,
        )
        row = [ep_loss, float(valid_loss), float(train_mse), float(valid_mse)]
        if cfg.elbo.learn_noise:
            row.append(float(jnp.exp(state.noise_param)))
        metrics.append(row)
        improved = float(valid_loss) < best_valid
        if improved:
            best_valid = float(valid_loss)
            best_state = state
        if ckpt_dir is not None:
            from vihmc_tpu.io.checkpoint import save_checkpoint

            if improved:
                save_checkpoint(ckpt_dir + "/best", 0, {
                    "state": jax.device_get(state), "epoch": epoch + 1})
            if cfg.n_save and (epoch + 1) % cfg.n_save == 0:
                save_checkpoint(ckpt_dir, epoch + 1, {
                    "state": jax.device_get(state), "epoch": epoch + 1})
        if callback is not None:
            callback(epoch, row, state)

    if ckpt_dir is not None:
        from vihmc_tpu.io.checkpoint import save_checkpoint

        save_checkpoint(ckpt_dir, cfg.epochs, {
            "state": jax.device_get(state), "epoch": cfg.epochs})
    return state, best_state, np.asarray(metrics)
