"""VI-HMC: HMC over the sensitivity-selected subspace — the flagship pipeline.

Reference: /root/reference/Neural_network/VI_HMC/main_VI_HMC.py and
/root/reference/Operator_network/VI_HMC/main_VI_HMC_burgers.py. Stages:

1. load stage-2 artifacts (VI means/stds over the full flat vector +
   sensitive indices);
2. build the subspace log-posterior: likelihood over the full vector with the
   insensitive coordinates frozen per policy, plus a subspace prior that is
   either the VI posterior (``load_prior``/``load_std``,
   main_VI_HMC_burgers.py:263-266) or N(0, prior_var);
3. initialize from the VI mean / a VI draw (``init_prior``/``sample_prior``,
   main_VI_HMC_burgers.py:277-283);
4. run chains (vectorized + mesh-shardable instead of the reference's
   sequential loop) and evaluate the posterior predictive.

TPU-first extension beyond the reference: ``vi_mass=True`` uses the VI
posterior variances of the subspace as a diagonal inverse mass matrix
(preconditioning), which the BASELINE.md north star calls for.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from vihmc_tpu.chains import sample_chains, summarize_np, effective_sample_size_np
from vihmc_tpu.dists.likelihoods import get_likelihood
from vihmc_tpu.dists.priors import DiagonalGaussianPrior, IsotropicGaussianPrior
from vihmc_tpu.hmc import HMCConfig, FrozenPolicy, SubspaceSpec, make_subspace_log_prob
from vihmc_tpu.hmc.subspace import draw_full
from vihmc_tpu.core.ravel import scatter_subspace
from vihmc_tpu.pipelines.common import make_flat_mlp, make_flat_deeponet
from vihmc_tpu.pipelines.configs import VIHMCRunConfig
from vihmc_tpu.pipelines.predict import posterior_predictive, predictive_metrics
from vihmc_tpu.data.synthetic import regression_data
from vihmc_tpu.data.burgers import get_burgers
from vihmc_tpu.io.artifacts import RunStore


def make_spec(artifacts) -> SubspaceSpec:
    return SubspaceSpec(idx=tuple(int(i) for i in artifacts["indices"]),
                        mu=jnp.asarray(artifacts["mu"]),
                        sigma=jnp.asarray(artifacts["sigma"]))


def make_subspace_prior(cfg: VIHMCRunConfig, spec: SubspaceSpec):
    """The subspace prior per the reference's load_prior/load_std switches
    (main_VI_HMC_burgers.py:263-266): VI posterior (optionally with fixed
    stds) or N(0, prior_var)."""
    if cfg.load_prior:
        scale = spec.sub_sigma() if cfg.load_std else jnp.full(
            (spec.subspace_dim,), cfg.prior_var ** 0.5)
        return DiagonalGaussianPrior(loc=spec.sub_mu(), scale=scale)
    return IsotropicGaussianPrior(scale=cfg.prior_var ** 0.5)


def build_subspace_posterior(cfg: VIHMCRunConfig, full_forward, y, artifacts,
                             init_key, full_ll=None):
    """Assemble (log_prob(q, aux), aux0, refresh, spec, prior, inv_mass).

    ``full_ll`` overrides the composed likelihood (e.g. the fused Pallas
    DeepONet merge+NLL path)."""
    spec = make_spec(artifacts)
    like = get_likelihood(cfg.loss)

    if full_ll is None:
        def full_ll(flat):
            return like(full_forward(flat).reshape(y.shape), y, cfg.tau_out)

    policy = FrozenPolicy(cfg.frozen_policy)
    lp_like, aux0, refresh = make_subspace_log_prob(full_ll, spec, policy, init_key)
    prior = make_subspace_prior(cfg, spec)

    def log_prob(q_sub, aux):
        return lp_like(q_sub, aux) + prior.log_prob(q_sub)

    inv_mass = spec.sub_sigma() ** 2 if cfg.vi_mass else 1.0
    if cfg.laplace_mass:
        # diagonal conditional-Laplace metric from the stage-2 Fisher:
        # posterior precision ~ prior precision + n_data * E[J_i^2] / tau,
        # with E[J^2] recovered from the sensitivity artifact
        # (scores = mean-squared-Jacobian * sigma^2). Motivation: mean-field
        # VI sigmas can overestimate the *conditional* posterior scales by
        # an order of magnitude (measured 18x on the round-3 Burgers fit —
        # docs/performance.md round 3), and a mismatched metric stalls HMC;
        # the metric choice never changes the stationary law.
        scores = artifacts.get("scores")
        if scores is None:
            raise ValueError("laplace_mass needs 'scores' (the sensitivity-"
                             "score artifact) in artifacts")
        if cfg.laplace_n_data is None:
            raise ValueError("laplace_mass needs laplace_n_data (number of "
                             "likelihood observations)")
        import numpy as _np

        idx_np = _np.sort(_np.asarray(artifacts["indices"]).ravel())
        sig_np = _np.asarray(artifacts["sigma"]).ravel()[idx_np]
        g2 = _np.asarray(scores).ravel()[idx_np] / _np.maximum(sig_np ** 2,
                                                               1e-30)
        prior_scale = _np.broadcast_to(_np.asarray(prior.scale),
                                       idx_np.shape)
        lap_var = 1.0 / (1.0 / _np.maximum(prior_scale ** 2, 1e-30)
                         + cfg.laplace_n_data * g2 / cfg.tau_out)
        inv_mass = jnp.asarray(lap_var, jnp.float32)
    return log_prob, aux0, refresh, spec, prior, inv_mass


def chain_inits(cfg: VIHMCRunConfig, spec: SubspaceSpec, key):
    """Per-chain initial subspace vectors (main_VI_HMC_burgers.py:277-283)."""
    keys = jax.random.split(key, cfg.num_chains)
    if cfg.init_prior and cfg.sample_prior:
        return jax.vmap(lambda k: draw_full(k, spec)[spec.idx_array])(keys)
    if cfg.init_prior:
        return jnp.tile(spec.sub_mu()[None, :], (cfg.num_chains, 1))
    return jax.vmap(lambda k: 0.1 * jax.random.normal(k, (spec.subspace_dim,)))(keys)


def evaluate_samples(cfg: VIHMCRunConfig, spec: SubspaceSpec, prior, eval_forward,
                     y_eval, samples, keep_predictions: int = 64,
                     max_metric_samples: int = 4096, frozen_base=None):
    """Posterior-predictive evaluation of (C, S, d) or (S, d) subspace samples.

    Shared by live runs and the reload-and-score re-evaluation mode
    (the reference's ``evaluate``/``eval_dt_string`` flow,
    main_VI_HMC_burgers.py:304-349).

    ``frozen_base``: the full-vector base the subspace samples scatter into.
    MUST match the frozen vector the sampler actually conditioned on — a
    sample compensates ITS frozen coordinates, so evaluating against a
    different base mis-scores it (the reference's predict path reuses the
    sampler's ``self.sampled_weights`` for exactly this reason,
    my_make_func.py:47-49). Default: the VI mean (correct for the MEAN
    policy; callers with DRAW/REFRESH should pass the sampler's aux).
    A (C, D) array gives each chain its own base (REFRESH under vmap: every
    chain carries its own frozen draws — ADVICE r3) — each pooled sample is
    then scored against its own chain's base.

    Metrics stream over all pooled samples (O(eval-set) memory); the returned
    ``predictions`` array is a uniform thinning to at most
    ``keep_predictions`` samples (enough for predictive-band plots and
    error-sigma statistics without materializing S x N x P floats).
    """
    from vihmc_tpu.pipelines.predict import streaming_predictive_metrics

    import numpy as _np

    like = get_likelihood(cfg.loss)
    idx = spec.idx_array
    base = spec.mu if frozen_base is None else jnp.asarray(frozen_base)
    # keep the full sample history HOST-side: at reference scale it is
    # multiple GB and must not ride along to the device — only the thinned
    # pooled subsets below are transferred
    samples = _np.asarray(samples)
    if samples.ndim == 2:
        samples = samples[None]
    burn = cfg.burn_
    per_chain_base = base.ndim == 2

    def lp_and_pred(q_sub, cid=None):
        b = base[cid] if per_chain_base else base
        full = scatter_subspace(b, q_sub, idx)
        pred = eval_forward(full)
        lp = like(pred.reshape(y_eval.shape), y_eval, cfg.tau_out) \
            + prior.log_prob(q_sub)
        return lp, pred

    n_chains_s = samples.shape[0]
    n_kept = samples.shape[1] - burn
    pooled = samples[:, burn:, :].reshape(-1, spec.subspace_dim)
    # chain id of each pooled row (chain-major reshape) — scores every
    # sample against ITS chain's frozen base when base is (C, D)
    cids = _np.repeat(_np.arange(n_chains_s, dtype=_np.int32), n_kept)
    if pooled.shape[0] > max_metric_samples:
        # bound the metric pass (device residency + S forward evals) for
        # long runs; a uniform thinning of thousands of pooled draws leaves
        # the expected-MSE estimates' MC error negligible
        stride = -(-pooled.shape[0] // max_metric_samples)
        pooled = pooled[::stride]
        cids = cids[::stride]
    scan_in = (jnp.asarray(pooled), jnp.asarray(cids))
    metrics = jax.jit(
        lambda s: streaming_predictive_metrics(
            lambda qc: lp_and_pred(*qc), s, y_eval)
    )(scan_in)
    mean_prediction = metrics.pop("mean_prediction")

    preds = None
    if keep_predictions:
        stride = max(1, pooled.shape[0] // keep_predictions)
        thinned = jnp.asarray(pooled[::stride][:keep_predictions])
        cid_thin = jnp.asarray(cids[::stride][:keep_predictions])
        _, preds = posterior_predictive(
            jax.jit(lambda qc: lp_and_pred(*qc)), (thinned, cid_thin),
            chunk_size=32)
    diag = summarize_np(samples[:, burn:, :])
    return {
        "metrics": metrics,
        "diagnostics": diag,
        "ess": diag["ess"],
        "predictions": preds,
        "mean_prediction": mean_prediction,
    }


def run_subspace_hmc(cfg: VIHMCRunConfig, full_forward, y_train, artifacts, key,
                     eval_forward=None, y_eval=None, mesh=None,
                     store: Optional[RunStore] = None, subsample=None,
                     full_ll=None, full_grad=None, segment_size=None,
                     checkpoint_dir=None, progress=None, sample_thin=1,
                     evaluate=True):
    """Generic subspace-HMC driver shared by NN and operator pipelines.

    ``subsample``: optional dict {n_points, p, forward(flat, tidx), y_fn(tidx)}
    enabling per-draw random query-point subsampling: the index set joins the
    frozen vector as sampler state, both refreshed before each draw.
    ``full_ll``: optional fused likelihood override (see
    :func:`build_subspace_posterior`).
    ``full_grad``: optional full-flat-vector likelihood-gradient oracle (e.g.
    the Gram-form DeepONet gradient) used for leapfrog trajectories instead
    of autodiff; the exact density still decides MH acceptance. Plain HMC
    only; requires ``subsample=None``.
    ``segment_size``: run the sampler in checkpointed segments via
    :func:`vihmc_tpu.chains.sample_chains_resumable` (plain HMC, no mesh) —
    the production path for long reference-scale chains on backends with a
    per-dispatch draw ceiling; with ``checkpoint_dir`` an interrupted run
    resumes bitwise-identically. ``progress(seg, n_segments, state)`` is
    forwarded to the segment runner.
    """
    k_frozen, k_init, k_sample, k_sub = jax.random.split(key, 4)
    log_prob, aux0, refresh, spec, prior, inv_mass = build_subspace_posterior(
        cfg, full_forward, y_train, artifacts, k_frozen, full_ll=full_ll)

    auto_probe = None
    if cfg.algorithm == "auto":
        # burn-phase stiffness probe (VERDICT r3 item 9): the largest
        # eigenvalue of the PRECONDITIONED conditional curvature at the VI
        # mean decides the sampler. lambda ~ 1: the diagonal metric already
        # matches the conditional — the fixed-L jittered recipe wins (r2:
        # 19.3 vs NUTS 3.9 ESS/s). lambda >> threshold without a low-rank
        # metric: trajectories are stability-limited far below the soft
        # scales — adaptive-depth NUTS wins (r3 stiff fit: 3.2 vs 2.29).
        # With lowrank_rank configured the metric absorbs the stiffness and
        # fixed-L stays optimal. Cost: one tiny Lanczos (8 HVPs).
        import dataclasses as _dc

        from vihmc_tpu.hmc.metric import lanczos_eigs, preconditioned_hvp

        diag_p = inv_mass * jnp.ones((spec.subspace_dim,), jnp.float32)

        @jax.jit
        def _lam_max(q0, diag):
            mv = preconditioned_hvp(log_prob, q0, diag, aux=aux0)
            vals, _ = lanczos_eigs(mv, spec.subspace_dim, rank=1,
                                   num_iters=min(8, spec.subspace_dim),
                                   key=jax.random.fold_in(k_frozen, 0xA0))
            return vals[0]

        lam_max = float(_lam_max(spec.sub_mu(), diag_p))
        stiff = lam_max > cfg.auto_stiffness_threshold
        choice = "nuts" if (stiff and not cfg.lowrank_rank) else "hmc"
        auto_probe = {"lambda_max": lam_max, "algorithm": choice}
        cfg = _dc.replace(cfg, algorithm=choice)

    # the (D,) diagonal metric view: preconditioned-norm clipping and the
    # init-optimizer's step scaling stay diagonal even when the kinetic
    # metric itself is low-rank+diagonal
    inv_mass_diag = inv_mass
    if cfg.lowrank_rank:
        if cfg.algorithm != "hmc" or subsample is not None:
            raise ValueError("lowrank_rank requires algorithm='hmc' and no "
                             "query subsampling")
        from vihmc_tpu.hmc.metric import estimate_lowrank_metric

        diag = inv_mass * jnp.ones((spec.subspace_dim,), jnp.float32)
        inv_mass_diag = diag
        inv_mass = estimate_lowrank_metric(
            log_prob, spec.sub_mu(), diag, rank=cfg.lowrank_rank,
            num_iters=cfg.lowrank_iters,
            key=jax.random.fold_in(k_frozen, 0x10e), aux=aux0)

    grad_fn = None
    if full_grad is not None:
        if cfg.algorithm not in ("hmc", "chees", "nuts") or subsample is not None:
            raise ValueError("full_grad requires algorithm='hmc', 'chees' or "
                             "'nuts' and no query subsampling")
        if cfg.gauss_field is not None and not cfg.gauss_field_auto:
            raise ValueError("gauss_field and a full_grad oracle are "
                             "mutually exclusive trajectory fields "
                             "(set gauss_field_auto to probe-and-fall-back)")
        from vihmc_tpu.hmc import make_subspace_grad

        grad_fn = make_subspace_grad(full_grad, spec, prior=prior)
    elif cfg.gauss_field is not None and not cfg.gauss_field_auto:
        if cfg.algorithm not in ("hmc", "chees", "nuts"):
            raise ValueError("gauss_field requires algorithm='hmc', 'chees' "
                             "or 'nuts'")
        from vihmc_tpu.hmc import gaussian_field_grad

        grad_fn = gaussian_field_grad(spec.sub_mu(), spec.sub_sigma(),
                                      cfg.gauss_field)

    gauss_fn = None
    if cfg.gauss_field_auto:
        # auto mode: build the VI-Gaussian field alongside the fallback
        # field (grad_fn as configured above, or autodiff); a short probe
        # below decides which one samples
        if cfg.algorithm != "hmc" or subsample is not None:
            raise ValueError("gauss_field_auto requires algorithm='hmc' "
                             "and no query subsampling")
        from vihmc_tpu.hmc import gaussian_field_grad

        gauss_fn = gaussian_field_grad(
            spec.sub_mu(), spec.sub_sigma(),
            1.0 if cfg.gauss_field is None else cfg.gauss_field)

    if subsample is not None:
        like = get_likelihood(cfg.loss)
        idx_arr = spec.idx_array
        sub_forward, y_fn = subsample["forward"], subsample["y_fn"]
        n_points, p = subsample["n_points"], subsample["p"]

        def log_prob(q_sub, aux):  # noqa: F811 — subsampled variant
            frozen, tidx = aux["frozen"], aux["tidx"]
            full = scatter_subspace(frozen, q_sub, idx_arr)
            y_sub = y_fn(tidx)
            ll = like(sub_forward(full, tidx).reshape(y_sub.shape), y_sub,
                      cfg.tau_out)
            return ll + prior.log_prob(q_sub)

        frozen_refresh = refresh

        def refresh(key, aux):  # noqa: F811
            k1, k2 = jax.random.split(key)
            frozen = (frozen_refresh(k1, aux["frozen"])
                      if frozen_refresh is not None else aux["frozen"])
            tidx = jax.random.choice(k2, n_points, shape=(p,), replace=False)
            return {"frozen": frozen, "tidx": tidx}

        aux0 = {"frozen": aux0,
                "tidx": jax.random.choice(k_sub, n_points, shape=(p,),
                                          replace=False)}

    if cfg.clip_grad is not None:
        # after any subsample rebinding so the clip wraps the final target
        if cfg.algorithm not in ("hmc", "chees", "nuts"):
            raise ValueError("clip_grad requires algorithm='hmc', 'chees' "
                             "or 'nuts'")
        from vihmc_tpu.hmc import clipped_grad_fn

        if grad_fn is not None:
            grad_fn = clipped_grad_fn(grad_fn, cfg.clip_grad,
                                      inv_mass=inv_mass_diag)
        else:
            grad_fn = clipped_grad_fn(log_prob, cfg.clip_grad,
                                      inv_mass=inv_mass_diag, is_grad=False)
        if gauss_fn is not None:
            gauss_fn = clipped_grad_fn(gauss_fn, cfg.clip_grad,
                                       inv_mass=inv_mass_diag)

    inits = chain_inits(cfg, spec, k_init)
    if cfg.init_optimize:
        # warm start at the conditional's approximate mode: under a FIXED
        # frozen vector (draw/mean policies) the VI mean can sit tens of
        # thousands of nats below the conditional typical set (the frozen
        # draw's likelihood damage must be compensated by the sensitive
        # coordinates), where every trajectory rejects and dual averaging
        # death-spirals. A few Adam steps on -log p(q | frozen) before
        # sampling fix the init; MCMC correctness is unaffected by where
        # chains start. Per-chain spread comes from a small sigma-scaled
        # jitter around the optimum.
        import optax

        trajectory_oracle = grad_fn  # clipped field; fall back to autodiff
        if trajectory_oracle is None:
            trajectory_oracle = jax.grad(lambda q, a: log_prob(q, a))

        # optimize in the PRECONDITIONED space q = q0 + scale * z (scale =
        # sqrt(inv_mass) — the kinetic metric's own length unit): a raw
        # per-coordinate Adam lr is multiple metric-sigmas per step on the
        # sharpest dims and oscillates instead of descending; in z-space
        # ``init_optimize_lr`` means metric-sigmas per step.
        scale = jnp.sqrt(inv_mass_diag * jnp.ones((spec.subspace_dim,),
                                                  jnp.float32))
        q0 = spec.sub_mu()

        opt = optax.adam(cfg.init_optimize_lr)

        def opt_step(carry, _):
            z, opt_state = carry
            g_z = scale * trajectory_oracle(q0 + scale * z, aux0)
            updates, opt_state = opt.update(
                jax.tree_util.tree_map(lambda x: -x, g_z), opt_state, z)
            return (optax.apply_updates(z, updates), opt_state), None

        z0 = jnp.zeros_like(q0)
        (z_star, _), _ = jax.jit(lambda z: jax.lax.scan(
            opt_step, (z, opt.init(z)), None,
            length=cfg.init_optimize))(z0)
        q_star = q0 + scale * z_star
        k_init2 = jax.random.fold_in(k_init, 7)
        jitter = 0.5 * scale * jax.random.normal(
            k_init2, (cfg.num_chains, spec.subspace_dim))
        inits = q_star[None, :] + jitter

    gauss_field_used = None
    probe_acceptance = None
    if gauss_fn is not None:
        # auto mode probe: run gauss_field_probe_draws with the VI-Gaussian
        # trajectory field; keep it if the mean MH acceptance clears
        # gauss_field_floor, else sample with the fallback field (grad_fn as
        # configured above: Gram/stride oracle or plain autodiff).
        k_sample, k_probe = jax.random.split(k_sample)
        probe_cfg = HMCConfig(
            num_samples=max(1, cfg.gauss_field_probe_draws),
            num_leapfrog=cfg.L, step_size=cfg.step_size, burn=0,
            sampler="hmc", jitter_l=cfg.jitter_l, jitter_eps=cfg.jitter_eps,
            jitter_low_frac=cfg.jitter_low_frac, max_step=cfg.max_step)
        probe = sample_chains(log_prob, inits, k_probe, probe_cfg,
                              inv_mass=inv_mass, aux=aux0,
                              aux_refresh=refresh, mesh=mesh,
                              grad_fn=gauss_fn)
        # mean MH probability, not the accept indicator: far lower variance
        # over a handful of probe draws
        probe_acceptance = float(jnp.mean(probe.accept_probs))
        gauss_field_used = probe_acceptance >= cfg.gauss_field_floor
        if gauss_field_used:
            grad_fn = gauss_fn

    if cfg.algorithm != "hmc" and cfg.save_vi_trace:
        raise ValueError("save_vi_trace is supported for algorithm='hmc' "
                         "only (the reference's VI-HMC uses plain HMC)")
    if cfg.algorithm == "chees":
        from vihmc_tpu.hmc.chees import ChEESConfig
        from vihmc_tpu.chains import sample_chains_chees

        if cfg.adapt_mass:
            raise ValueError("adapt_mass is not supported with "
                             "algorithm='chees' (ChEES adapts step size and "
                             "trajectory length; use vi_mass for a fixed "
                             "preconditioner)")
        # ChEES always dual-averages the step size; targets above the
        # method's 0.651 optimum are clamped
        chees_cfg = ChEESConfig(num_samples=cfg.num_samples,
                                step_size=cfg.step_size,
                                init_traj_length=max(cfg.L, 1) * cfg.step_size,
                                burn=cfg.burn_,
                                max_steps=cfg.chees_max_steps,
                                target_accept=min(cfg.target_accept, 0.651))
        res = sample_chains_chees(log_prob, inits, k_sample, chees_cfg,
                                  inv_mass=inv_mass, aux=aux0,
                                  aux_refresh=refresh, mesh=mesh,
                                  grad_fn=grad_fn)
    elif cfg.algorithm == "nuts":
        from vihmc_tpu.hmc.nuts import NUTSConfig
        from vihmc_tpu.chains import sample_chains_nuts

        nuts_cfg = NUTSConfig(num_samples=cfg.num_samples,
                              max_depth=cfg.nuts_max_depth,
                              step_size=cfg.step_size, burn=cfg.burn_,
                              adapt_step_size=True,
                              target_accept=cfg.target_accept,
                              adapt_mass=cfg.adapt_mass,
                              mass_schedule=cfg.mass_schedule)
        res = sample_chains_nuts(log_prob, inits, k_sample, nuts_cfg,
                                 inv_mass=inv_mass, aux=aux0,
                                 aux_refresh=refresh, mesh=mesh,
                                 grad_fn=grad_fn)
    else:
        hmc_cfg = HMCConfig(num_samples=cfg.num_samples, num_leapfrog=cfg.L,
                            step_size=cfg.step_size, burn=cfg.burn_,
                            sampler="hmc_nuts" if cfg.adapt_step_size else "hmc",
                            target_accept=cfg.target_accept,
                            adapt_mass=cfg.adapt_mass,
                            mass_schedule=cfg.mass_schedule,
                            store_aux_trace=cfg.save_vi_trace,
                            jitter_l=cfg.jitter_l,
                            jitter_eps=cfg.jitter_eps,
                            jitter_low_frac=cfg.jitter_low_frac,
                            max_step=cfg.max_step,
                            da_axis=cfg.da_axis,
                            adapt_forever=cfg.adapt_forever)
        if segment_size is not None:
            if mesh is not None:
                raise ValueError("segment_size (resumable sampling) does not "
                                 "compose with a mesh yet; shard chains via "
                                 "separate per-host runs instead")
            if cfg.save_vi_trace:
                raise ValueError("save_vi_trace is not recorded across "
                                 "resumable segments; drop segment_size")
            from vihmc_tpu.chains import sample_chains_resumable

            res = sample_chains_resumable(
                log_prob, inits, k_sample, hmc_cfg,
                segment_size=segment_size, checkpoint_dir=checkpoint_dir,
                inv_mass=inv_mass, aux=aux0, aux_refresh=refresh,
                progress=progress, grad_fn=grad_fn, thin=sample_thin)
        else:
            res = sample_chains(log_prob, inits, k_sample, hmc_cfg,
                                inv_mass=inv_mass, aux=aux0,
                                aux_refresh=refresh, mesh=mesh,
                                grad_fn=grad_fn)

    out = {"result": res, "spec": spec, "prior": prior}
    if auto_probe is not None:
        out["auto_probe"] = auto_probe
    if gauss_field_used is not None:
        out["gauss_field_used"] = gauss_field_used
        out["gauss_field_probe_acceptance"] = probe_acceptance
    if evaluate and eval_forward is not None and y_eval is not None:
        eval_cfg = cfg
        if sample_thin > 1:
            import dataclasses as _dc

            eval_cfg = _dc.replace(cfg, burn=cfg.burn_ // sample_thin)
        # evaluate against the frozen vector the sampler conditioned on:
        # DRAW = the fixed per-run VI draw (aux0); REFRESH = the final
        # sampled frozen vector (reference my_make_func.py:47-49 evaluates
        # with self.sampled_weights — the last refresh — for the same
        # reason); MEAN = the VI mean (default)
        frozen_base = None
        if cfg.frozen_policy == "draw":
            frozen_base = aux0["frozen"] if isinstance(aux0, dict) else aux0
        elif cfg.frozen_policy == "refresh":
            final_aux = getattr(res.final_state, "aux", None)
            if isinstance(final_aux, dict):  # subsampled variant carries
                final_aux = final_aux.get("frozen")  # {'frozen','tidx'}
            if final_aux is not None:
                # (C, D) under vmap: every chain keeps ITS final frozen
                # vector; evaluate_samples scores each chain's samples
                # against its own base (ADVICE r3)
                frozen_base = jnp.asarray(final_aux)
        evald = evaluate_samples(eval_cfg, spec, prior, eval_forward, y_eval,
                                 res.samples, frozen_base=frozen_base)
        evald["metrics"]["acceptance_rate"] = res.acceptance_rate
        evald["metrics"]["num_divergent"] = res.num_divergent
        out.update(evald)

    if store is not None:
        store.save_config(cfg)
        store.save_array("hmc_params", res.samples)
        if cfg.save_vi_trace and getattr(res, "aux_trace", None) is not None:
            trace = res.aux_trace
            if isinstance(trace, dict):  # subsampled variant: {'frozen','tidx'}
                trace = trace["frozen"]
            # reference artifact name (my_make_func.py:45-50): the frozen VI
            # draw in effect at each iteration, per chain
            store.save_array("vi_params", trace)
        if "metrics" in out:
            store.save_array("sample_mse", out["metrics"]["sample_mse"])
    return out


# ---------------------------------------------------------------------------
# Workload wrappers
# ---------------------------------------------------------------------------

def run_nn(cfg: VIHMCRunConfig, mlp_cfg, artifacts, key=None, data=None,
           mesh=None, store: Optional[RunStore] = None, segment_size=None,
           checkpoint_dir=None, progress=None, sample_thin=1, evaluate=True):
    """NN regression VI-HMC (reference main_VI_HMC.py)."""
    if cfg.coarse_stride or cfg.fn_stride or cfg.grad_dtype == "bfloat16":
        raise ValueError("coarse_stride/fn_stride/grad_dtype apply to the "
                         "operator workload's Gram gradient only")
    key = jax.random.key(0) if key is None else key
    kd, ks = jax.random.split(key)
    if data is None:
        data = regression_data(kd, noise_std=cfg.tau_out ** 0.5
                               if cfg.loss == "NLL" else cfg.tau_out ** -0.5)
    apply_flat, _, _ = make_flat_mlp(mlp_cfg)
    out = run_subspace_hmc(
        cfg,
        full_forward=lambda flat: apply_flat(flat, data["x_train"]),
        y_train=data["y_train"],
        artifacts=artifacts,
        key=ks,
        eval_forward=lambda flat: apply_flat(flat, data["x_val"]),
        y_eval=data["y_val"],
        mesh=mesh,
        store=store,
        segment_size=segment_size,
        checkpoint_dir=checkpoint_dir,
        progress=progress,
        sample_thin=sample_thin,
        evaluate=evaluate,
    )
    out["data"] = data
    out["apply_flat"] = apply_flat
    return out


def run_operator(cfg: VIHMCRunConfig, deeponet_cfg, artifacts, key=None,
                 data=None, mat_path=None, mesh=None,
                 store: Optional[RunStore] = None, use_fused: bool = False,
                 use_gram: Optional[bool] = None, segment_size=None,
                 checkpoint_dir=None, progress=None, sample_thin=1,
                 evaluate=True):
    """Operator VI-HMC on Burgers (reference main_VI_HMC_burgers.py).

    With ``cfg.sample_data`` and ``cfg.p`` below the grid size, a random
    trunk-point subset is redrawn before every draw (the reference subsamples
    inside each log-prob call, main_VI_HMC_burgers.py:131-138; here the index
    set is sampler state so shapes stay static under jit and the likelihood
    is fixed within each trajectory).

    ``use_gram``: Gram-form trajectory gradients — no (B, P) prediction array
    in the leapfrog hot loop (:mod:`vihmc_tpu.ops.gram_merge`); the exact
    density still decides MH acceptance. ``None`` (default) auto-enables when
    eligible: plain HMC, NLL loss, homoscedastic shared-grid merge, no query
    subsampling.
    """
    key = jax.random.key(0) if key is None else key
    kd, ks = jax.random.split(key)
    if data is None:
        train_split, valid_split = get_burgers(kd, 1000, 1000, mat_path)
    else:
        train_split, valid_split = data
    apply_flat, _, _ = make_flat_deeponet(deeponet_cfg)

    n_grid = (train_split["trunk_in"].shape[-2]
              if train_split["trunk_in"].ndim == 3
              else train_split["trunk_in"].shape[0])
    subsample = None
    # per-draw query subsampling assumes a shared (P, 2) grid (the reference
    # notes sample_data is "Always false for cone", VI_HMC/config.py:23)
    if (cfg.sample_data and cfg.p < n_grid
            and train_split["trunk_in"].ndim == 2):
        subsample = {
            "n_points": n_grid,
            "p": cfg.p,
            "forward": lambda flat, tidx: apply_flat(
                flat, train_split["branch_in"], train_split["trunk_in"][tidx]),
            "y_fn": lambda tidx: train_split["solution"][:, tidx],
        }

    # Optional fused Pallas merge+NLL likelihood. Measured in-sampler the
    # composed XLA path is faster at multi-chain reference scale (2187 vs
    # 1549 chain-grads/s — docs/performance.md), so composed is the default;
    # pass use_fused=True to engage the kernel.
    full_ll = None
    if use_fused and cfg.loss == "NLL" and subsample is None:
        from vihmc_tpu.pipelines.common import make_deeponet_nll_log_posterior

        full_ll, _, _ = make_deeponet_nll_log_posterior(
            deeponet_cfg, train_split["branch_in"], train_split["trunk_in"],
            train_split["solution"], tau_var=cfg.tau_out, prior=None)

    # in auto mode the Gram/stride oracle is built ALONGSIDE the Gaussian
    # field, as the probe's fallback trajectory field
    # 'auto' resolves to plain HMC inside run_subspace_hmc unless the burn
    # probe picks otherwise, and the Gram oracle is the documented fallback
    # field for the auto probe — so 'auto' is Gram-eligible too
    gram_eligible = (cfg.algorithm in ("hmc", "auto") and cfg.loss == "NLL"
                     and subsample is None
                     and not deeponet_cfg.noise_neurons
                     and train_split["trunk_in"].ndim == 2
                     and (cfg.gauss_field is None or cfg.gauss_field_auto))
    full_grad = None
    if (cfg.gauss_field is not None and not cfg.gauss_field_auto
            and (cfg.coarse_stride or cfg.fn_stride)):
        raise ValueError("gauss_field replaces the Gram trajectory oracle; "
                         "drop coarse_stride/fn_stride (or set "
                         "gauss_field_auto to probe-and-fall-back)")
    if (use_gram and (cfg.gauss_field is None or cfg.gauss_field_auto)) or \
            (use_gram is None and gram_eligible):
        from vihmc_tpu.ops.gram_merge import (grid_stride_subset,
                                              infer_grid_shape,
                                              make_gram_grad_full)

        subset = None
        if cfg.coarse_stride and cfg.coarse_stride > 1:
            nt_g, nx_g = infer_grid_shape(train_split["trunk_in"])
            subset = grid_stride_subset(nt_g, nx_g, cfg.coarse_stride)
        fn_subset = None
        if cfg.fn_stride and cfg.fn_stride > 1:
            import numpy as _np

            fn_subset = _np.arange(0, train_split["branch_in"].shape[0],
                                   cfg.fn_stride)
        import jax.numpy as _jnp

        full_grad, _, _ = make_gram_grad_full(
            deeponet_cfg, train_split["branch_in"], train_split["trunk_in"],
            train_split["solution"], tau_var=cfg.tau_out,
            query_subset=subset, fn_subset=fn_subset,
            compute_dtype=(_jnp.bfloat16 if cfg.grad_dtype == "bfloat16"
                           else None))
    elif cfg.coarse_stride or cfg.fn_stride:
        raise ValueError("coarse_stride/fn_stride require the Gram "
                         "trajectory-gradient path (plain HMC, NLL, shared "
                         "grid, use_gram)")
    elif cfg.grad_dtype == "bfloat16":
        # explicit 'float32' is the behavioral default and a no-op off the
        # Gram path; only the datapath-changing request is an error
        raise ValueError("grad_dtype='bfloat16' applies to the Gram "
                         "trajectory-gradient path (operator NLL, shared "
                         "grid, use_gram)")

    out = run_subspace_hmc(
        cfg,
        full_forward=lambda flat: apply_flat(flat, train_split["branch_in"],
                                             train_split["trunk_in"]),
        y_train=train_split["solution"],
        artifacts=artifacts,
        key=ks,
        eval_forward=lambda flat: apply_flat(flat, valid_split["branch_in"],
                                             valid_split["trunk_in"]),
        y_eval=valid_split["solution"],
        mesh=mesh,
        store=store,
        subsample=subsample,
        full_ll=full_ll,
        full_grad=full_grad,
        segment_size=segment_size,
        checkpoint_dir=checkpoint_dir,
        progress=progress,
        sample_thin=sample_thin,
        evaluate=evaluate,
    )
    out["data"] = (train_split, valid_split)
    out["apply_flat"] = apply_flat
    return out


# ---------------------------------------------------------------------------
# Re-evaluation modes: reload saved samples, re-score without sampling
# (the reference's test/evaluate flags, SURVEY.md section 4
#  "Re-evaluation modes as regression harness")
# ---------------------------------------------------------------------------

def reevaluate_nn(cfg: VIHMCRunConfig, mlp_cfg, artifacts, store: RunStore,
                  key=None, data=None):
    """Reload ``hmc_params`` from a run store and re-score on validation data
    (reference main_VI_HMC.py ``validate``, :384-447)."""
    key = jax.random.key(0) if key is None else key
    if data is None:
        data = regression_data(key, noise_std=cfg.tau_out ** 0.5
                               if cfg.loss == "NLL" else cfg.tau_out ** -0.5)
    apply_flat, _, _ = make_flat_mlp(mlp_cfg)
    spec = make_spec(artifacts)
    prior = make_subspace_prior(cfg, spec)
    samples = store.load_array("hmc_params")
    return evaluate_samples(cfg, spec, prior,
                            lambda flat: apply_flat(flat, data["x_val"]),
                            data["y_val"], samples)


def reevaluate_operator(cfg: VIHMCRunConfig, deeponet_cfg, artifacts,
                        store: RunStore, key=None, data=None, mat_path=None):
    """Operator twin (reference ``eval_VI_HMC``, main_VI_HMC_burgers.py:304-349)."""
    key = jax.random.key(0) if key is None else key
    if data is None:
        _, valid_split = get_burgers(key, 1000, 1000, mat_path)
    else:
        _, valid_split = data
    apply_flat, _, _ = make_flat_deeponet(deeponet_cfg)
    spec = make_spec(artifacts)
    prior = make_subspace_prior(cfg, spec)
    samples = store.load_array("hmc_params")
    return evaluate_samples(
        cfg, spec, prior,
        lambda flat: apply_flat(flat, valid_split["branch_in"],
                                valid_split["trunk_in"]),
        valid_split["solution"], samples)
