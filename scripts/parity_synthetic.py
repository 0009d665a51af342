"""Stage-by-stage torch-vs-jax parity on the COMMITTED synthetic data.

The north-star quality clause (BASELINE.md) is posterior-predictive parity
with the reference pipeline. The reference's real dataset (OSF
``DeepOnet_data.mat``) is not downloadable in this environment
(`scripts/parity_osf.py` is the ready harness for anyone holding it), so
this script produces the next-best evidence (VERDICT r3 item 7): a
torch-side REFERENCE-EXACT three-stage pipeline — VI (Bayes-by-Backprop)
-> sensitivity -> subspace HMC — run on the same committed synthetic data
as the jax pipeline, compared stage by stage with cross-injected artifacts
so every comparison is like-for-like:

* stage 1 (VI): both frameworks train their own fit at the reference
  config (/root/reference/Neural_network/VI/config.py:16-41 for the NN
  workload; /root/reference/Operator_network/VI/config.py:10-51 for the
  operator) — compared on HELD-OUT quality (valid MSE / NLL), since VI
  fits are not bitwise comparable across frameworks;
* stage 2 (sensitivity): the TORCH fit's (mu, sigma) are injected into the
  jax scorer and scored independently by a torch ``torch.func.jacrev``
  implementation — same inputs, same math, so scores and the selected 90%
  index set must agree to float noise
  (/root/reference/Neural_network/VI/sensitivity.py:71-126);
* stage 3 (HMC): both samplers target the IDENTICAL posterior — the torch
  fit's artifacts, the same sensitive index set, the same fixed frozen
  draw (the reference's effective fixed-draw semantics,
  /root/reference/Neural_network/VI_HMC/my_make_func.py:41-50) — at the
  reference-exact kernel config; posterior-predictive moments are compared
  normalized by the combined Monte-Carlo error (delta / sqrt(se_a^2 +
  se_b^2) <= 2 passes).

Run (CPU-only; the torch side is the reference's substrate):

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/parity_synthetic.py \
        [--workload nn|operator] [--out docs/results/parity_synthetic.json]

The operator mode uses the reference-exact minibatched VI config at a
reduced grid/width (torch-CPU feasibility; recorded in the JSON) — both
frameworks run the SAME reduced config, so the comparison stays
like-for-like.
"""

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


# ---------------------------------------------------------------------------
# torch reference-exact Bayes-by-Backprop VI
# ---------------------------------------------------------------------------


def torch_bbb_modules(torch):
    """Reference-exact BBB linear layer + KL (built from the behavior
    catalogued in SURVEY.md section 2.2:
    /root/reference/Neural_network/VI/layers/BBB/BBBLinear.py:34-78 —
    weight-space reparameterized sample, sigma = softplus(rho), closed-form
    KL against N(prior_mu, prior_sigma) with the reference's argument
    order)."""
    import torch.nn as nn
    import torch.nn.functional as F

    def calculate_kl(mu_q, sig_q, mu_p, sig_p):
        # reference metrics.py:40-42 (note the reference's argument order:
        # q = VI posterior, p = prior)
        return (0.5 * (2 * torch.log(sig_p / sig_q)
                       - 1 + (sig_q / sig_p).pow(2)
                       + ((mu_p - mu_q) / sig_p).pow(2))).sum()

    class BBBLinear(nn.Module):
        def __init__(self, in_f, out_f, priors):
            super().__init__()
            self.W_mu = nn.Parameter(torch.empty(out_f, in_f))
            self.W_rho = nn.Parameter(torch.empty(out_f, in_f))
            self.bias_mu = nn.Parameter(torch.empty(out_f))
            self.bias_rho = nn.Parameter(torch.empty(out_f))
            self.priors = priors
            self.W_mu.data.normal_(*priors["posterior_mu_initial"])
            self.W_rho.data.normal_(*priors["posterior_rho_initial"])
            self.bias_mu.data.normal_(*priors["posterior_mu_initial"])
            self.bias_rho.data.normal_(*priors["posterior_rho_initial"])

        def forward(self, x, sample=True):
            W_sigma = torch.log1p(torch.exp(self.W_rho))
            b_sigma = torch.log1p(torch.exp(self.bias_rho))
            if self.training or sample:
                W = self.W_mu + W_sigma * torch.randn_like(W_sigma)
                b = self.bias_mu + b_sigma * torch.randn_like(b_sigma)
            else:
                W, b = self.W_mu, self.bias_mu
            return F.linear(x, W, b)

        def kl_loss(self):
            W_sigma = torch.log1p(torch.exp(self.W_rho))
            b_sigma = torch.log1p(torch.exp(self.bias_rho))
            pm, ps = self.priors["prior_mu"], self.priors["prior_sigma"]
            pm = torch.tensor(float(pm))
            ps = torch.tensor(float(ps))
            return (calculate_kl(self.W_mu, W_sigma, pm, ps)
                    + calculate_kl(self.bias_mu, b_sigma, pm, ps))

    return BBBLinear, calculate_kl


def torch_nn_vi_train(torch, x_tr, y_tr, x_va, y_va, widths=(10, 10),
                      epochs=10_000, lr=1e-2, num_ens=10, noise=5e-2,
                      patience=100, seed=0):
    """Reference-exact NN VI run (main_regression_VI.py:279-346): Adam +
    ReduceLROnPlateau(min_lr=1e-5), num_ens averaged full-batch ELBO
    (gaussian_nll sum + beta*kl, beta=1.0), tanh MLP of BBB linears."""
    import torch.nn.functional as F

    torch.manual_seed(seed)
    BBBLinear, _ = torch_bbb_modules(torch)
    priors = {"prior_mu": 0.0, "prior_sigma": 1.0,
              "posterior_mu_initial": (0.0, 0.1),
              "posterior_rho_initial": (-3.0, 0.1)}
    dims = [1] + list(widths) + [1]
    layers = [BBBLinear(dims[i], dims[i + 1], priors)
              for i in range(len(dims) - 1)]
    params = [p for l in layers for p in l.parameters()]

    def forward(x):
        h = x
        for i, l in enumerate(layers):
            h = l(h)
            if i < len(layers) - 1:
                h = torch.tanh(h)
        return h

    def kl_total():
        return sum(l.kl_loss() for l in layers)

    opt = torch.optim.Adam(params, lr=lr)
    sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, patience=patience, min_lr=1e-5)
    noise_var = noise ** 2
    best = {"valid": float("inf"), "state": None, "epoch": -1}
    for ep in range(epochs):
        opt.zero_grad()
        loss = 0.0
        for _ in range(num_ens):
            pred = forward(x_tr)
            nll = F.gaussian_nll_loss(pred, y_tr,
                                      noise_var * torch.ones_like(pred),
                                      reduction="sum")
            loss = loss + nll + 1.0 * kl_total()
        loss = loss / num_ens
        loss.backward()
        opt.step()
        with torch.no_grad():
            pv = forward(x_va)
            vloss = float(F.gaussian_nll_loss(
                pv, y_va, noise_var * torch.ones_like(pv), reduction="sum")
                + kl_total())
        sched.step(vloss)
        if vloss < best["valid"]:
            best.update(valid=vloss, epoch=ep,
                        state=[p.detach().clone() for p in params])
    # restore best
    with torch.no_grad():
        for p, b in zip(params, best["state"]):
            p.copy_(b)
    with torch.no_grad():
        for l in layers:
            l.training = False
        mse = float(((forward_eval(layers, x_va, torch) - y_va) ** 2).mean())
    # flat (mu, sigma) in the jax ravel order: per layer bias then row-major
    # weight (core/ravel.py; verified by tests/test_parity_torch.py)
    mus, sigs = [], []
    for l in layers:
        mus += [l.bias_mu.detach().numpy().ravel(),
                l.W_mu.detach().numpy().ravel()]
        sigs += [np.log1p(np.exp(l.bias_rho.detach().numpy())).ravel(),
                 np.log1p(np.exp(l.W_rho.detach().numpy())).ravel()]
    return {"mu": np.concatenate(mus).astype(np.float32),
            "sigma": np.concatenate(sigs).astype(np.float32),
            "best_valid": best["valid"], "best_epoch": best["epoch"],
            "valid_mse": mse}


def forward_eval(layers, x, torch):
    h = x
    for i, l in enumerate(layers):
        h = l(h, sample=False)
        l.training = False
        if i < len(layers) - 1:
            h = torch.tanh(h)
    return h


def torch_flat_mlp_forward(torch, widths=(10, 10)):
    """Flat-vector tanh-MLP forward in the jax ravel order (bias, then
    row-major weight per layer)."""
    dims_io = [1] + list(widths) + [1]
    dims = list(zip(dims_io[:-1], dims_io[1:]))

    def forward(flat, x):
        i = 0
        h = x
        for li, (d_in, d_out) in enumerate(dims):
            b = flat[i:i + d_out]; i += d_out
            w = flat[i:i + d_in * d_out].view(d_out, d_in); i += d_in * d_out
            h = torch.nn.functional.linear(h, w, b)
            if li < len(dims) - 1:
                h = torch.tanh(h)
        return h

    return forward


def torch_sensitivity_scores(torch, forward, mu, sigma, x):
    """Reference eval_jac/eval_std_dydw (Neural_network/VI/sensitivity.py:
    71-126): mean over (batch, output) of the squared Jacobian w.r.t. the
    flat vector at the VI mean, times sigma^2."""
    from torch.func import jacrev

    mu_t = torch.tensor(mu)
    jac = jacrev(lambda p: forward(p, torch.tensor(np.asarray(x))))(mu_t)
    j2 = (jac.reshape(-1, mu_t.shape[0]) ** 2).mean(0).detach().numpy()
    return j2 * np.asarray(sigma) ** 2


def torch_subspace_hmc(torch, forward, mu, sigma, idx, frozen, x, y,
                       step, L, n_draws, n_chains, tau_out, seed=0):
    """Reference-exact subspace HMC (main_VI_HMC.py:337-381): plain HMC,
    L leapfrog steps, VI-posterior prior over the subspace, NLL likelihood,
    fixed frozen vector, sequential chains. Returns (chains, draws, d)."""
    torch.manual_seed(seed)
    mu_t = torch.tensor(mu)
    sigma_t = torch.tensor(sigma)
    idx_t = torch.tensor(np.asarray(idx), dtype=torch.long)
    frozen_t = torch.tensor(frozen)
    x_t = torch.tensor(np.asarray(x))
    y_t = torch.tensor(np.asarray(y))
    nll = torch.nn.GaussianNLLLoss(reduction="sum")

    def log_prob(q):
        if not torch.isfinite(q).all():
            return (torch.nan_to_num(q) * 0.0).sum() + float("-inf")
        full = frozen_t.clone()
        full[idx_t] = q
        pred = forward(full, x_t)
        ll = -nll(pred, y_t, tau_out * torch.ones_like(pred))
        pr = torch.distributions.Normal(
            mu_t[idx_t], sigma_t[idx_t]).log_prob(q).sum()
        return ll + pr

    def grad_lp(q):
        q = q.detach().requires_grad_(True)
        lp = log_prob(q)
        (g,) = torch.autograd.grad(lp, q)
        return lp.detach(), torch.nan_to_num(g)

    chains = []
    for c in range(n_chains):
        q = mu_t[idx_t].clone()
        draws = []
        for _ in range(n_draws):
            lp0, g = grad_lp(q)
            p = torch.randn_like(q)
            qn, pn, gn = q.clone(), p.clone(), g.clone()
            lp1 = lp0
            for _ in range(L):
                pn = pn + 0.5 * step * gn
                qn = qn + step * pn
                lp1, gn = grad_lp(qn)
                pn = pn + 0.5 * step * gn
            delta = (lp1 - 0.5 * (pn * pn).sum()) - (lp0 - 0.5 * (p * p).sum())
            if torch.isfinite(delta) and torch.log(torch.rand(())) < delta:
                q = qn
            draws.append(q.clone().numpy())
        chains.append(np.stack(draws))
    return np.stack(chains)


# ---------------------------------------------------------------------------
# comparison machinery
# ---------------------------------------------------------------------------


def predictive_moments_np(forward_np, draws_full):
    """(mean, std, per-draw preds) of forward over (S, D) full vectors."""
    preds = np.stack([forward_np(d) for d in draws_full])
    return preds.mean(0), preds.std(0), preds


def moment_parity(pred_a, pred_b, ess_a, ess_b, sd_a, sd_b):
    """MC-error-normalized predictive-mean deltas: |mean_a - mean_b| /
    sqrt(sd_a^2/ess_a + sd_b^2/ess_b), elementwise over the eval grid."""
    se = np.sqrt(sd_a ** 2 / max(ess_a, 1.0) + sd_b ** 2 / max(ess_b, 1.0))
    z = np.abs(pred_a - pred_b) / np.maximum(se, 1e-12)
    return {"z_median": float(np.median(z)), "z_p95": float(np.quantile(z, 0.95)),
            "z_max": float(np.max(z))}


def run_nn_parity(out_path, vi_epochs):
    import torch

    import jax
    import jax.numpy as jnp

    from vihmc_tpu.chains import effective_sample_size_np, sample_chains
    from vihmc_tpu.data.synthetic import regression_data
    from vihmc_tpu.dists.likelihoods import get_likelihood
    from vihmc_tpu.dists.priors import DiagonalGaussianPrior
    from vihmc_tpu.hmc import (HMCConfig, FrozenPolicy, SubspaceSpec,
                               make_subspace_log_prob)
    from vihmc_tpu.models import MLPConfig
    from vihmc_tpu.pipelines import sensitivity as sens_pipe
    from vihmc_tpu.pipelines import vi_train
    from vihmc_tpu.pipelines import configs as C
    from vihmc_tpu.pipelines.common import make_flat_mlp
    from vihmc_tpu.sensitivity.scores import (select_sensitive_indices,
                                              sensitivity_scores)
    from vihmc_tpu.vi import VIConfig
    from vihmc_tpu.vi.elbo import ELBOConfig

    report = {"workload": "nn", "data": "committed synthetic 4sin4x+5cos12x "
              "(data/synthetic.py, key 0, 20 train / 300 val)"}

    # ---- shared data (the committed synthetic task, both frameworks) ----
    data = regression_data(jax.random.key(0), 20, 300, noise_std=5e-2)
    x_tr = np.asarray(data["x_train"]); y_tr = np.asarray(data["y_train"])
    x_va = np.asarray(data["x_val"]); y_va = np.asarray(data["y_val"])
    xt = {k: torch.tensor(v) for k, v in
          (("x_tr", x_tr), ("y_tr", y_tr), ("x_va", x_va), ("y_va", y_va))}

    # ---- stage 1: VI, reference config both sides ----
    t0 = time.time()
    tfit = torch_nn_vi_train(torch, xt["x_tr"], xt["y_tr"], xt["x_va"],
                             xt["y_va"], epochs=vi_epochs)
    t_torch_vi = time.time() - t0
    mlp = MLPConfig()
    nn_cfg = C.NNVIRunConfig(model=mlp, vi=VIConfig(
        epochs=vi_epochs, lr_start=1e-2, patience=100, num_ens=10,
        beta_type=1.0, prior_mu=0.0, prior_sigma=1.0,
        elbo=ELBOConfig(reduction="sum", fixed_noise_var=5e-2 ** 2)))
    t0 = time.time()
    jout = vi_train.run_nn(nn_cfg, key=jax.random.key(0), data=data)
    t_jax_vi = time.time() - t0
    jax_valid_mse = float(np.min(np.asarray(jout["metrics"])[:, 3]))
    report["stage1_vi"] = {
        "config": "reference-exact Neural_network/VI/config.py (epochs "
                  f"{vi_epochs}, lr 1e-2, num_ens 10, beta 1.0, plateau "
                  "patience 100/min_lr 1e-5)",
        "torch_valid_mse": round(tfit["valid_mse"], 4),
        "jax_valid_mse": round(jax_valid_mse, 4),
        "torch_wall_s": round(t_torch_vi, 1),
        "jax_wall_s": round(t_jax_vi, 1),
        "note": "independent fits (framework RNGs differ); compared on "
                "held-out quality",
    }

    # ---- stage 2: sensitivity on the SAME (torch) fit, both scorers ----
    apply_flat, _, _ = make_flat_mlp(mlp)

    def apply_one(flat, x):
        return apply_flat(flat, x[None, :])[0]

    jax_scores = np.asarray(sensitivity_scores(
        apply_one, jnp.asarray(tfit["mu"]), jnp.asarray(tfit["sigma"]),
        jnp.asarray(x_va)))
    tforward = torch_flat_mlp_forward(torch)
    torch_scores = torch_sensitivity_scores(torch, tforward, tfit["mu"],
                                            tfit["sigma"], x_va)
    idx_jax = select_sensitive_indices(jax_scores, 0.90)
    idx_torch = select_sensitive_indices(torch_scores, 0.90)
    rel = np.abs(jax_scores - torch_scores) / (np.abs(torch_scores) + 1e-12)
    report["stage2_sensitivity"] = {
        "config": "90% captured variance on the torch fit's (mu, sigma), "
                  "Jacobians at the VI mean over the 300-pt val grid",
        "score_rel_err_median": float(np.median(rel)),
        "score_rel_err_max": float(np.max(rel)),
        "n_selected_jax": int(len(idx_jax)),
        "n_selected_torch": int(len(idx_torch)),
        "index_set_identical": bool(np.array_equal(idx_jax, idx_torch)),
        "index_overlap": float(len(np.intersect1d(idx_jax, idx_torch))
                               / max(len(idx_jax), 1)),
    }

    # ---- stage 3: subspace HMC on the IDENTICAL posterior ----
    # reference config: Neural_network/VI_HMC/config.py — step 5e-4,
    # L = int(pi*0.2501^2/(2*5e-4)) = 196, 100 draws x 10 chains, burn 20,
    # NLL tau_out 5e-2^2, VI prior (load_prior+load_std), fixed frozen draw
    step, L, n_draws, n_chains, burn = 5e-4, 196, 100, 10, 20
    tau_out = 5e-2 ** 2
    idx = idx_torch
    rng = np.random.default_rng(1)
    frozen = (tfit["mu"] + tfit["sigma"]
              * rng.standard_normal(tfit["mu"].shape[0]).astype(np.float32))

    t0 = time.time()
    tchains = torch_subspace_hmc(torch, tforward, tfit["mu"], tfit["sigma"],
                                 idx, frozen, x_tr, y_tr, step, L, n_draws,
                                 n_chains, tau_out)
    t_torch_hmc = time.time() - t0

    spec = SubspaceSpec(idx=tuple(int(i) for i in idx),
                        mu=jnp.asarray(tfit["mu"]),
                        sigma=jnp.asarray(tfit["sigma"]))
    like = get_likelihood("NLL")
    x_j, y_j = jnp.asarray(x_tr), jnp.asarray(y_tr)

    def full_ll(flat):
        return like(apply_flat(flat, x_j), y_j, tau_out)

    frozen_j = jnp.asarray(frozen)
    lp_like, _, _ = make_subspace_log_prob(full_ll, spec, FrozenPolicy.MEAN)
    prior = DiagonalGaussianPrior(loc=spec.sub_mu(), scale=spec.sub_sigma())

    def log_prob(q, aux):
        return lp_like(q, frozen_j) + prior.log_prob(q)

    cfg = HMCConfig(num_samples=n_draws, num_leapfrog=L, step_size=step,
                    burn=0, sampler="hmc", store_burn=True)
    inits = jnp.tile(spec.sub_mu()[None, :], (n_chains, 1))
    t0 = time.time()
    jres = sample_chains(log_prob, inits, jax.random.key(2), cfg,
                         aux=frozen_j)
    jchains = np.asarray(jres.samples)
    t_jax_hmc = time.time() - t0

    # posterior-predictive moments on the val grid, both samplers
    def fwd_np(full):
        return np.asarray(apply_flat(jnp.asarray(full, jnp.float32),
                                     jnp.asarray(x_va))).ravel()

    def scatter_full(sub_draws):
        full = np.tile(frozen[None, :], (sub_draws.shape[0], 1))
        full[:, np.asarray(idx)] = sub_draws
        return full

    t_post = tchains[:, burn:, :].reshape(-1, len(idx))
    j_post = jchains[:, burn:, :].reshape(-1, len(idx))
    t_mean, t_sd, _ = predictive_moments_np(fwd_np, scatter_full(t_post))
    j_mean, j_sd, _ = predictive_moments_np(fwd_np, scatter_full(j_post))
    ess_t = float(np.median(effective_sample_size_np(tchains[:, burn:, :])))
    ess_j = float(np.median(effective_sample_size_np(jchains[:, burn:, :])))
    parity = moment_parity(j_mean, t_mean, ess_j, ess_t, j_sd, t_sd)
    acc_t = float(np.mean([
        (np.abs(np.diff(tchains[c, :, 0])) > 0).mean()
        for c in range(n_chains)]))

    report["stage3_hmc"] = {
        "config": f"reference-exact NN VI-HMC: step {step}, L {L}, "
                  f"{n_chains} chains x {n_draws} draws, burn {burn}, NLL "
                  f"tau_out {tau_out}, VI prior, one shared frozen draw",
        "torch_wall_s": round(t_torch_hmc, 1),
        "jax_wall_s": round(t_jax_hmc, 1),
        "torch_acceptance_proxy": round(acc_t, 3),
        "jax_acceptance": round(float(jres.acceptance_rate), 3),
        "torch_ess_median": round(ess_t, 1),
        "jax_ess_median": round(ess_j, 1),
        "torch_expected_mse": round(float(((t_mean - y_va.ravel()) ** 2).mean()), 4),
        "jax_expected_mse": round(float(((j_mean - y_va.ravel()) ** 2).mean()), 4),
        "pred_mean_parity_z": parity,
        "pred_sd_ratio_median": round(float(np.median(
            j_sd / np.maximum(t_sd, 1e-12))), 3),
        "pass_2sigma": bool(parity["z_median"] <= 2.0),
    }
    report["verdict"] = (
        "PASS" if (parity["z_median"] <= 2.0
                   and report["stage2_sensitivity"]["index_overlap"] >= 0.95)
        else "CHECK")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"workload": "nn", "verdict": report["verdict"],
                      "z_median": parity["z_median"],
                      "index_overlap":
                          report["stage2_sensitivity"]["index_overlap"],
                      "out": out_path}))


# ---------------------------------------------------------------------------
# operator workload (reduced scale, identical configs both frameworks)
# ---------------------------------------------------------------------------


def torch_deeponet_modules(torch, cfg):
    """Reference-exact Bayesian DeepONet pieces in torch (behavior from
    /root/reference/Operator_network/VI/bayesian_model.py:33-114 via
    SURVEY.md): BBB branch/trunk stacks, Bayesian scalar merge bias, BC
    lambda-embedding, dot-product merge."""
    import torch.nn.functional as F

    BBBLinear, calculate_kl = torch_bbb_modules(torch)
    priors = {"prior_mu": 0.0, "prior_sigma": 0.1,
              "posterior_mu_initial": (0.0, 0.1),
              "posterior_rho_initial": (-5.0, 0.1)}

    def stack(dims):
        return [BBBLinear(i, o, priors) for i, o in dims]

    branch = stack(cfg.branch_dims)
    trunk = stack(cfg.trunk_dims)
    b_mu = torch.nn.Parameter(torch.zeros(()))
    b_rho = torch.nn.Parameter(torch.full((), -5.0))

    def bc_embed(xy):
        keep = xy[..., 0:1]
        x = xy[..., 1]
        tp = 2 * math.pi
        feats = torch.stack([torch.sin(tp * x), torch.sin(2 * tp * x),
                             torch.cos(tp * x), torch.cos(2 * tp * x)], -1)
        return torch.cat([keep, feats], -1)

    def forward(bx, tx, sample=True):
        h = bx
        for i, l in enumerate(branch):
            h = l(h, sample=sample)
            if i < len(branch) - 1:
                h = torch.tanh(h)
        bout = h
        h = bc_embed(tx)
        for i, l in enumerate(trunk):
            h = l(h, sample=sample)
            if i < len(trunk) - 1:
                h = torch.tanh(h)
        tout = h
        b_sig = torch.log1p(torch.exp(b_rho))
        b = (b_mu + b_sig * torch.randn(()) if sample else b_mu)
        return bout @ tout.T + b

    def kl_total():
        pm = torch.tensor(0.0); ps = torch.tensor(0.1)
        b_sig = torch.log1p(torch.exp(b_rho))
        kl = calculate_kl(b_mu, b_sig, pm, ps)
        return kl + sum(l.kl_loss() for l in branch + trunk)

    params = ([b_mu, b_rho]
              + [p for l in branch + trunk for p in l.parameters()])
    return branch, trunk, (b_mu, b_rho), forward, kl_total, params


def torch_deeponet_flat(torch, cfg, branch, trunk, b_pair):
    """Flat (mu, sigma) in the jax ravel order for models.deeponet params:
    {'b': scalar, 'branch': [{'b','w'}...], 'trunk': [...]} — dict keys
    sorted => scalar b first, then per layer bias before row-major weight.
    Verified against make_flat_deeponet by the caller's forward check."""
    mus = [np.asarray([float(b_pair[0].detach())], np.float32)]
    sigs = [np.asarray([float(np.log1p(np.exp(b_pair[1].detach())))],
                       np.float32)]
    for stack_l in (branch, trunk):
        for l in stack_l:
            mus += [l.bias_mu.detach().numpy().ravel(),
                    l.W_mu.detach().numpy().ravel()]
            sigs += [np.log1p(np.exp(l.bias_rho.detach().numpy())).ravel(),
                     np.log1p(np.exp(l.W_rho.detach().numpy())).ravel()]
    return (np.concatenate(mus).astype(np.float32),
            np.concatenate(sigs).astype(np.float32))


def torch_flat_deeponet_forward(torch, cfg):
    """Flat-vector deterministic DeepONet forward matching the jax ravel
    order above (and bench.py's validated unpack)."""

    def forward(flat, bx, tx):
        i = 1
        b_scalar = flat[0]

        def run_stack(h, dims, i, embed=False):
            if embed:
                keep = h[..., 0:1]
                x = h[..., 1]
                tp = 2 * math.pi
                feats = torch.stack([torch.sin(tp * x), torch.sin(2 * tp * x),
                                     torch.cos(tp * x),
                                     torch.cos(2 * tp * x)], -1)
                h = torch.cat([keep, feats], -1)
            for li, (d_in, d_out) in enumerate(dims):
                b = flat[i:i + d_out]; i += d_out
                w = flat[i:i + d_in * d_out].view(d_out, d_in)
                i += d_in * d_out
                h = torch.nn.functional.linear(h, w, b)
                if li < len(dims) - 1:
                    h = torch.tanh(h)
            return h, i

        bout, i = run_stack(bx, cfg.branch_dims, i)
        tout, i = run_stack(tx, cfg.trunk_dims, i, embed=True)
        return bout @ tout.T + b_scalar

    return forward


def run_operator_parity(out_path, vi_epochs):
    import torch

    import jax
    import jax.numpy as jnp

    from vihmc_tpu.chains import effective_sample_size_np, sample_chains
    from vihmc_tpu.data.burgers import get_burgers
    from vihmc_tpu.dists.likelihoods import get_likelihood
    from vihmc_tpu.dists.priors import IsotropicGaussianPrior
    from vihmc_tpu.hmc import (HMCConfig, FrozenPolicy, SubspaceSpec,
                               make_subspace_log_prob)
    from vihmc_tpu.models import DeepONetConfig
    from vihmc_tpu.pipelines import configs as C
    from vihmc_tpu.pipelines import vi_train
    from vihmc_tpu.pipelines.common import make_flat_deeponet
    from vihmc_tpu.sensitivity.scores import (select_sensitive_indices,
                                              sensitivity_scores)
    from vihmc_tpu.vi import VIConfig
    from vihmc_tpu.vi.elbo import ELBOConfig

    import torch.nn.functional as F

    # reduced-but-identical config: 33x33 Burgers grid, 100 train fns,
    # width 24 / depth 3 DeepONet (torch-CPU feasibility; same config both
    # frameworks so every comparison stays like-for-like)
    nx = nt = 33
    n_train = 100
    cfg = DeepONetConfig(in_branch=nx, in_trunk=5, width_branch=24,
                         width_trunk=24, depth_branch=3, depth_trunk=3)
    report = {"workload": "operator",
              "scale_note": f"reduced scale ({nx}x{nt} generated Burgers "
                            f"grid, {n_train} fns, width 24 depth 3): "
                            "torch-CPU feasibility; BOTH frameworks run "
                            "this exact config, so all comparisons are "
                            "like-for-like. Reference-exact hyperparams "
                            "otherwise (Operator_network/VI/config.py:"
                            "10-51, VI_HMC/config.py:28-51)"}

    train, valid = get_burgers(jax.random.key(7), n_train, n_train,
                               nx=nx, nt=nt)
    bx = np.asarray(train["branch_in"]); tx = np.asarray(train["trunk_in"])
    yy = np.asarray(train["solution"])
    bx_v = np.asarray(valid["branch_in"]); yy_v = np.asarray(valid["solution"])
    bx_t = torch.tensor(bx); tx_t = torch.tensor(tx); yy_t = torch.tensor(yy)

    # ---- stage 1: VI (reference operator config: lr 1e-3, num_ens 5,
    # batch 128, fixed noise var 1.0, beta 1.0) ----
    torch.manual_seed(0)
    branch, trunk, b_pair, fwd_bbb, kl_total, params =         torch_deeponet_modules(torch, cfg)
    opt = torch.optim.Adam(params, lr=1e-3)
    sched = torch.optim.lr_scheduler.ReduceLROnPlateau(opt, patience=500,
                                                       min_lr=1e-5)
    n_obs = bx.shape[0] * tx.shape[0]
    t0 = time.time()
    best = {"valid": float("inf")}
    perm = np.random.default_rng(0)
    for ep in range(vi_epochs):
        order = perm.permutation(n_train)
        for s0 in range(0, n_train, 128):
            sel = torch.tensor(order[s0:s0 + 128], dtype=torch.long)
            opt.zero_grad()
            loss = 0.0
            for _ in range(5):
                pred = fwd_bbb(bx_t[sel], tx_t)
                nll = F.gaussian_nll_loss(pred, yy_t[sel],
                                          torch.ones_like(pred),
                                          reduction="mean") * n_obs
                loss = loss + nll + 1.0 * kl_total()
            (loss / 5).backward()
            opt.step()
        with torch.no_grad():
            pv = fwd_bbb(bx_t, tx_t, sample=False)
            vmse = float(((pv - yy_t) ** 2).mean())
        sched.step(vmse)
        if vmse < best["valid"]:
            best = {"valid": vmse, "epoch": ep,
                    "state": [q.detach().clone() for q in params]}
    with torch.no_grad():
        for q, b in zip(params, best["state"]):
            q.copy_(b)
    t_torch_vi = time.time() - t0
    tmu, tsigma = torch_deeponet_flat(torch, cfg, branch, trunk, b_pair)

    # jax side: same config + the SAME generated splits through the
    # operator VI pipeline
    op_cfg = C.OperatorVIRunConfig(
        model=cfg, n_train=n_train, n_valid=n_train, p=tx.shape[0],
        posterior_rho_initial=(-5.0, 0.1),
        vi=VIConfig(epochs=vi_epochs, lr_start=1e-3, patience=500,
                    num_ens=5, beta_type=1.0, prior_mu=0.0, prior_sigma=0.1,
                    elbo=ELBOConfig(reduction="mean_x_n",
                                    fixed_noise_var=1.0)))
    t0 = time.time()
    jout = vi_train.run_operator(op_cfg, key=jax.random.key(1),
                                 data=(train, valid))
    t_jax_vi = time.time() - t0
    jmse = float(np.min(np.asarray(jout["metrics"])[:, 3]))
    report["stage1_vi"] = {
        "torch_valid_mse": round(best["valid"], 4),
        "jax_valid_mse": round(jmse, 4),
        "torch_wall_s": round(t_torch_vi, 1),
        "jax_wall_s": round(t_jax_vi, 1),
        "epochs": vi_epochs,
        "note": "independent fits; held-out quality comparison",
    }

    # ---- stage 2: sensitivity, torch fit scored by both frameworks ----
    apply_flat, _, _ = make_flat_deeponet(cfg)
    tfwd = torch_flat_deeponet_forward(torch, cfg)
    # flat-order sanity: torch forward at the torch mu == jax forward
    want = np.asarray(apply_flat(jnp.asarray(tmu), jnp.asarray(bx[:4]),
                                 jnp.asarray(tx)))
    got = tfwd(torch.tensor(tmu), bx_t[:4], tx_t).detach().numpy()
    assert np.allclose(want, got, rtol=1e-3, atol=1e-3), "flat-order drift"

    p_sub = 100
    rngs = np.random.default_rng(3)
    tidx = np.sort(rngs.choice(tx.shape[0], p_sub, replace=False))

    def apply_one(flat, x):
        return apply_flat(flat, x[None, :], jnp.asarray(tx[tidx]))[0]

    jax_scores = np.asarray(sensitivity_scores(
        apply_one, jnp.asarray(tmu), jnp.asarray(tsigma), jnp.asarray(bx),
        chunk_size=8))
    from torch.func import jacrev

    def one_ex(flat, xb):
        return tfwd(flat, xb[None], torch.tensor(tx[tidx]))[0]

    mu_t = torch.tensor(tmu)
    j2 = np.zeros(tmu.shape[0])
    for i in range(n_train):
        jac = jacrev(lambda p: one_ex(p, bx_t[i]))(mu_t)
        j2 += (jac.reshape(-1, tmu.shape[0]) ** 2).mean(0).numpy()
    torch_scores = (j2 / n_train) * tsigma ** 2
    idx_jax = select_sensitive_indices(jax_scores, 0.90)
    idx_torch = select_sensitive_indices(torch_scores, 0.90)
    rel = np.abs(jax_scores - torch_scores) / (np.abs(torch_scores) + 1e-12)
    report["stage2_sensitivity"] = {
        "score_rel_err_median": float(np.median(rel)),
        "n_selected_jax": int(len(idx_jax)),
        "n_selected_torch": int(len(idx_torch)),
        "index_overlap": float(len(np.intersect1d(idx_jax, idx_torch))
                               / max(len(idx_jax), 1)),
    }

    # ---- stage 3: HMC on the identical posterior (reference operator
    # VI-HMC config: step 1e-4, L=int(pi*0.0214^2/2e-4)=7, 1000 draws,
    # burn 100, NLL tau 1.0, prior N(0, 0.1), fixed frozen draw) ----
    step, L, n_draws, n_chains, burn = 1e-4, 7, 1000, 2, 100
    idx = idx_torch
    frozen = (tmu + tsigma * np.random.default_rng(11)
              .standard_normal(tmu.shape[0]).astype(np.float32))
    t0 = time.time()
    # torch chain via the shared flat forward
    torch.manual_seed(5)
    mu_tt = torch.tensor(tmu); idx_t = torch.tensor(idx, dtype=torch.long)
    frozen_t = torch.tensor(frozen)
    nll_l = torch.nn.GaussianNLLLoss(reduction="sum")

    def t_log_prob(q):
        if not torch.isfinite(q).all():
            return (torch.nan_to_num(q) * 0.0).sum() + float("-inf")
        full = frozen_t.clone()
        full[idx_t] = q
        pred = tfwd(full, bx_t, tx_t)
        ll = -nll_l(pred, yy_t, torch.ones_like(pred))
        pr = torch.distributions.Normal(0.0, 0.1).log_prob(q).sum()
        return ll + pr

    def t_grad(q):
        q = q.detach().requires_grad_(True)
        lp = t_log_prob(q)
        (g,) = torch.autograd.grad(lp, q)
        return lp.detach(), torch.nan_to_num(g)

    tchains = []
    for c in range(n_chains):
        q = mu_tt[idx_t].clone()
        draws = []
        for _ in range(n_draws):
            lp0, g = t_grad(q)
            p = torch.randn_like(q)
            qn, pn, gn = q.clone(), p.clone(), g.clone()
            lp1 = lp0
            for _ in range(L):
                pn = pn + 0.5 * step * gn
                qn = qn + step * pn
                lp1, gn = t_grad(qn)
                pn = pn + 0.5 * step * gn
            delta = (lp1 - 0.5 * (pn * pn).sum()) -                 (lp0 - 0.5 * (p * p).sum())
            if torch.isfinite(delta) and torch.log(torch.rand(())) < delta:
                q = qn
            draws.append(q.clone().numpy())
        tchains.append(np.stack(draws))
    tchains = np.stack(tchains)
    t_torch_hmc = time.time() - t0

    spec = SubspaceSpec(idx=tuple(int(i) for i in idx),
                        mu=jnp.asarray(tmu), sigma=jnp.asarray(tsigma))
    like = get_likelihood("NLL")
    bx_j, tx_j, yy_j = jnp.asarray(bx), jnp.asarray(tx), jnp.asarray(yy)

    def full_ll(flat):
        return like(apply_flat(flat, bx_j, tx_j), yy_j, 1.0)

    frozen_j = jnp.asarray(frozen)
    lp_like, _, _ = make_subspace_log_prob(full_ll, spec, FrozenPolicy.MEAN)
    prior = IsotropicGaussianPrior(scale=0.1)

    def log_prob(q, aux):
        return lp_like(q, frozen_j) + prior.log_prob(q)

    hcfg = HMCConfig(num_samples=n_draws, num_leapfrog=L, step_size=step,
                     burn=0, sampler="hmc")
    inits = jnp.tile(spec.sub_mu()[None, :], (n_chains, 1))
    t0 = time.time()
    jres = sample_chains(log_prob, inits, jax.random.key(9), hcfg,
                         aux=frozen_j)
    jchains = np.asarray(jres.samples)
    t_jax_hmc = time.time() - t0

    def fwd_np(full):
        return np.asarray(apply_flat(jnp.asarray(full, jnp.float32),
                                     jnp.asarray(bx_v[:32]),
                                     tx_j)).ravel()

    def scatter_full(sub):
        full = np.tile(frozen[None, :], (sub.shape[0], 1))
        full[:, np.asarray(idx)] = sub
        return full

    stride = max(1, (n_draws - burn) * n_chains // 256)
    t_post = tchains[:, burn:, :].reshape(-1, len(idx))[::stride]
    j_post = jchains[:, burn:, :].reshape(-1, len(idx))[::stride]
    t_mean, t_sd, _ = predictive_moments_np(fwd_np, scatter_full(t_post))
    j_mean, j_sd, _ = predictive_moments_np(fwd_np, scatter_full(j_post))
    ess_t = float(np.median(effective_sample_size_np(tchains[:, burn:, :])))
    ess_j = float(np.median(effective_sample_size_np(jchains[:, burn:, :])))
    parity = moment_parity(j_mean, t_mean, ess_j, ess_t, j_sd, t_sd)
    report["stage3_hmc"] = {
        "config": f"reference-exact operator VI-HMC: step {step}, L {L}, "
                  f"{n_chains} chains x {n_draws} draws, burn {burn}, NLL "
                  "tau_out 1.0, prior N(0, 0.1), one shared frozen draw",
        "torch_wall_s": round(t_torch_hmc, 1),
        "jax_wall_s": round(t_jax_hmc, 1),
        "jax_acceptance": round(float(jres.acceptance_rate), 3),
        "torch_ess_median": round(ess_t, 1),
        "jax_ess_median": round(ess_j, 1),
        "pred_mean_parity_z": parity,
        "pred_sd_ratio_median": round(float(np.median(
            j_sd / np.maximum(t_sd, 1e-12))), 3),
        "pass_2sigma": bool(parity["z_median"] <= 2.0),
    }
    report["verdict"] = (
        "PASS" if (parity["z_median"] <= 2.0
                   and report["stage2_sensitivity"]["index_overlap"] >= 0.95)
        else "CHECK")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"workload": "operator", "verdict": report["verdict"],
                      "z_median": parity["z_median"],
                      "index_overlap":
                          report["stage2_sensitivity"]["index_overlap"],
                      "out": out_path}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workload", default="nn", choices=["nn", "operator"])
    ap.add_argument("--vi-epochs", type=int, default=10_000,
                    help="reference-exact 10k for nn "
                         "(Neural_network/VI/config.py); ~300 suggested "
                         "for the reduced operator")
    ap.add_argument("--out", default="docs/results/parity_synthetic.json")
    args = ap.parse_args()
    if args.workload == "nn":
        run_nn_parity(args.out, args.vi_epochs)
    else:
        run_operator_parity(args.out, args.vi_epochs)


if __name__ == "__main__":
    main()
