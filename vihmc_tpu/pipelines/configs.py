"""Typed run configs mirroring the reference's per-pipeline config modules.

The reference uses importable ``config.py`` constant modules with *derived*
values computed at import — notably the analytic trajectory-length rule
``L = int(pi * post_var / (2 * step_size))``
(/root/reference/Neural_network/HMC/config.py:25,
/root/reference/Operator_network/VI_HMC/config.py:41-42). Here each pipeline
has a frozen dataclass with the same fields and defaults; configs serialize
with every run via :class:`vihmc_tpu.io.RunStore` (replacing the reference's
``cp config.py`` provenance).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

from vihmc_tpu.models.mlp import MLPConfig
from vihmc_tpu.models.deeponet import DeepONetConfig
from vihmc_tpu.vi.elbo import ELBOConfig
from vihmc_tpu.vi.train import VIConfig


def trajectory_length(post_var: float, step_size: float) -> int:
    """The reference's analytic L rule: half a period of the harmonic
    oscillator with the posterior's marginal variance."""
    return max(1, int(math.pi * post_var / (2.0 * step_size)))


@dataclasses.dataclass(frozen=True)
class NNHMCRunConfig:
    """Full-parameter HMC for the regression MLP
    (/root/reference/Neural_network/HMC/config.py)."""

    model: MLPConfig = dataclasses.field(default_factory=MLPConfig)
    n_train: int = 20
    n_val: int = 300
    tau: float = 1.0                 # per-tensor prior precision
    tau_out: float = 1.0 / 0.05**2   # likelihood precision ('regression' loss)
    step_size: float = 1e-4
    num_samples: int = 1000
    post_std: float = 0.2024         # empirical posterior std driving L
    num_chains: int = 1
    loss: str = "regression"

    @property
    def L(self) -> int:
        return trajectory_length(self.post_std**2, self.step_size)

    @property
    def burn(self) -> int:
        return self.num_samples // 5


@dataclasses.dataclass(frozen=True)
class NNVIRunConfig:
    """NN VI training (/root/reference/Neural_network/VI/config.py)."""

    model: MLPConfig = dataclasses.field(default_factory=MLPConfig)
    n_train: int = 20
    n_val: int = 300
    noise: float = 5e-2
    vi: VIConfig = dataclasses.field(default_factory=lambda: VIConfig(
        epochs=10_000, lr_start=1e-2, patience=100, num_ens=10, beta_type=1.0,
        prior_mu=0.0, prior_sigma=1.0,
        elbo=ELBOConfig(reduction="sum", fixed_noise_var=5e-2**2),
    ))
    posterior_mu_initial: tuple = (0.0, 0.1)
    posterior_rho_initial: tuple = (-3.0, 0.1)
    mode: str = "bbb"
    num_uq_samps: int = 500


@dataclasses.dataclass(frozen=True)
class SensitivityRunConfig:
    """(/root/reference/Neural_network/VI/config_sens.py,
    /root/reference/Operator_network/VI/config_sens.py)."""

    importance_threshold: float = 0.90
    batch_chunk: int = 0     # stream Jacobian batches in chunks (>0)
    p_subsample: int = 100   # trunk points used for operator Jacobians


@dataclasses.dataclass(frozen=True)
class VIHMCRunConfig:
    """Subspace VI-HMC (/root/reference/Neural_network/VI_HMC/config.py and
    /root/reference/Operator_network/VI_HMC/config.py)."""

    step_size: float = 5e-4
    num_samples: int = 100
    burn: Optional[int] = None       # default num_samples // 5
    prior_var: float = 1.0
    post_std: float = 0.2501
    loss: str = "NLL"
    tau_out: float = 5e-2**2         # variance under NLL
    num_chains: int = 10
    load_prior: bool = True          # subspace prior = VI posterior
    load_std: bool = True            # use VI stds (else sqrt(prior_var))
    init_prior: bool = True          # init from VI (mean or draw)
    sample_prior: bool = False       # init from a VI draw instead of the mean
    frozen_policy: str = "refresh"   # 'mean' | 'draw' | 'refresh'
    vi_mass: bool = False            # precondition: inv_mass = VI sigma^2 (extension)
    laplace_mass: bool = False       # kinetic metric from the stage-2 Fisher:
                                     # inv_mass = 1/(prior_prec + n*E[J^2]/tau).
                                     # Needs 'scores' in artifacts and
                                     # laplace_n_data; overrides vi_mass.
                                     # (Extension: measured necessary when the
                                     # VI sigmas misstate conditional scales —
                                     # docs/performance.md round 3.)
    laplace_n_data: Optional[int] = None  # likelihood observation count n
    lowrank_rank: int = 0            # >0: low-rank+diagonal kinetic metric
                                     # M = D + UU^T — Lanczos on conditional
                                     # Hessian-vector products at the VI mean
                                     # finds the `rank` stiffest directions
                                     # the diagonal metric (vi_mass/
                                     # laplace_mass) misses, and the kernel
                                     # samples/solves it exactly in O(Dk) via
                                     # Woodbury (hmc/metric.py). The fix for
                                     # off-diagonally-stiff conditionals
                                     # (docs/performance.md round 3); plain
                                     # 'hmc' only, no query subsampling
    lowrank_iters: Optional[int] = None  # Lanczos iterations (default
                                     # max(2*rank, rank+10); more = better
                                     # converged Ritz pairs, each costs one
                                     # HVP ~ 2 gradient evals)
    init_optimize: int = 0           # warm-start Adam steps on the
                                     # conditional -log p(q|frozen) before
                                     # sampling (draw/mean policies: the VI
                                     # mean can sit far below the
                                     # conditional typical set — see
                                     # docs/performance.md round 3)
    init_optimize_lr: float = 0.1    # in kinetic-metric sigmas per step
    sample_data: bool = False        # random trunk-point subsampling per draw
    p: int = 10201                   # trunk points kept when sample_data
                                     # (reference main_VI_HMC_burgers.py:131-138)
    adapt_step_size: bool = False    # dual-averaging during burn (extension:
                                     # the reference's VI-HMC uses a fixed step)
    save_vi_trace: bool = False      # record the frozen VI draw used at each
                                     # iteration and persist it as the
                                     # 'vi_params' artifact (reference
                                     # my_make_func.py:45-50); plain HMC only
    adapt_mass: bool = False         # Welford diagonal mass during warmup
    mass_schedule: str = "half"      # 'half' | 'windowed' (Stan-style doubling
                                     # windows w/ dual-averaging restarts)
    target_accept: float = 0.8
    algorithm: str = "hmc"           # 'hmc' (reference) | 'nuts' | 'chees'
                                     # (extensions: adaptive trajectory
                                     # lengths replace the analytic L rule)
                                     # | 'auto': probe the conditional's
                                     # preconditioned curvature (tiny
                                     # Lanczos on HVPs) and pick the
                                     # measured-best sampler for the regime:
                                     # lambda_max <= auto_stiffness_threshold
                                     # or a low-rank metric configured ->
                                     # fixed-L 'hmc' (wins on soft/corrected
                                     # posteriors: 19.3 vs 3.9 ESS/s, r2);
                                     # residual stiffness beyond the metric
                                     # -> 'nuts' (wins there: 3.2 vs 2.29,
                                     # r3). docs/performance.md round 4.
    auto_stiffness_threshold: float = 100.0  # lambda_max above which the
                                     # diagonal metric is declared
                                     # insufficient (r3 stiff fit measured
                                     # ~1e4; healthy fits ~1)
    nuts_max_depth: int = 6
    chees_max_steps: int = 256       # leapfrog cap per draw for 'chees'
    num_leapfrog: Optional[int] = None  # explicit L (default: analytic rule)
    jitter_l: bool = False           # per-draw trajectory length ~ U[low, L]
    jitter_low_frac: float = 0.0     # low = max(1, frac*L); 0.5 recommended
                                     # (breaks fixed-L resonances — see
                                     # docs/performance.md)
    jitter_eps: bool = False         # per-draw step-size multiplier
                                     # ~ U[jitter_low_frac, 1] instead:
                                     # same resonance-breaking, but every
                                     # leapfrog step contributes (no masked
                                     # tail) — see docs/performance.md
    clip_grad: Optional[float] = None  # preconditioned grad-norm clip on the
                                     # TRAJECTORY field (MH stays exact);
                                     # frees chains trapped in far tails
                                     # under the refresh policy. ~13*sqrt(d)
                                     # recommended; plain HMC only
    coarse_stride: Optional[int] = None  # coarse-grid surrogate TRAJECTORY
                                     # gradient: keep every stride-th query
                                     # point per grid dim in the Gram
                                     # gradient (rescaled), exact density at
                                     # endpoints. stride=2 measured ~3.8x
                                     # wall clock at unchanged ESS
                                     # (docs/performance.md); operator gram
                                     # path only
    fn_stride: Optional[int] = None  # function-stride surrogate TRAJECTORY
                                     # gradient: keep every stride-th
                                     # training function in the Gram
                                     # gradient (rescaled) — attacks the
                                     # branch-cost floor the query stride
                                     # leaves behind; composes with
                                     # coarse_stride. Exact density at
                                     # endpoints keeps MH unbiased; operator
                                     # gram path only
    grad_dtype: Optional[str] = None  # 'bfloat16' runs the Gram TRAJECTORY
                                     # gradient's feature stacks + VJP in
                                     # bf16 (f32 accumulation; f32 gradient
                                     # out). Field precision only — the MH
                                     # density is untouched, so the sampled
                                     # law is identical. Measured on-chip:
                                     # ~2x the hot-loop marginal compute and
                                     # a LARGER dual-averaging equilibrium
                                     # step at the same target
                                     # (docs/performance.md round 4);
                                     # operator Gram path only
    gauss_field: Optional[float] = None  # VI-Gaussian TRAJECTORY field:
                                     # leapfrog on the score of
                                     # N(mu[idx], alpha*sigma[idx]^2) — zero
                                     # likelihood cost per step, exact
                                     # density at endpoints (alpha = this
                                     # value; 1.0 recommended). Model-
                                     # agnostic; plain HMC/ChEES only;
                                     # mutually exclusive with the Gram
                                     # oracle (coarse_stride/fn_stride)
                                     # unless gauss_field_auto is set
    gauss_field_auto: bool = False   # probe the VI-Gaussian field for
                                     # gauss_field_probe_draws before
                                     # sampling: keep it if its MH
                                     # acceptance >= gauss_field_floor, else
                                     # fall back to the otherwise-configured
                                     # trajectory field (Gram/stride or
                                     # autodiff). Plain HMC only; the probe
                                     # costs one extra compiled scan
    gauss_field_floor: float = 0.35  # acceptance floor for the auto probe
    gauss_field_probe_draws: int = 16
    max_step: Optional[float] = None  # clamp the adapted step actually used
    da_axis: Optional[str] = None    # couple dual averaging across the
                                     # 'chains' vmap axis: the accept
                                     # statistic is pmean'd so all chains
                                     # share one low-noise adapted step
                                     # (see HMCConfig.da_axis)
    adapt_forever: bool = False      # keep dual-averaging past burn with the
                                     # adapting iterate (diminishing
                                     # adaptation). Fixes the
                                     # freeze-at-the-burn-average problem:
                                     # the averaged step is dominated by the
                                     # tiny early-exploration iterates, so
                                     # frozen runs land far above the
                                     # acceptance target (measured 0.92 at a
                                     # 0.65 target on the operator demo)

    @property
    def L(self) -> int:
        if self.num_leapfrog is not None:
            return self.num_leapfrog
        return trajectory_length(self.post_std**2, self.step_size)

    @property
    def burn_(self) -> int:
        return self.num_samples // 5 if self.burn is None else self.burn


@dataclasses.dataclass(frozen=True)
class OperatorVIRunConfig:
    """Operator VI training (/root/reference/Operator_network/VI/config.py)."""

    model: DeepONetConfig = dataclasses.field(default_factory=DeepONetConfig)
    dataset: str = "Burgers"         # 'Burgers' | 'Cone' (reference
                                     # Operator_network/VI/config.py:28)
    n_train: int = 1000
    n_valid: int = 1000
    batch_size: int = 128
    p: int = 10201                   # trunk points per example (subsample if < grid)
    vi: VIConfig = dataclasses.field(default_factory=lambda: VIConfig(
        epochs=1000, lr_start=1e-3, patience=50, num_ens=5, beta_type=1.0,
        prior_mu=0.0, prior_sigma=0.1,
        elbo=ELBOConfig(reduction="mean_x_n", fixed_noise_var=1.0),
    ))
    posterior_mu_initial: tuple = (0.0, 0.1)
    posterior_rho_initial: tuple = (-5.0, 0.1)
    mode: str = "bbb"


@dataclasses.dataclass(frozen=True)
class OperatorHMCRunConfig:
    """Full-parameter DeepONet HMC with NUTS-style adaptation
    (/root/reference/Operator_network/HMC/config.py)."""

    model: DeepONetConfig = dataclasses.field(default_factory=DeepONetConfig)
    n_train: int = 10
    n_valid: int = 10
    step_size: float = 1e-4
    num_samples: int = 10
    post_std: float = 0.0214
    prior_var: float = 0.1**2
    loss: str = "NLL"
    tau_out: float = 1.0
    sample_data: bool = False        # random trunk subsampling inside the sampler
    p: int = 10201
    target_accept: float = 0.8

    @property
    def L(self) -> int:
        return trajectory_length(self.post_std**2, self.step_size)

    @property
    def burn(self) -> int:
        return max(1, self.num_samples // 10)


@dataclasses.dataclass(frozen=True)
class SplitHMCRunConfig:
    """Split-Hamiltonian DeepONet HMC
    (/root/reference/Operator_network/HMC/config_splitting.py)."""

    model: DeepONetConfig = dataclasses.field(default_factory=DeepONetConfig)
    n_train: int = 1000
    n_valid: int = 1000
    num_splits: int = 2
    is_nuts: bool = False
    step_size: float = 3.45e-4
    num_samples: int = 1001
    prior_var: float = 0.1**2
    post_std: float = 0.0214
    loss: str = "NLL"
    tau_out: float = 1.0
    sample_data: bool = False
    p: int = 10201
    target_accept: float = 0.8

    @property
    def L(self) -> int:
        return trajectory_length(self.post_std**2, self.step_size)

    @property
    def burn(self) -> int:
        return self.num_samples // 2
