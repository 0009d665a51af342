"""vihmc_tpu — TPU-native VI-HMC framework.

A brand-new JAX/XLA/Pallas implementation of the hybrid VI-HMC method for
Bayesian inference in neural networks and neural operators (capabilities of
the reference `ponkrshnan/VI-HMC`, arXiv 2507.14652), redesigned TPU-first:

- HMC/NUTS-adaptation/split-Hamiltonian samplers as pure functions compiled
  with ``jax.jit``/``lax.scan`` (reference: external `hamiltorch` kernel).
- Chains are vectorized with ``vmap`` within a chip and sharded over a
  ``jax.sharding.Mesh`` across chips/hosts (reference: sequential Python loop).
- Mean-field VI (Bayes-by-Backprop + local reparameterization) over pure
  pytree models (reference: torch Modules).
- Sensitivity-based subspace selection via ``jax.jacrev``.

Subpackages
-----------
core         flat<->pytree raveling, PRNG threading, precision policy, configs
dists        Gaussian priors + the 6-way likelihood zoo
models       pure-function MLP / DeepONet + Bayesian (mu, rho) variants
vi           ELBO variants, KL, beta schedules, training loop
sensitivity  squared-Jacobian x sigma^2 scores, captured-variance selection
hmc          leapfrog/split integrators, MH kernel, dual averaging, subspace
chains       vmap/mesh-sharded multi-chain driver + R-hat/ESS diagnostics
data         synthetic 1-D regression + Burgers/DeepONet data (solver + .mat)
io           checkpointing + run-uid artifact store
ops          Pallas TPU kernels for hot paths
pipelines    the 8 reference entry points as thin library calls
"""

__version__ = "0.1.0"
