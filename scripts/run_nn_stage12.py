"""Stage 1+2 of the NN workload at the reference config, cached as an asset.

Trains the Bayesian MLP VI stage at the reference's exact hyperparameters
(10k epochs, Adam 1e-2, num_ens 10, beta 1.0, priors N(0,1) —
/root/reference/Neural_network/VI/config.py:16-35), runs sensitivity at the
90% threshold, and writes ``assets/nn_stage12.npz`` so ``bench.py
--workload nn`` builds its posterior from REAL stage-1/2 artifacts (the
round-1 VERDICT item-2 honesty rule, applied to the secondary workload too):
full-vector mu/sigma, the selected sensitive index set, full scores, and the
data seed. CPU-friendly (141 params); run with
``PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu``.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=10_000)
    ap.add_argument("--out", default="assets/nn_stage12.npz")
    args = ap.parse_args()

    import jax

    from vihmc_tpu.data.synthetic import regression_data
    from vihmc_tpu.pipelines import vi_train, sensitivity, configs as C
    from vihmc_tpu.vi import VIConfig
    from vihmc_tpu.vi.elbo import ELBOConfig

    # the exact data bench_nn closes over (bench.py::build_nn_problem)
    data = regression_data(jax.random.key(0), 20, 300, noise_std=5e-2)

    t0 = time.time()
    vi_cfg = C.NNVIRunConfig(vi=VIConfig(
        epochs=args.epochs, lr_start=1e-2, patience=5000, num_ens=10,
        beta_type=1.0, prior_mu=0.0, prior_sigma=1.0,
        elbo=ELBOConfig(reduction="sum", fixed_noise_var=5e-2 ** 2)))
    vi_out = vi_train.run_nn(vi_cfg, key=jax.random.key(0), data=data)
    mm = np.asarray(vi_out["metrics"])
    print(f"[vi] {args.epochs} epochs in {time.time()-t0:.1f}s  "
          f"valid_mse {mm[0,3]:.3f} -> {mm[-1,3]:.3f} (best {mm[:,3].min():.3f})",
          flush=True)

    sens = sensitivity.run_nn(vi_out["best_state"].vp, vi_cfg.model,
                              data["x_val"],
                              C.SensitivityRunConfig(importance_threshold=0.90))
    print(f"[sensitivity] {sens['num_sensitive']}/{len(sens['scores'])} params",
          flush=True)

    np.savez(args.out,
             mu=np.asarray(sens["mu"], np.float32),
             sigma=np.asarray(sens["sigma"], np.float32),
             indices=np.asarray(sens["indices"]),
             scores=np.asarray(sens["scores"], np.float32),
             data_seed=0, n_train=20, n_val=300, noise_std=5e-2,
             vi_epochs=args.epochs,
             vi_valid_mse=mm[:, 3].astype(np.float32))
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
