"""Weight-space symmetry canonicalization for tanh MLPs and DeepONets.

Bayesian neural networks are invariant under a discrete symmetry group of
the weight space: for every *tanh* hidden unit, negating its incoming row
(+bias) and its outgoing column leaves the network function unchanged
(tanh(-z) = -tanh(z)), and hidden units within a layer can be permuted;
the DeepONet's dot-product merge adds a per-latent-channel symmetry —
negating (or permuting) channel k of BOTH the branch and trunk final layers
simultaneously preserves ``sum_k branch_k * trunk_k``
(/root/reference/Operator_network/HMC/model.py:75-76).

Fixed-temperature HMC chains that start near the same point can settle in
different elements of one function's symmetry orbit; coordinate-wise
split-R-hat then reports "non-convergence" for a posterior whose *functions*
have converged. Canonicalization maps every draw to a canonical orbit
representative — the element best aligned with a fixed reference vector
(here the VI mean, which is canonical and chain-independent) — after which
R-hat measures genuine statistical disagreement only. This is the standard
resolution in the BNN-symmetry literature (see PAPERS.md) and closes the
round-2 demo's weight-space R-hat question (VERDICT round 2, item 3).

All functions take draws as ``(N, D)`` NumPy arrays in the model's
``ravel_pytree`` flat layout and are vectorized over draws; the optional
permutation stage solves one linear assignment per (draw, layer).
"""

from __future__ import annotations

import numpy as np


def _stack_layout(dims, offset):
    """[(b_slice, w_slice, (d_out, d_in)), ...] for one MLP stack in ravel
    order (per layer: bias first, then row-major weight — dict keys sorted)."""
    layers = []
    i = offset
    for d_in, d_out in dims:
        b_sl = slice(i, i + d_out)
        i += d_out
        w_sl = slice(i, i + d_in * d_out)
        i += d_in * d_out
        layers.append((b_sl, w_sl, (d_out, d_in)))
    return layers, i


def mlp_layout(cfg):
    """Layer slices for ``models.mlp`` flat vectors."""
    layers, end = _stack_layout(cfg.layer_dims, 0)
    return layers


def deeponet_layout(cfg):
    """(branch_layers, trunk_layers) slices for ``models.deeponet`` flat
    vectors. flat[0] is the scalar merge bias."""
    branch, i = _stack_layout(cfg.branch_dims, 1)
    trunk, _ = _stack_layout(cfg.trunk_dims, i)
    return branch, trunk


def _views(draws, layer):
    b_sl, w_sl, (d_out, d_in) = layer
    return (draws[:, b_sl],                                   # (N, d_out)
            draws[:, w_sl].reshape(draws.shape[0], d_out, d_in))


def _canonicalize_stack(draws, ref, layers, permute):
    """In-place sign (and optional permutation) canonicalization of the tanh
    hidden layers of one MLP stack. The final layer's rows are left to the
    caller (for a plain MLP they are asymmetric; for a DeepONet they carry
    the merge-channel symmetry handled separately).

    Alignment scores use the INCOMING row + bias only, and layers are
    processed front-to-back. That makes the map exactly orbit-invariant
    (two draws on the same symmetry orbit canonicalize to the identical
    vector): layer 1's decision depends only on its own rows (the input
    carries no symmetry), and inductively each later layer sees its
    predecessors already gauge-fixed. Folding the outgoing column into the
    score would couple a layer's decision to its successor's not-yet-fixed
    gauge and break that guarantee.
    """
    n = draws.shape[0]
    for i in range(len(layers) - 1):
        b, w = _views(draws, layers[i])
        b_next, w_next = _views(draws, layers[i + 1])
        rb, rw = _views(ref, layers[i])
        if permute:
            # a[n, u, v] — assignment on |a|, sign from the chosen entry
            a = (np.einsum("nui,vi->nuv", w, rw[0]) +
                 b[:, :, None] * rb[0][None, None, :])
            from scipy.optimize import linear_sum_assignment

            for k in range(n):
                row, col = linear_sum_assignment(-np.abs(a[k]))
                perm = np.empty_like(col)
                perm[col] = row          # unit placed at slot v comes from perm[v]
                sign = np.sign(a[k][perm, np.arange(len(col))])
                sign[sign == 0] = 1.0
                w[k] = w[k][perm] * sign[:, None]
                b[k] = b[k][perm] * sign
                w_next[k] = w_next[k][:, perm] * sign[None, :]
        else:
            score = np.einsum("nui,ui->nu", w, rw[0]) + b * rb[0][None]
            sign = np.where(score < 0, -1.0, 1.0).astype(draws.dtype)
            w *= sign[:, :, None]
            b *= sign
            w_next *= sign[:, None, :]
        draws[:, layers[i][0]] = b
        draws[:, layers[i][1]] = w.reshape(n, -1)
        draws[:, layers[i + 1][0]] = b_next
        draws[:, layers[i + 1][1]] = w_next.reshape(n, -1)


def canonicalize_mlp(draws, ref, cfg, permute: bool = False):
    """Canonicalize tanh-MLP flat draws against ``ref`` (e.g. the VI mean).

    ``draws``: (N, D) or (D,); returns the same shape. Only valid for odd
    activations (tanh/sine) — relu networks have a scaling, not sign,
    symmetry.
    """
    one = draws.ndim == 1
    draws = np.array(np.atleast_2d(draws), dtype=np.float64, copy=True)
    ref = np.asarray(ref, np.float64)[None]
    _canonicalize_stack(draws, ref, mlp_layout(cfg), permute)
    return draws[0] if one else draws


def canonicalize_deeponet(draws, ref, cfg, permute: bool = False):
    """Canonicalize DeepONet flat draws against ``ref``.

    Handles (a) tanh hidden-unit sign flips/permutations inside the branch
    and trunk stacks and (b) the merge-channel symmetry: channel k of the
    branch AND trunk final layers negated (or permuted) together. Sign
    flips apply to all K channels. Permutations must NOT cross the
    mean/noise head boundary when ``cfg.noise_neurons > 0``: the two heads
    are dot products over DISJOINT channel ranges ([0, K-n) and [K-n, K),
    /root/reference/Operator_network/VI/bayesian_model.py:86-92), so a
    cross-boundary swap changes the network function — the assignment is
    therefore solved per head block.
    """
    one = draws.ndim == 1
    draws = np.array(np.atleast_2d(draws), dtype=np.float64, copy=True)
    refv = np.asarray(ref, np.float64)[None]
    branch, trunk = deeponet_layout(cfg)
    _canonicalize_stack(draws, refv, branch, permute)
    _canonicalize_stack(draws, refv, trunk, permute)

    # merge channels: rows of the two final layers move together
    n = draws.shape[0]
    bb, wb = _views(draws, branch[-1])
    bt, wt = _views(draws, trunk[-1])
    rbb, rwb = _views(refv, branch[-1])
    rbt, rwt = _views(refv, trunk[-1])
    if permute:
        a = (np.einsum("nki,ji->nkj", wb, rwb[0]) +
             np.einsum("nki,ji->nkj", wt, rwt[0]) +
             bb[:, :, None] * rbb[0][None, None, :] +
             bt[:, :, None] * rbt[0][None, None, :])
        from scipy.optimize import linear_sum_assignment

        k_total = wb.shape[1]
        k_main = k_total - getattr(cfg, "noise_neurons", 0)
        blocks = [np.arange(0, k_main)]
        if k_main < k_total:
            blocks.append(np.arange(k_main, k_total))
        for k in range(n):
            perm = np.empty(k_total, dtype=np.int64)
            for blk in blocks:
                sub = a[k][np.ix_(blk, blk)]
                row, col = linear_sum_assignment(-np.abs(sub))
                p_blk = np.empty_like(col)
                p_blk[col] = row
                perm[blk] = blk[p_blk]
            sign = np.sign(a[k][perm, np.arange(k_total)])
            sign[sign == 0] = 1.0
            wb[k] = wb[k][perm] * sign[:, None]
            bb[k] = bb[k][perm] * sign
            wt[k] = wt[k][perm] * sign[:, None]
            bt[k] = bt[k][perm] * sign
    else:
        score = (np.einsum("nki,ki->nk", wb, rwb[0]) + bb * rbb[0][None] +
                 np.einsum("nki,ki->nk", wt, rwt[0]) + bt * rbt[0][None])
        sign = np.where(score < 0, -1.0, 1.0)
        wb *= sign[:, :, None]
        bb *= sign
        wt *= sign[:, :, None]
        bt *= sign
    draws[:, branch[-1][0]] = bb
    draws[:, branch[-1][1]] = wb.reshape(n, -1)
    draws[:, trunk[-1][0]] = bt
    draws[:, trunk[-1][1]] = wt.reshape(n, -1)
    return draws[0] if one else draws


def random_orbit_element(key_rng, flat, cfg, kind: str = "deeponet",
                         permute: bool = True):
    """Apply a random symmetry-group element (sign flips, plus permutations
    unless ``permute=False``) to one flat vector — test utility: the result
    computes the identical network function."""
    rng = np.random.default_rng(key_rng)
    out = np.array(flat, np.float64, copy=True)[None]

    def scramble_stack(layers):
        for i in range(len(layers) - 1):
            b, w = _views(out, layers[i])
            b_next, w_next = _views(out, layers[i + 1])
            d_out = w.shape[1]
            sign = rng.choice([-1.0, 1.0], size=d_out)
            perm = rng.permutation(d_out) if permute else np.arange(d_out)
            w[0] = w[0][perm] * sign[:, None]
            b[0] = b[0][perm] * sign
            w_next[0] = w_next[0][:, perm] * sign[None, :]
            out[:, layers[i][0]] = b
            out[:, layers[i][1]] = w.reshape(1, -1)
            out[:, layers[i + 1][0]] = b_next
            out[:, layers[i + 1][1]] = w_next.reshape(1, -1)

    if kind == "mlp":
        scramble_stack(mlp_layout(cfg))
        return out[0]
    branch, trunk = deeponet_layout(cfg)
    scramble_stack(branch)
    scramble_stack(trunk)
    bb, wb = _views(out, branch[-1])
    bt, wt = _views(out, trunk[-1])
    k_lat = wb.shape[1]
    sign = rng.choice([-1.0, 1.0], size=k_lat)
    perm = np.arange(k_lat)
    if permute:
        # permutations stay within each head's channel block (the mean and
        # noise heads read disjoint ranges — see canonicalize_deeponet)
        k_main = k_lat - (getattr(cfg, "noise_neurons", 0)
                          if kind != "mlp" else 0)
        perm[:k_main] = rng.permutation(k_main)
        if k_main < k_lat:
            perm[k_main:] = k_main + rng.permutation(k_lat - k_main)
    wb[0] = wb[0][perm] * sign[:, None]
    bb[0] = bb[0][perm] * sign
    wt[0] = wt[0][perm] * sign[:, None]
    bt[0] = bt[0][perm] * sign
    out[:, branch[-1][0]] = bb
    out[:, branch[-1][1]] = wb.reshape(1, -1)
    out[:, trunk[-1][0]] = bt
    out[:, trunk[-1][1]] = wt.reshape(1, -1)
    return out[0]
