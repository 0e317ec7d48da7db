"""Plain-numpy oracle implementations of the reference math, written
independently from the algorithm descriptions (SURVEY.md §2) for parity
testing of the JAX pipeline.  Deliberately simple and loop-based."""

import numpy as np


def project_weight(x):
    x = np.maximum(0.0, x)
    mx = x.max()
    return x if mx == 0 else x / mx


def greedy_pca(R0, K, support_fn=None):
    """Greedy deflation PCA.  support_fn(idx) -> (N,) support multiplier or
    None for global support.  Returns (C (K,N,3), W (F,K), sigmas, res_norms,
    indices)."""
    R = R0.copy()
    C, W, sigmas, res_norms, idxs = [], [], [], [], []
    for _ in range(K):
        magnitude = (R ** 2).sum(axis=2)
        idx = int(np.argmax(magnitude.sum(axis=0)))
        X = R[:, idx, :].T                       # (3, F)
        _, sing, Vt = np.linalg.svd(X, full_matrices=False)
        wk = sing[0] * Vt[0, :]
        if support_fn is not None:
            wp, wn = project_weight(wk), project_weight(-wk)
            wk = wp if np.linalg.norm(wp) > np.linalg.norm(wn) else wn
            s = support_fn(idx)
            ck = (np.tensordot(wk, R, (0, 0)) * s[:, None]) / np.inner(wk, wk)
        else:
            ck = np.tensordot(wk, R, (0, 0)) / np.inner(wk, wk)
        C.append(ck)
        W.append(wk)
        R = R - np.outer(wk, ck).reshape(R.shape)
        sigmas.append(sing[0])
        res_norms.append(np.linalg.norm(R))
        idxs.append(idx)
    return (np.array(C), np.array(W).T, np.array(sigmas),
            np.array(res_norms), np.array(idxs))


def greedy_pca_blocks(R0, K, p):
    """Greedy blockwise deflation (pca_blocks).  Returns
    (C (Kp, ep, 3), W (F, Kp), element_indices (K,), block_rows (Kp,))."""
    R = R0.copy()
    e = R.shape[1] // p
    C, W, idxs, rows = [], [], [], []
    for _ in range(K):
        mag = (R ** 2).sum(axis=2)                # (F, ep)
        block = mag.sum(axis=0).reshape(e, p).sum(axis=1)
        idx = int(np.argmax(block))
        idxs.append(idx)
        for i in range(p):
            X = R[:, idx * p + i, :].T
            _, sing, Vt = np.linalg.svd(X, full_matrices=False)
            wk = sing[0] * Vt[0, :]
            ck = np.tensordot(wk, R, (0, 0)) / np.inner(wk, wk)
            R = R - np.outer(wk, ck).reshape(R.shape)
            C.append(ck)
            W.append(wk)
            rows.append(idx * p + i)
    return np.array(C), np.array(W).T, np.array(idxs), np.array(rows)


def splocs_iteration(X, C, W, Lambda, rho, num_admm):
    """One SPLOCS outer iteration (BCD weights + ADMM components).
    Returns (C', W', energy, e_rms)."""
    F, N = X.shape[0], X.shape[1]
    K = C.shape[0]
    Rflat = X.reshape(F, -1) - W @ C.reshape(K, -1)
    for k in range(K):
        Ck = C[k].ravel()
        n = np.inner(Ck, Ck)
        if n <= 1e-8:
            W[:, k] = 0
            continue
        Rflat = Rflat + np.outer(W[:, k], Ck)
        opt = Rflat @ Ck / n
        W[:, k] = project_weight(opt)
        Rflat = Rflat - np.outer(W[:, k], Ck)

    from scipy.linalg import cho_factor, cho_solve
    Z = C.copy()
    U = np.zeros_like(C)
    G = W.T @ W
    c = W.T @ X.reshape(F, -1)
    pre = cho_factor(G + rho * np.eye(K))
    for _ in range(num_admm):
        C = cho_solve(pre, c + rho * (Z - U).reshape(c.shape)).reshape(C.shape)
        xlen = np.sqrt(((C + U) ** 2).sum(axis=-1))
        with np.errstate(divide="ignore"):
            shrink = np.maximum(0.0, 1 - (1.0 / rho) * Lambda / xlen)
        Z = (C + U) * shrink[..., None]
        U = U + C - Z
    C = Z
    R = X - np.tensordot(W, C, (1, 0))
    sparsity = np.sum(Lambda * np.sqrt((C ** 2).sum(axis=2)))
    e_rms = np.linalg.norm(R) / np.sqrt(3 * N * F)
    energy = (R ** 2).sum() + sparsity
    return C, W, energy, e_rms


def deim_rows(bases, p):
    """Row-wise DEIM oracle.  bases (ep, K, d).  Returns (Pt, alphas)."""
    ep, K, d = bases.shape
    Pt, alphas = [], []
    V = None
    for k in range(K):
        vk = bases[:, k, :]
        if k == 0:
            r = vk
        else:
            c = np.empty_like(vk)
            for i in range(d):
                sol, *_ = np.linalg.lstsq(V[Pt, :, i], vk[Pt, i], rcond=None)
                c[:, i] = V[:, :, i] @ sol
            r = c - vk
        idx = int(np.argmax((r ** 2).sum(axis=1)))
        Pt.append(idx)
        alphas.append(idx // p)
        V = vk[:, None, :] if V is None else np.concatenate(
            (V, vk[:, None, :]), axis=1)
    return np.array(Pt), np.array(alphas)
