"""Raw linear-algebra kernels used by solvers and smoothers.

Counterpart of /root/reference/base/PyNucleus_base/linalg.pyx:
estimateSpectralRadius (:811), arnoldi (:832), lanczos (:916) — the
Chebyshev smoother needs the spectral radius of D^{-1}A.  Implemented as
jitted JAX loops (power iteration / Lanczos three-term recurrence).
"""
import numpy as np
import jax
import jax.numpy as jnp

__all__ = ['estimateSpectralRadius', 'lanczos', 'arnoldi']


def estimateSpectralRadius(A, Dinv=None, maxiter=50, tol=1e-4, seed=0):
    """Spectral radius of (Dinv @) A by power iteration
    (ref linalg.pyx:811)."""
    n = A.num_rows
    x = jnp.asarray(np.random.RandomState(seed).rand(n)) - 0.5
    x = x / jnp.linalg.norm(x)

    def apply(v):
        w = A.matvec(v)
        if Dinv is not None:
            w = Dinv * w
        return w

    lam = 0.0
    for _ in range(maxiter):
        y = apply(x)
        lamNew = float(jnp.linalg.norm(y))
        if lamNew == 0.0:
            return 0.0
        x = y / lamNew
        if abs(lamNew - lam) < tol * abs(lamNew):
            lam = lamNew
            break
        lam = lamNew
    return lam


def lanczos(A, k=20, Dinv=None, seed=0):
    """k-step Lanczos: returns (alphas, betas) of the tridiagonal matrix
    whose eigenvalues approximate those of the (symmetrically scaled)
    operator (ref linalg.pyx:916)."""
    n = A.num_rows
    q = jnp.asarray(np.random.RandomState(seed).rand(n)) - 0.5
    q = q / jnp.linalg.norm(q)
    qm = jnp.zeros_like(q)
    alphas, betas = [], []
    beta = 0.0
    for _ in range(k):
        w = A.matvec(q)
        if Dinv is not None:
            w = Dinv * w
        alpha = float(q @ w)
        w = w - alpha * q - beta * qm
        beta = float(jnp.linalg.norm(w))
        alphas.append(alpha)
        betas.append(beta)
        if beta < 1e-14:
            break
        qm = q
        q = w / beta
    return np.asarray(alphas), np.asarray(betas)


def lanczosSpectralBounds(A, Dinv=None, k=20, safety=1.05):
    """(lmin, lmax) eigenvalue estimates from the Lanczos tridiagonal,
    inflated by `safety` (the standard Chebyshev-smoother setup)."""
    alphas, betas = lanczos(A, k=k, Dinv=Dinv)
    m = len(alphas)
    T = np.diag(alphas)
    for i in range(m - 1):
        T[i, i + 1] = T[i + 1, i] = betas[i]
    ev = np.linalg.eigvalsh(T)
    return float(ev[0] / safety), float(ev[-1] * safety)


def arnoldi(A, k=20, seed=0):
    """k-step Arnoldi: returns the upper-Hessenberg H [k+1, k] and the basis
    V [n, k+1] (ref linalg.pyx:832)."""
    n = A.num_rows
    v = jnp.asarray(np.random.RandomState(seed).rand(n)) - 0.5
    v = v / jnp.linalg.norm(v)
    V = [v]
    H = np.zeros((k + 1, k))
    for j in range(k):
        w = A.matvec(V[j])
        for i in range(j + 1):
            H[i, j] = float(V[i] @ w)
            w = w - H[i, j] * V[i]
        H[j + 1, j] = float(jnp.linalg.norm(w))
        if H[j + 1, j] < 1e-14:
            H = H[:j + 2, :j + 1]
            break
        V.append(w / H[j + 1, j])
    return H, jnp.stack(V, axis=1)
