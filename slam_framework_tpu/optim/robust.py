"""Robust-kernel weighting (Huber), matching g2o's RobustKernelHuber semantics.

Reference: third_party/g2o/g2o/core/robust_kernel_impl.cpp (Huber), used with
delta = sqrt(5.991) for mono edges and sqrt(7.815) for stereo edges
(src/optimizer/optimizer.cpp:75-76, 244-245, 337-338).
"""

from __future__ import annotations

import jax.numpy as jnp

CHI2_MONO = 5.991    # 95% quantile, chi^2 2-dof
CHI2_STEREO = 7.815  # 95% quantile, chi^2 3-dof


def huber_weight(chi2: jnp.ndarray, delta2: float) -> jnp.ndarray:
    """IRLS weight for the Huber kernel given squared error chi2 and delta^2.

    rho(e) = e                     for e <= delta^2
           = 2*delta*sqrt(e) - delta^2  otherwise
    weight = rho'(e) = 1 or delta/sqrt(e).
    """
    safe = jnp.maximum(chi2, 1e-12)
    return jnp.where(chi2 <= delta2, 1.0, jnp.sqrt(delta2 / safe))
