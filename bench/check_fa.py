"""Quick on-TPU numeric check of the flash kernels vs the jnp oracle.

Covers causal/non-causal, fp32/bf16, unaligned lengths, Lq != Lk.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# fp32 matmuls on TPU default to bf16 passes; the oracle must be exact.
jax.config.update("jax_default_matmul_precision", "highest")


def naive(q, k, v, causal, scale):
    qf, kf, vf = (x.astype(jnp.float32) for x in (q, k, v))
    s = jnp.einsum("bhqd,bhkd->bhqk", qf, kf) * scale
    if causal:
        Lq, Lk = q.shape[-2], k.shape[-2]
        off = Lk - Lq
        rows = jnp.arange(Lq)[:, None] + off
        cols = jnp.arange(Lk)[None, :]
        s = jnp.where(cols <= rows, s, -1e7)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, vf)


def main():
    from tpu_flash.kernels.flash_attention import (
        flash_attention_backward,
        flash_attention_forward,
    )

    rng = np.random.default_rng(0)
    cases = [
        # (B, H, Lq, Lk, d, causal, dtype, blocks)
        (2, 4, 256, 256, 64, True, jnp.float32, (128, 128)),
        (2, 4, 256, 256, 64, False, jnp.float32, (128, 128)),
        (2, 2, 200, 200, 64, True, jnp.float32, (128, 128)),
        (1, 2, 128, 384, 64, True, jnp.float32, (128, 128)),
        (2, 4, 512, 512, 64, True, jnp.bfloat16, (256, 256)),
        (2, 4, 512, 512, 128, True, jnp.float32, (256, 256)),
        (1, 1, 8, 512, 64, True, jnp.float32, (128, 128)),
    ]
    for B, H, Lq, Lk, d, causal, dtype, (bq, bk) in cases:
        q = jnp.asarray(rng.standard_normal((B, H, Lq, d)), dtype)
        k = jnp.asarray(rng.standard_normal((B, H, Lk, d)), dtype)
        v = jnp.asarray(rng.standard_normal((B, H, Lk, d)), dtype)
        do = jnp.asarray(rng.standard_normal((B, H, Lq, d)), dtype)
        scale = 1.0 / d ** 0.5

        out, lse, m = flash_attention_forward(
            q, k, v, causal=causal, block_q=bq, block_k=bk)
        ref = naive(q, k, v, causal, scale)
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))

        # lse check
        sf = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * scale
        if causal:
            off = Lk - Lq
            rows = jnp.arange(Lq)[:, None] + off
            cols = jnp.arange(Lk)[None, :]
            sf = jnp.where(cols <= rows, sf, -1e7)
        lse_ref = jax.scipy.special.logsumexp(sf, axis=-1)
        lse_err = float(jnp.max(jnp.abs(lse - lse_ref)))

        # backward vs jax.grad of the naive graph
        def loss_ref(q, k, v):
            return jnp.sum(naive(q, k, v, causal, scale)
                           * do.astype(jnp.float32))
        dq_r, dk_r, dv_r = jax.grad(loss_ref, (0, 1, 2))(q, k, v)
        dq, dk, dv = flash_attention_backward(
            q, k, v, out, lse, do, causal=causal, block_q=bq, block_k=bk)
        bw_err = max(
            float(jnp.max(jnp.abs(dq.astype(jnp.float32)
                                  - dq_r.astype(jnp.float32)))),
            float(jnp.max(jnp.abs(dk.astype(jnp.float32)
                                  - dk_r.astype(jnp.float32)))),
            float(jnp.max(jnp.abs(dv.astype(jnp.float32)
                                  - dv_r.astype(jnp.float32)))),
        )
        tol = 2e-2 if dtype == jnp.bfloat16 else 2e-3
        bw_tol = 1e-1 if dtype == jnp.bfloat16 else 1e-2
        status = "OK " if (err < tol and lse_err < tol and bw_err < bw_tol) \
            else "FAIL"
        print(f"{status} B{B} H{H} Lq{Lq} Lk{Lk} d{d} causal={causal} "
              f"{jnp.dtype(dtype).name} bq{bq} bk{bk}: fw={err:.2e} "
              f"lse={lse_err:.2e} bw={bw_err:.2e}")


if __name__ == "__main__":
    main()
