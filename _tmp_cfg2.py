import functools, numpy as np, jax, jax.numpy as jnp
assert jax.default_backend() == "tpu"
import tpu_flash
from tpu_flash.utils.timing import attention_flops, benchmark
rng = np.random.default_rng(0)
for L, d in [(1024, 64), (8192, 64), (2048, 128)]:
    B, H = (4, 8) if L <= 2048 else (1, 8)
    q,k,v,do = (jnp.asarray(rng.standard_normal((B,H,L,d))*0.5, jnp.float32) for _ in range(4))
    fl = attention_flops(B,H,L,d,causal=True,fwd_and_bwd=True)
    def fwbw(**kw):
        def f(q,k,v):
            return jax.grad(lambda *a: jnp.sum(tpu_flash.flash_attention(*a,causal=True,**kw)*do),(0,1,2))(q,k,v)
        return f
    r0 = benchmark(fwbw(), q,k,v, name=f"L{L} d{d} fp32", flops=fl)
    r1 = benchmark(fwbw(dropout_rate=0.1, dropout_seed=1), q,k,v, name=f"L{L} d{d} fp32+drop", flops=fl)
    r2 = benchmark(fwbw(kv_quant="int8"), q,k,v, name=f"L{L} d{d} int8kv", flops=fl)
    # parity int8 vs fp32
    dev = float(jnp.max(jnp.abs(tpu_flash.flash_attention(q,k,v,causal=True,kv_quant="int8")
                                - tpu_flash.flash_attention(q,k,v,causal=True))))
    print(f"{r0}\n{r1}\n{r2}   int8-vs-fp32 max dev {dev:.4f}", flush=True)
