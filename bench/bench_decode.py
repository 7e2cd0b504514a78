"""Decode-attention bandwidth benchmark: Pallas flash-decode (bf16 vs int8
cache) vs the XLA composed decode graph. Marginal timing over two scan
lengths."""
import os, sys, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np

def marginal(f, q, lo=8, hi=24):
    def total(n):
        @jax.jit
        def loop(q):
            def body(q, _):
                out = f(q)
                eps = (jnp.sum(out.astype(jnp.float32))*1e-30).astype(q.dtype)
                return q+eps, 0
            q,_ = jax.lax.scan(body, q, None, length=n)
            return jnp.sum(q.astype(jnp.float32))
        float(loop(q))
        best = 1e9
        for _ in range(3):
            t0=time.perf_counter(); float(loop(q)); best=min(best, time.perf_counter()-t0)
        return best
    tlo, thi = total(lo), total(hi)
    return max((thi-tlo)/(hi-lo), 1e-9)

def main():
    from tpu_flash.kernels.decode import flash_decode_attention as fda
    rng = np.random.default_rng(0)
    B,H,S,d = 8,8,8192,64
    q = jnp.asarray(rng.standard_normal((B,H,1,d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B,H,S,d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B,H,S,d)), jnp.bfloat16)
    lengths = jnp.asarray([S]*B, jnp.int32)
    amax = jnp.max(jnp.abs(k.astype(jnp.float32)), axis=-1, keepdims=True)
    ks = amax/127.0; k8 = jnp.clip(jnp.round(k.astype(jnp.float32)/ks), -127,127).astype(jnp.int8)
    amax = jnp.max(jnp.abs(v.astype(jnp.float32)), axis=-1, keepdims=True)
    vs = amax/127.0; v8 = jnp.clip(jnp.round(v.astype(jnp.float32)/vs), -127,127).astype(jnp.int8)

    def xla_ref(q):
        s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)) / np.sqrt(d)
        mask = jnp.arange(S)[None,None,None,:] < lengths[:,None,None,None]
        p = jax.nn.softmax(jnp.where(mask, s, -1e9), -1)
        return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32)).astype(q.dtype)

    results = {}
    t_bf = marginal(lambda q: fda(q,k,v,lengths), q)
    print(json.dumps({"name":"decode_bf16_ms","value":t_bf*1e3}), flush=True)
    t_i8 = marginal(lambda q: fda(q,k8,v8,lengths,ks,vs), q)
    print(json.dumps({"name":"decode_int8_ms","value":t_i8*1e3}), flush=True)
    t_x = marginal(xla_ref, q)
    print(json.dumps({"name":"decode_xla_ms","value":t_x*1e3}), flush=True)
    lens2 = jnp.asarray([1024]*B, jnp.int32)
    t_short = marginal(lambda q: fda(q,k8,v8,lens2,ks,vs), q)
    print(json.dumps({"name":"decode_int8_len1024_ms","value":t_short*1e3}), flush=True)
    bw_bf = B*H*S*d*2*2/t_bf/1e9
    bw_i8 = (B*H*S*d*2 + B*H*S*8)/t_i8/1e9
    print(json.dumps({
        "bf16_ms": round(t_bf*1e3,4), "int8_ms": round(t_i8*1e3,4),
        "xla_ms": round(t_x*1e3,4), "short_ms": round(t_short*1e3,4),
        "bf16_GBps": round(bw_bf), "int8_GBps": round(bw_i8),
        "int8_vs_bf16": round(t_bf/t_i8,2), "pallas_vs_xla": round(t_x/t_bf,2),
        "dma_skip_ratio": round(t_i8/t_short,2),
    }), flush=True)

main()
