"""Tiny chip health probe: one fresh matmul compile + execute."""
import time
import jax, jax.numpy as jnp
t0 = time.time()
x = jnp.ones((256, 256), jnp.bfloat16) * (time.time() % 7)
y = (x @ x).sum()
print(f"health ok: {float(y):.1f} in {time.time()-t0:.1f}s "
      f"({jax.default_backend()})")
