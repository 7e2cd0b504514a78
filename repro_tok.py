"""Does host-side tokenizer training before first device use break the
tunneled client?  Mirrors the app's exact order: dataset -> tokenizer
training (rayon threads) -> model init -> eager randint -> one step."""
import time
import numpy as np, jax, jax.numpy as jnp
from tpu_flash import nn
from tpu_flash.data import mt

t0 = time.time()
dataset, src, tgt = mt.get_dataset("synthetic-fast", 40, synthetic=True)
print("data", time.time() - t0, flush=True)
tok = mt.get_tokenizer(dataset["train"], 4000, src, tgt, "/tmp/tokwd")
print("tokenizer trained", time.time() - t0, flush=True)

cfg = nn.DecoderConfig(n_vocab=4000, n_embd=256, n_head=8, n_positions=40,
                       n_layer=4, p_dropout=0.1, attention_kind="flash",
                       dtype=jnp.bfloat16)
model = nn.DecoderLM(cfg)
params = model.init(jax.random.key(0))
print("init done (device)", time.time() - t0, flush=True)
r = int(jax.random.randint(jax.random.key(1), (), 0, 2**31 - 1))
print("eager randint ok:", r, time.time() - t0, flush=True)
opt = nn.adam(lr=0.003)
opt_state = opt.init(params)
rng = np.random.default_rng(0)
B, L, V = 129, 40, 4000
batch = {
    "input_ids": jnp.asarray(rng.integers(0, V, (B, L)), jnp.int32),
    "labels": jnp.asarray(rng.integers(0, V, (B, L)), jnp.int32),
    "w": jnp.asarray(rng.random((B, L)), jnp.float32),
}

def loss_fn(p, b, key):
    logits = model(p, b["input_ids"], key=key, training=True)
    return jnp.mean(nn.functional.softmax_loss(logits, b["labels"]) * b["w"])

@jax.jit
def step(p, o, b, key):
    loss, grads = jax.value_and_grad(loss_fn)(p, b, key)
    p, o = opt.update(grads, o, p)
    return p, o, loss

params, opt_state, loss = step(params, opt_state, batch, jax.random.key(1))
print("step ok loss", float(loss), time.time() - t0, flush=True)
