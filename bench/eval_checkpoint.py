"""BLEU-evaluate a saved experiment checkpoint on the synthetic test set."""
import sys, json
import jax, numpy as np
from tpu_flash import nn
from tpu_flash.data import mt
from tpu_flash.utils import restore_checkpoint
from tpu_flash.apps.machine_translation import (
    generate_translations, evaluate_bleu)

workdir = sys.argv[1]
L = 32
data, src_key, tgt_key = mt.get_dataset(model_max_length=L, synthetic=True)
tok = mt.get_tokenizer(data["train"], 10_000, src_key, tgt_key, workdir)
tree, step, meta = restore_checkpoint(f"{workdir}/checkpoints")
cfgargs = meta["config"]
cfg = nn.DecoderConfig(
    n_vocab=cfgargs["n_vocab"], n_embd=cfgargs["n_embd"],
    n_head=cfgargs["n_head"], n_positions=L, n_layer=cfgargs["n_layer"],
    p_dropout=cfgargs["p_dropout"], attention_kind=cfgargs["attention_kind"])
model = nn.DecoderLM(cfg)
hyps = generate_translations(model, tree["params"], data["test"], src_key,
                             tgt_key, tok, L, kv_quant="fp8")
print(json.dumps({"ckpt_epoch": step, **evaluate_bleu(data["test"], hyps, tgt_key)}))
for ex, hyp in list(zip(data["test"], hyps))[:3]:
    print(json.dumps({"src": ex[src_key], "ref": ex[tgt_key], "hyp": hyp}))
