"""BLEU-evaluate a saved MT-app checkpoint on the synthetic test set.

Usage: python bench/eval_checkpoint.py <workdir> [kv_quant]

Model size, sequence length and vocab all come from the checkpoint's saved
CLI config — hardcoding them would retrain a MISMATCHED BPE tokenizer
(get_tokenizer retrains from the filtered corpus, so a different
model_max_length/n_vocab changes the merges and every token id) and score
garbage silently.
"""
import sys, json
import jax, numpy as np
from tpu_flash import nn
from tpu_flash.data import mt
from tpu_flash.utils import restore_checkpoint
from tpu_flash.apps.machine_translation import (
    generate_translations, evaluate_bleu)

workdir = sys.argv[1]
kv_quant = sys.argv[2] if len(sys.argv) > 2 else "fp8"
tree, step, meta = restore_checkpoint(f"{workdir}/checkpoints")
cfgargs = meta["config"]
L = cfgargs["model_max_length"]
data, src_key, tgt_key = mt.get_dataset(
    cfgargs.get("dataset", "bbaaaa/iwslt14-de-en"), L,
    synthetic=cfgargs.get("synthetic") or None)
tok = mt.get_tokenizer(data["train"], cfgargs["n_vocab"], src_key, tgt_key,
                       workdir)
cfg = nn.DecoderConfig(
    n_vocab=cfgargs["n_vocab"], n_embd=cfgargs["n_embd"],
    n_head=cfgargs["n_head"], n_positions=L, n_layer=cfgargs["n_layer"],
    p_dropout=cfgargs["p_dropout"], attention_kind=cfgargs["attention_kind"])
model = nn.DecoderLM(cfg)
hyps = generate_translations(model, tree["params"], data["test"], src_key,
                             tgt_key, tok, L, kv_quant=kv_quant)
print(json.dumps({"ckpt_epoch": step, "model_max_length": L,
                  **evaluate_bleu(data["test"], hyps, tgt_key)}))
for ex, hyp in list(zip(data["test"], hyps))[:3]:
    print(json.dumps({"src": ex[src_key], "ref": ex[tgt_key], "hyp": hyp}))
